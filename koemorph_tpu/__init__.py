"""KoeMorph-TPU: a TPU-native real-time speech-to-ARKit-blendshape framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of KoeMorph
(atsuki-ichikawa/KoeMorph): 16 kHz mono audio in, 52 ARKit blendshape
coefficients in [0, 1] out, at 30 or 60 fps, driven by a dual-stream
cross-attention decoder (mel stream -> mouth, eGeMAPS emotion stream ->
expression).

Design inversion vs the PyTorch reference: the reference wraps host-side DSP
libraries (librosa / torchaudio / OpenSMILE) inside nn.Modules and drives
sliding windows from Python loops; here the whole
audio -> features -> attention -> smoothing step is a single jitted,
static-shape function with explicit carried state. Only I/O (WAV decode, mic
capture, UDP/OSC output) stays on the host.

Subpackages
-----------
- ``ops``       on-device DSP kernels (STFT/mel, F0, eGeMAPS, prosody, Pallas)
- ``models``    dual-stream attention decoder + legacy model family (Flax)
- ``features``  emotion feature chain with fallback levels
- ``data``      WAV+JSONL I/O, datasets, windowing / stride schedules
- ``train``     trainers, losses wiring, orbax checkpointing
- ``runtime``   streaming real-time inference (ring-buffer carry, jitted step)
- ``parallel``  mesh / sharding helpers for multi-chip decode & training
- ``export``    jax2tf SavedModel / TFLite export with parity gates
"""

__version__ = "0.1.0"

from koemorph_tpu.blendshapes import (
    ARKIT_BLENDSHAPES,
    EXPRESSION_INDICES,
    MOUTH_BLENDSHAPES,
    MOUTH_INDICES,
    NUM_BLENDSHAPES,
)

__all__ = [
    "ARKIT_BLENDSHAPES",
    "MOUTH_BLENDSHAPES",
    "MOUTH_INDICES",
    "EXPRESSION_INDICES",
    "NUM_BLENDSHAPES",
    "__version__",
]
