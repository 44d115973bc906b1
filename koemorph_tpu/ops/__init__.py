"""On-device DSP ops: STFT/mel frontends, F0, eGeMAPS, prosody, resampling.

Everything here is pure-functional jax.numpy (with optional Pallas kernels in
``koemorph_tpu.ops.pallas``) and static-shape, so it composes under ``jit``,
``vmap``, ``scan`` and ``shard_map``. These ops replace the reference's
host-side librosa / torchaudio / OpenSMILE dependency surface
(reference: SURVEY.md section 2.4).
"""

from koemorph_tpu.ops.window import frame_signal, hann_window, num_frames
from koemorph_tpu.ops.stft import stft_power, dft_matrices
from koemorph_tpu.ops.mel import (
    hz_to_mel,
    mel_to_hz,
    mel_filterbank,
    power_to_db,
    normalize_log_mel,
)
from koemorph_tpu.ops.frontend import (
    LogMelFrontend,
    log_mel_spectrogram,
    mel_with_temporal_detail,
)
from koemorph_tpu.ops.egemaps import (
    FEATURE_NAMES as EGEMAPS_FEATURE_NAMES,
    EgemapsConfig,
    LldCarry,
    apply_calibration,
    compute_lld_block,
    compute_llds,
    egemaps_concat_windows,
    egemaps_functionals,
    functionals_from_llds,
    functionals_multi_offset,
    load_calibration,
    silence_lld_carry,
)
from koemorph_tpu.ops.f0 import F0Result, yin_f0
from koemorph_tpu.ops.reconstruct import (
    compute_reconstruction_snr,
    griffin_lim,
    mel_to_linear,
    reconstruct_audio,
    validate_mel_parameters,
)

__all__ = [
    "frame_signal",
    "hann_window",
    "num_frames",
    "stft_power",
    "dft_matrices",
    "hz_to_mel",
    "mel_to_hz",
    "mel_filterbank",
    "power_to_db",
    "normalize_log_mel",
    "LogMelFrontend",
    "log_mel_spectrogram",
    "mel_with_temporal_detail",
    "griffin_lim",
    "mel_to_linear",
    "reconstruct_audio",
    "compute_reconstruction_snr",
    "validate_mel_parameters",
    "EGEMAPS_FEATURE_NAMES",
    "EgemapsConfig",
    "LldCarry",
    "apply_calibration",
    "compute_lld_block",
    "compute_llds",
    "egemaps_concat_windows",
    "egemaps_functionals",
    "functionals_from_llds",
    "functionals_multi_offset",
    "load_calibration",
    "silence_lld_carry",
    "F0Result",
    "yin_f0",
]
