"""End-to-end ≤1e-3 parity gate vs the PyTorch reference model.

Round-1 parity pinned individual modules (attention, decoder, smoother) by
weight transplant; this test pins the WHOLE production inference chain —
librosa-semantics log-mel + 3-frame temporal detail + trained 264->256
emotion projection + dual-stream attention + EMA smoothing across sliding
windows — against the reference `SequentialDualStreamModel`
(/root/reference/src/model/sequential_dual_stream_model.py:63-160) running
on real multi-second audio.

Two design choices make the gate meaningful:

* librosa is not installed in this image, so the reference runs on
  tests/models/librosa_shim.py — an independent float64 NumPy
  implementation of librosa's documented mel semantics (reflect padding,
  Hann, rfft, Slaney filterbank, power_to_db ref=max/top_db=80). Our JAX
  path (matmul DFT, fused normalization) shares no code with the shim.
* The comparison runs at a TRAINED operating point: our model is first
  fitted for a few hundred steps to audio-correlated targets (randomly
  initialized sigmoids output near-constant coefficients, which would make
  any tolerance vacuous), then the trained weights are transplanted into
  the torch reference.

Emotion features are injected identically on both sides (the raw 264-D
vector; both sides then apply the SAME trained 264->256 projection),
isolating the audio->blendshape chain from the separately-validated
eGeMAPS frontend.

North-star gate (BASELINE.json): max |coeff deviation| <= 1e-3 over the
full smoothed sequence.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jnp = pytest.importorskip("jax.numpy")
optax = pytest.importorskip("optax")

REFERENCE = Path("/root/reference")
if not (REFERENCE / "src" / "model" /
        "sequential_dual_stream_model.py").exists():
    pytest.skip("reference tree not mounted", allow_module_level=True)
if str(REFERENCE) not in sys.path:
    sys.path.insert(0, str(REFERENCE))

from tests.models import librosa_shim  # noqa: E402

librosa_shim.install()

import jax  # noqa: E402

from koemorph_tpu.models.dual_stream_model import (  # noqa: E402
    SequentialDualStreamModel,
    SimplifiedDualStreamModel,
    TemporalState,
)

SR = 16000
FPS = 30
HOP = 533
# CPU-CI shape: d=64 / window=64 (~2.1 s) keeps runtime sane. The SAME
# harness runs at the flagship shape (d=256 / window=256 / stride 4)
# via scripts/flagship_parity.py, which overrides these module
# constants and commits the measured max deviation to
# docs/flagship_parity.json (VERDICT r4 item 5).
D_MODEL = 64
HEADS = 4
WINDOW = 64
STRIDE = 16
AUDIO_SECONDS = 6.0
TRAIN_STEPS = 600
RAW_EMOTION_DIM = 264


def speech_like(seconds: float, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    f0 = 130 + 45 * np.sin(2 * np.pi * 0.6 * t) + 8 * np.sin(
        2 * np.pi * 3.3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    voiced = (np.sin(phase) + 0.45 * np.sin(2 * phase)
              + 0.2 * np.sin(3 * phase + 0.7))
    am = 0.55 + 0.45 * np.sin(2 * np.pi * 2.3 * t + 1.0) ** 2
    noise = 0.04 * rng.standard_normal(len(t))
    x = 0.4 * voiced * am + noise
    return (x / np.abs(x).max() * 0.6).astype(np.float32)


def energy_targets(audio: np.ndarray, n_out: int) -> np.ndarray:
    """Audio-energy-correlated 52-dim targets concentrated on a few
    blendshapes.

    The production fusion softmaxes the stream weights ACROSS the 52
    blendshapes (reference dual_stream_attention.py:252-267), so the mean
    reachable output is ~1/52 — sparse targets (a handful of active
    coefficients the softmax can concentrate on) give the trained model
    real output dynamics inside the architecture's reachable set."""
    targets = np.full((n_out, 52), 0.004, np.float32)
    for i in range(n_out):
        s = i * STRIDE * HOP
        w = audio[s: s + WINDOW * HOP]
        e = float(np.sqrt(np.mean(w[-8 * HOP:] ** 2)))
        targets[i, :4] = np.clip(e * 1.2, 0.0, 0.15)     # jaw follows energy
        targets[i, 30:33] = 0.06 + 0.05 * np.sin(
            0.37 * i + np.arange(3) * 0.7)               # slow expressions
    return targets


# ---------------------------------------------------------------------------
# flax <-> torch weight transfer (inverse of test_reference_parity.transplant)
# ---------------------------------------------------------------------------

def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x).copy())


def load_attention_into_torch(att_torch, p) -> None:
    sd = {}
    for key in ("mouth_queries", "expression_queries", "mel_weights",
                "emotion_weights"):
        sd[key] = _t(p[key])

    def lin(prefix, q):
        sd[f"{prefix}.weight"] = _t(q["kernel"]).T.contiguous()
        sd[f"{prefix}.bias"] = _t(q["bias"])

    def ln(prefix, q):
        sd[f"{prefix}.weight"] = _t(q["scale"])
        sd[f"{prefix}.bias"] = _t(q["bias"])

    def mha(prefix, q):
        sd[f"{prefix}.in_proj_weight"] = _t(q["in_proj_weight"])
        sd[f"{prefix}.in_proj_bias"] = _t(q["in_proj_bias"])
        lin(f"{prefix}.out_proj", q["out_proj"])

    lin("mel_channel_encoder", p["mel_channel_encoder"])
    ln("mel_norm", p["mel_norm"])
    ln("emotion_norm", p["emotion_norm"])
    lin("emotion_encoder", p["emotion_encoder"])
    mha("mel_attention", p["mel_attention"])
    mha("emotion_attention", p["emotion_attention"])
    lin("mel_output_proj", p["mel_output_proj"])
    lin("emotion_output_proj", p["emotion_output_proj"])
    lin("blendshape_decoder.0", p["decoder_hidden"])
    lin("blendshape_decoder.3", p["decoder_out"])
    att_torch.load_state_dict(sd)


@pytest.fixture(scope="module")
def trained_setup():
    """Train our model briefly on audio-correlated targets, then build the
    reference model carrying the SAME weights."""
    audio = speech_like(AUDIO_SECONDS)
    n_frames = len(audio) // HOP
    n_out = (n_frames - WINDOW) // STRIDE + 1
    targets = energy_targets(audio, n_out)
    rng = np.random.default_rng(5)
    raw_emotion = rng.standard_normal((1, RAW_EMOTION_DIM)).astype(
        np.float32)

    ours = SimplifiedDualStreamModel(
        d_model=D_MODEL, num_heads=HEADS, mel_sequence_length=WINDOW,
        emotion_backend="egemaps", use_concatenation=True,
        target_fps=FPS, dropout=0.0)

    windows = np.stack([audio[i * STRIDE * HOP:
                              i * STRIDE * HOP + WINDOW * HOP]
                        for i in range(n_out)])
    windows_j = jnp.asarray(windows)
    targets_j = jnp.asarray(targets)
    raw_j = jnp.asarray(np.repeat(raw_emotion, n_out, axis=0))

    params = ours.init(jax.random.PRNGKey(0), windows_j[:1],
                       TemporalState.create(1),
                       emotion_features_raw=raw_j[:1])["params"]

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            out = ours.apply({"params": p}, windows_j,
                             emotion_features_raw=raw_j,
                             deterministic=True)
            return jnp.mean((out["blendshapes"] - targets_j) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = None
    for step in range(TRAIN_STEPS):
        params, opt_state, loss = train_step(params, opt_state)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < 0.25 * loss0, (float(loss), loss0)

    # ---- mirror the trained weights into the torch reference ----
    from src.model.dual_stream_attention import (
        DualStreamCrossAttention as TorchDSCA)
    from src.model.sequential_dual_stream_model import (
        SequentialDualStreamModel as TorchSeqModel)

    torch.manual_seed(0)
    ref = TorchSeqModel(
        d_model=D_MODEL, num_heads=HEADS, mel_sequence_length=WINDOW,
        emotion_config={"backend": "basic", "sample_rate": SR,
                        "enable_caching": False, "device": "cpu"},
        device="cpu", stride_frames=STRIDE)
    # init picked emotion_dim=9 for the basic backend; production is the
    # concatenated-eGeMAPS path (emotion_dim = d_model after compression)
    ref.emotion_dim = D_MODEL
    ref.dual_stream_attention = TorchDSCA(
        d_model=D_MODEL, num_heads=HEADS, num_mel_channels=80,
        mel_sequence_length=WINDOW, mel_temporal_frames=3,
        emotion_dim=D_MODEL, dropout=0.0, num_blendshapes=52,
        use_learnable_weights=True, temperature=1.0)
    load_attention_into_torch(ref.dual_stream_attention,
                              jax.tree_util.tree_map(
                                  np.asarray,
                                  params["dual_stream_attention"]))
    with torch.no_grad():
        ref.smoothing_alpha.copy_(
            _t(params["smoothing_alpha"]).reshape(()))
    ref.eval()

    # both sides share the trained 264 -> d_model projection
    proj = params["emotion_projection"]
    emotion_compressed = _t(
        np.asarray(raw_emotion @ np.asarray(proj["kernel"])
                   + np.asarray(proj["bias"])))
    ref.extract_emotion_features = lambda audio: (
        emotion_compressed, {"backend_used": "injected"})
    ref.align_features = lambda mel, emo: (mel, emo)

    return ref, ours, params, audio, raw_emotion, n_out


class TestEndToEndParity:
    def test_full_sequence_within_1e_3(self, trained_setup):
        """North-star gate: reference sequential decode vs our windowed
        Simplified model (identical per-window reflect-padded mel
        semantics), including cross-window EMA smoothing."""
        ref, ours, params, audio, raw_emotion, n_out = trained_setup
        n_frames = len(audio) // HOP

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(audio[None, : n_frames * HOP]))
        ref_seq = ref_out["blendshapes"].numpy()[0]      # (n_out, 52)
        assert ref_seq.shape == (n_out, 52)
        # trained outputs genuinely vary — the tolerance is not vacuous
        assert float(np.ptp(ref_seq)) > 0.02, float(np.ptp(ref_seq))

        raw = jnp.asarray(raw_emotion)

        @jax.jit
        def step(params, window, state):
            out, state = ours.apply(
                {"params": params}, window, state,
                emotion_features_raw=raw, deterministic=True)
            return out["blendshapes"], state

        state = TemporalState.create(1)
        got = []
        for i in range(n_out):
            s = i * STRIDE * HOP
            window = jnp.asarray(audio[None, s: s + WINDOW * HOP])
            bs, state = step(params, window, state)
            got.append(np.asarray(bs)[0])
        got = np.stack(got)

        max_dev = float(np.abs(got - ref_seq).max())
        assert max_dev <= 1e-3, max_dev

    def test_sequential_default_within_1e_3(self, trained_setup):
        """The DEFAULT SequentialDualStreamModel config passes the
        north-star gate: ONE global STFT + window gathers (TPU-first; the
        reference reflect-pads every window edge,
        sequential_dual_stream_model.py:101-133) with the per-window
        reflect-padded edge frames spliced in
        (models/dual_stream_model.py:_reflect_edge_rows) — round 3 bounded
        the un-spliced deviation at <0.02; the splice closes it."""
        ref, ours_simple, params, audio, raw_emotion, n_out = trained_setup
        n_frames = len(audio) // HOP

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(audio[None, : n_frames * HOP]))
        ref_seq = ref_out["blendshapes"].numpy()[0]

        ours = SequentialDualStreamModel(
            d_model=D_MODEL, num_heads=HEADS, mel_sequence_length=WINDOW,
            emotion_backend="egemaps", use_concatenation=True,
            target_fps=FPS, dropout=0.0, stride_frames=STRIDE)
        raw = jnp.asarray(raw_emotion)
        out = jax.jit(
            lambda p, a: ours.apply(
                {"params": p}, a, emotion_features_raw=raw,
                deterministic=True))(
            params, jnp.asarray(audio[None, : n_frames * HOP]))
        got = np.asarray(out["blendshapes"])[0]
        assert got.shape == ref_seq.shape
        max_dev = float(np.abs(got - ref_seq).max())
        assert max_dev <= 1e-3, max_dev

    def test_sequential_exact_window_stft_within_1e_3(self, trained_setup):
        """exact_window_stft=True reproduces the reference's per-window
        reflect-padded framing inside the batched sequential decoder, so
        the full sequential model passes the north-star gate directly."""
        ref, ours_simple, params, audio, raw_emotion, n_out = trained_setup
        n_frames = len(audio) // HOP

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(audio[None, : n_frames * HOP]))
        ref_seq = ref_out["blendshapes"].numpy()[0]

        ours = SequentialDualStreamModel(
            d_model=D_MODEL, num_heads=HEADS, mel_sequence_length=WINDOW,
            emotion_backend="egemaps", use_concatenation=True,
            target_fps=FPS, dropout=0.0, stride_frames=STRIDE,
            exact_window_stft=True)
        raw = jnp.asarray(raw_emotion)
        out = jax.jit(
            lambda p, a: ours.apply(
                {"params": p}, a, emotion_features_raw=raw,
                deterministic=True))(
            params, jnp.asarray(audio[None, : n_frames * HOP]))
        got = np.asarray(out["blendshapes"])[0]
        max_dev = float(np.abs(got - ref_seq).max())
        assert max_dev <= 1e-3, max_dev
