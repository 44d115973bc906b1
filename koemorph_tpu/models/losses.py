"""Loss functions and metrics for blendshape generation.

Parity targets: reference src/model/losses.py (KoeMorphLoss term set,
PerceptualBlendshapeLoss group weighting, LandmarkConsistencyLoss placeholder
projection, BlendshapeMetrics accumulator, lip-sync metrics) and the
dual-stream trainer's stream-separation regularizer
(reference src/train_dual_stream.py:434-516).

Losses are pure jnp functions returning ``(total, metrics_dict)`` so they
jit/grad cleanly; the metrics accumulator is host-side numpy.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.blendshapes import EXPRESSION_INDICES, MOUTH_INDICES

# Perceptual group index ranges (reference src/model/losses.py:306-316).
PERCEPTUAL_GROUPS: dict[str, tuple[int, int]] = {
    "eye": (0, 12),
    "mouth": (12, 32),
    "brow": (32, 44),
    "jaw": (44, 52),
}
PERCEPTUAL_GROUP_WEIGHTS: dict[str, float] = {
    "mouth": 2.0, "eye": 1.0, "brow": 1.0, "jaw": 1.5,
}


@dataclasses.dataclass(frozen=True)
class KoeMorphLossConfig:
    """Weights of the combined loss
    (reference src/model/losses.py:37-76)."""

    mse_weight: float = 1.0
    l1_weight: float = 0.1
    perceptual_weight: float = 0.5
    temporal_weight: float = 0.2
    sparsity_weight: float = 0.01
    smoothness_weight: float = 0.1
    landmark_weight: float = 0.3
    velocity_weight: float = 0.05
    # Active-channel emphasis: elements whose TARGET exceeds
    # ``active_threshold`` get ``active_weight``x weight in the MSE/L1
    # terms (weights renormalized to mean 1 so loss magnitudes stay
    # comparable across settings). With sparse mocap (~48 near-zero
    # channels) the unweighted mean is dominated by inactive elements,
    # which biases the operating point toward under-activation — the
    # recall-vs-precision knob measured in docs/training_report.md's
    # recall section. 1.0 = reference behavior (plain means; the
    # reference's analogous emphasis is the mouth-group weighting inside
    # its perceptual loss, src/model/losses.py:294-377).
    active_weight: float = 1.0
    active_threshold: float = 0.1
    eps: float = 1e-8


def _landmark_projection(num_landmarks: int = 68, seed: int = 0) -> np.ndarray:
    """Fixed random 52 -> 2*num_landmarks projection (placeholder mapping,
    reference src/model/losses.py:392-397). Deterministic by seed so train
    and eval agree."""
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((num_landmarks * 2, 52)) * 0.01).astype(
        np.float32)


_LANDMARK_W = _landmark_projection()


def perceptual_loss(
    pred: jnp.ndarray, target: jnp.ndarray,
    audio_features: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Group-weighted MSE + optional audio-energy/mouth-activation cosine
    consistency (reference src/model/losses.py:294-377)."""
    total = 0.0
    for name, (lo, hi) in PERCEPTUAL_GROUPS.items():
        g = jnp.mean((pred[:, lo:hi] - target[:, lo:hi]) ** 2)
        total = total + PERCEPTUAL_GROUP_WEIGHTS[name] * g

    if audio_features is not None:
        lo, hi = PERCEPTUAL_GROUPS["mouth"]
        mouth_act = pred[:, lo:hi].mean(axis=1)        # (B,)
        if audio_features.ndim == 3:                   # (B, T, D)
            energy = jnp.linalg.norm(audio_features, axis=2).mean(axis=1)
        else:
            energy = jnp.linalg.norm(audio_features, axis=1)
        m = mouth_act / (jnp.linalg.norm(mouth_act) + 1e-8)
        e = energy / (jnp.linalg.norm(energy) + 1e-8)
        total = total + 0.5 * (1.0 - jnp.sum(m * e))
    return total


def landmark_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L2 on approximate landmark positions
    (reference src/model/losses.py:399-418)."""
    w = jnp.asarray(_LANDMARK_W)
    pl = (pred @ w.T).reshape(pred.shape[0], -1, 2)
    tl = (target @ w.T).reshape(target.shape[0], -1, 2)
    return jnp.mean((pl - tl) ** 2)


def koemorph_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    *,
    prev_pred: Optional[jnp.ndarray] = None,
    prev_target: Optional[jnp.ndarray] = None,
    audio_features: Optional[jnp.ndarray] = None,
    config: KoeMorphLossConfig = KoeMorphLossConfig(),
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Combined reconstruction + perceptual + temporal + regularization loss
    over (B, 52) frames (reference src/model/losses.py:90-234)."""
    c = config
    losses: dict[str, jnp.ndarray] = {}
    metrics: dict[str, jnp.ndarray] = {}

    if c.active_weight != 1.0:
        w = 1.0 + (c.active_weight - 1.0) * (
            target > c.active_threshold).astype(pred.dtype)
        w = w / (jnp.mean(w) + c.eps)
    else:
        w = None
    # metrics record the UNWEIGHTED means so 'mse'/'l1' stay plain
    # MSE/MAE comparable across active_weight settings (advisor r4);
    # active_weight scales only the loss terms
    if c.mse_weight > 0:
        mse_plain = jnp.mean((pred - target) ** 2)
        mse = mse_plain if w is None else jnp.mean(w * (pred - target) ** 2)
        losses["mse"] = c.mse_weight * mse
        metrics["mse"] = mse_plain
    if c.l1_weight > 0:
        l1_plain = jnp.mean(jnp.abs(pred - target))
        l1 = l1_plain if w is None else jnp.mean(w * jnp.abs(pred - target))
        losses["l1"] = c.l1_weight * l1
        metrics["l1"] = l1_plain
    if c.perceptual_weight > 0:
        p = perceptual_loss(pred, target, audio_features)
        losses["perceptual"] = c.perceptual_weight * p
        metrics["perceptual"] = p
    if c.temporal_weight > 0 and prev_pred is not None \
            and prev_target is not None:
        t = jnp.mean(((pred - prev_pred) - (target - prev_target)) ** 2)
        losses["temporal"] = c.temporal_weight * t
        metrics["temporal"] = t
    if c.velocity_weight > 0 and prev_pred is not None \
            and prev_target is not None:
        v = jnp.mean(jnp.abs((pred - prev_pred) - (target - prev_target)))
        losses["velocity"] = c.velocity_weight * v
        metrics["velocity"] = v
    if c.sparsity_weight > 0:
        s = jnp.mean(jnp.abs(pred))
        losses["sparsity"] = c.sparsity_weight * s
        metrics["sparsity"] = s
    if c.smoothness_weight > 0:
        # total variation across the blendshape axis
        sm = jnp.mean(jnp.abs(jnp.diff(pred, axis=1)))
        losses["smoothness"] = c.smoothness_weight * sm
        metrics["smoothness"] = sm
    if c.landmark_weight > 0:
        lm = landmark_loss(pred, target)
        losses["landmark"] = c.landmark_weight * lm
        metrics["landmark"] = lm

    total = sum(losses.values())
    metrics.update(frame_metrics(pred, target, eps=c.eps))
    return total, metrics


def frame_metrics(pred: jnp.ndarray, target: jnp.ndarray,
                  eps: float = 1e-8) -> dict[str, jnp.ndarray]:
    """MAE / RMSE / correlation / active-blendshape P-R-F1 / range ratio
    (reference src/model/losses.py:236-291). jit-safe."""
    out: dict[str, jnp.ndarray] = {}
    out["mae"] = jnp.mean(jnp.abs(pred - target))
    out["rmse"] = jnp.sqrt(jnp.mean((pred - target) ** 2))

    def corr_one(p, t):
        p = p - p.mean()
        t = t - t.mean()
        denom = jnp.sqrt(jnp.sum(p * p) * jnp.sum(t * t)) + eps
        return jnp.sum(p * t) / denom

    out["correlation"] = jnp.mean(jax.vmap(corr_one)(pred, target))

    thr = 0.1
    pa = (pred > thr).astype(jnp.float32)
    ta = (target > thr).astype(jnp.float32)
    tp = jnp.sum(pa * ta)
    fp = jnp.sum(pa * (1 - ta))
    fn = jnp.sum((1 - pa) * ta)
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    out["precision"] = precision
    out["recall"] = recall
    out["f1_score"] = 2 * precision * recall / (precision + recall + eps)

    pr = pred.max() - pred.min()
    tr = target.max() - target.min()
    out["range_ratio"] = pr / (tr + eps)
    return out


def sequence_koemorph_loss(
    pred_seq: jnp.ndarray,     # (B, T, 52)
    target_seq: jnp.ndarray,   # (B, T, 52)
    *,
    config: KoeMorphLossConfig = KoeMorphLossConfig(),
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Sequence variant: frame terms averaged over time; temporal/velocity
    terms from consecutive frames (the scan-native generalization of passing
    prev_pred/prev_target per step)."""
    c = config
    b, t, _ = pred_seq.shape
    flat_p = pred_seq.reshape(b * t, -1)
    flat_t = target_seq.reshape(b * t, -1)
    total, metrics = koemorph_loss(
        flat_p, flat_t,
        config=dataclasses.replace(config, temporal_weight=0.0,
                                   velocity_weight=0.0))
    if t > 1 and (c.temporal_weight > 0 or c.velocity_weight > 0):
        dp = pred_seq[:, 1:] - pred_seq[:, :-1]
        dt = target_seq[:, 1:] - target_seq[:, :-1]
        if c.temporal_weight > 0:
            tl = jnp.mean((dp - dt) ** 2)
            total = total + c.temporal_weight * tl
            metrics["temporal"] = tl
        if c.velocity_weight > 0:
            vl = jnp.mean(jnp.abs(dp - dt))
            total = total + c.velocity_weight * vl
            metrics["velocity"] = vl
    return total, metrics


def dual_stream_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    *,
    prev_pred: Optional[jnp.ndarray] = None,
    prev_target: Optional[jnp.ndarray] = None,
    mel_weights: Optional[jnp.ndarray] = None,
    emotion_weights: Optional[jnp.ndarray] = None,
    l1_weight: float = 1.0,
    l2_weight: float = 0.5,
    velocity_weight: float = 0.1,
    separation_weight: float = 0.01,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Dual-stream training loss: L1 + L2 + velocity + stream-separation
    regularizer encouraging mouth blendshapes toward the mel stream and
    expressions toward the emotion stream
    (reference src/train_dual_stream.py:434-516)."""
    losses: dict[str, jnp.ndarray] = {}
    l1 = jnp.mean(jnp.abs(pred - target))
    l2 = jnp.mean((pred - target) ** 2)
    losses["l1"] = l1_weight * l1
    losses["l2"] = l2_weight * l2
    metrics = {"l1": l1, "l2": l2}

    if prev_pred is not None and prev_target is not None:
        v = jnp.mean(jnp.abs((pred - prev_pred) - (target - prev_target)))
        losses["velocity"] = velocity_weight * v
        metrics["velocity"] = v

    if mel_weights is not None and emotion_weights is not None:
        mouth = np.asarray(MOUTH_INDICES)
        expr = np.asarray(EXPRESSION_INDICES)
        # penalize mel weight mass on expressions and emotion mass on mouth
        sep = (jnp.mean(jax.nn.softmax(mel_weights)[expr])
               + jnp.mean(jax.nn.softmax(emotion_weights)[mouth]))
        losses["separation"] = separation_weight * sep
        metrics["separation"] = sep

    total = sum(losses.values())
    metrics.update(frame_metrics(pred, target))
    return total, metrics


class BlendshapeMetrics:
    """Host-side accumulator over batches
    (reference src/model/losses.py:421-521)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.predictions: list[np.ndarray] = []
        self.targets: list[np.ndarray] = []

    def update(self, pred, target, audio_features=None):
        del audio_features
        self.predictions.append(np.asarray(pred))
        self.targets.append(np.asarray(target))

    def compute(self) -> dict[str, float]:
        if not self.predictions:
            return {}
        p = np.concatenate(self.predictions, axis=0)
        t = np.concatenate(self.targets, axis=0)
        m: dict[str, float] = {}
        m["mae"] = float(np.abs(p - t).mean())
        m["mse"] = float(((p - t) ** 2).mean())
        m["rmse"] = float(np.sqrt(((p - t) ** 2).mean()))

        per_bs = np.abs(p - t).mean(axis=0)
        m["max_bs_mae"] = float(per_bs.max())
        m["min_bs_mae"] = float(per_bs.min())
        m["std_bs_mae"] = float(per_bs.std(ddof=1)) if len(per_bs) > 1 else 0.0

        corrs = []
        for i in range(p.shape[1]):
            if p[:, i].std() > 1e-6 and t[:, i].std() > 1e-6:
                c = np.corrcoef(p[:, i], t[:, i])[0, 1]
                if not np.isnan(c):
                    corrs.append(float(c))
        m["mean_correlation"] = float(np.mean(corrs)) if corrs else 0.0
        m["min_correlation"] = float(np.min(corrs)) if corrs else 0.0

        if p.shape[0] > 1:
            dp, dt = np.diff(p, axis=0), np.diff(t, axis=0)
            m["temporal_consistency"] = float(np.abs(dp - dt).mean())
            m["pred_smoothness"] = float(np.abs(dp).mean())
            m["target_smoothness"] = float(np.abs(dt).mean())

        thr = 0.1
        pa, ta = (p > thr).astype(float), (t > thr).astype(float)
        m["pred_activity"] = float(pa.mean())
        m["target_activity"] = float(ta.mean())
        tp = (pa * ta).sum()
        fp = (pa * (1 - ta)).sum()
        fn = ((1 - pa) * ta).sum()
        precision = tp / (tp + fp + 1e-8)
        recall = tp / (tp + fn + 1e-8)
        m["precision"] = float(precision)
        m["recall"] = float(recall)
        m["f1_score"] = float(2 * precision * recall
                              / (precision + recall + 1e-8))
        return m


def compute_lip_sync_metrics(
    pred, target, audio_features=None
) -> dict[str, float]:
    """Mouth-region MAE + activity correlation + optional AV sync
    (reference src/model/losses.py:524-583). Host-side."""
    p = np.asarray(pred)
    t = np.asarray(target)
    mouth = list(range(12, 32))  # simplified mouth region, as the reference
    pm, tm = p[:, mouth], t[:, mouth]
    m: dict[str, float] = {"mouth_mae": float(np.abs(pm - tm).mean())}

    pa, ta = pm.sum(axis=1), tm.sum(axis=1)
    if pa.std() > 1e-6 and ta.std() > 1e-6:
        c = np.corrcoef(pa, ta)[0, 1]
        m["mouth_correlation"] = float(c) if not np.isnan(c) else 0.0
    else:
        m["mouth_correlation"] = 0.0

    if audio_features is not None:
        af = np.asarray(audio_features)
        if af.ndim == 3:
            energy = np.linalg.norm(af, axis=-1).mean(axis=-1)
        else:
            energy = np.linalg.norm(af, axis=-1)
        if energy.std() > 1e-6:
            c = np.corrcoef(pa, energy)[0, 1]
            m["audiovisual_sync"] = float(c) if not np.isnan(c) else 0.0
        else:
            m["audiovisual_sync"] = 0.0
    return m


# ---------------------------------------------------------------------------
# reference-named callable wrappers (reference losses.py:29, :294, :380) —
# the pure functions above are the JAX-idiomatic API; these classes keep
# torch-style call sites working unchanged.
# ---------------------------------------------------------------------------

class KoeMorphLoss:
    """Callable combining all loss terms (reference losses.py:29-291).

    Returns ``(total, metrics_dict)`` like the reference's
    ``(loss, loss_dict)``.
    """

    def __init__(self, reduction: str = "mean", **weights):
        if reduction != "mean":
            raise ValueError("only reduction='mean' is supported "
                             "(the reference default)")
        self.config = KoeMorphLossConfig(**weights)

    def __call__(self, pred_blendshapes, target_blendshapes,
                 prev_pred=None, prev_target=None, audio_features=None):
        return koemorph_loss(
            pred_blendshapes, target_blendshapes, prev_pred=prev_pred,
            prev_target=prev_target, audio_features=audio_features,
            config=self.config)


class PerceptualBlendshapeLoss:
    """Group-weighted perceptual term (reference losses.py:294-377)."""

    def __call__(self, pred, target, audio_features=None):
        return perceptual_loss(pred, target, audio_features=audio_features)


class LandmarkConsistencyLoss:
    """Approximate-landmark L2 (reference losses.py:380-418; the
    52->landmark projection is the same fixed random placeholder)."""

    def __call__(self, pred, target):
        return landmark_loss(pred, target)
