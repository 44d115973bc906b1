"""Emotion feature chain with fallback levels.

Parity target: reference src/features/emotion_extractor.py (EmotionExtractor
with the emotion2vec -> opensmile/eGeMAPS -> basic fallback chain, emotion
category heuristics, emotion -> blendshape mapping, per-sample caching,
statistics). Structural changes for TPU:

- Each backend is a pure jnp function usable inside the jitted model step;
  the class wrapper below provides the reference-compatible host API.
- The eGeMAPS backend is our on-device :mod:`koemorph_tpu.ops.egemaps`
  (never import-fails), so runtime demotion only applies to the optional
  emotion2vec weights path; the chain itself is resolved at construction.
- The concatenated 3-window feature is 264-D here; the 264 -> 256
  compression is a *trained* projection inside the model (fixing the
  reference's untrained lazy Linear, opensmile_extractor.py:587-604).
"""

from __future__ import annotations

import dataclasses
import logging
import pickle
import time
from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from koemorph_tpu.blendshapes import ARKIT_BLENDSHAPES
from koemorph_tpu.features.basic import BASIC_DIM, basic_emotion_features
from koemorph_tpu.ops.egemaps import (
    NUM_FEATURES as EGEMAPS_DIM,
    EgemapsConfig,
    egemaps_concat_windows,
    egemaps_functionals,
)

logger = logging.getLogger(__name__)

# Emotion category labels (reference emotion_extractor.py:24-27).
EMOTION2VEC_LABELS = {
    0: "angry", 1: "disgusted", 2: "fearful", 3: "happy",
    4: "neutral", 5: "other", 6: "sad", 7: "surprised", 8: "unknown",
}

# Emotion -> expression-blendshape heuristic map
# (reference emotion_extractor.py:30-61).
EMOTION_TO_BLENDSHAPE_MAPPING: dict[str, dict[str, float]] = {
    "angry": {
        "browDownLeft": 0.8, "browDownRight": 0.8,
        "eyeSquintLeft": 0.6, "eyeSquintRight": 0.6,
        "noseSneerLeft": 0.4, "noseSneerRight": 0.4,
    },
    "happy": {
        "eyeSquintLeft": 0.3, "eyeSquintRight": 0.3,
        "cheekSquintLeft": 0.7, "cheekSquintRight": 0.7,
        "browOuterUpLeft": 0.2, "browOuterUpRight": 0.2,
    },
    "sad": {"browInnerUp": 0.7, "eyeSquintLeft": 0.4, "eyeSquintRight": 0.4},
    "surprised": {
        "browInnerUp": 0.5, "browOuterUpLeft": 0.8, "browOuterUpRight": 0.8,
        "eyeWideLeft": 0.9, "eyeWideRight": 0.9,
    },
    "fearful": {
        "browInnerUp": 0.9, "browOuterUpLeft": 0.6, "browOuterUpRight": 0.6,
        "eyeWideLeft": 0.7, "eyeWideRight": 0.7,
    },
    "disgusted": {
        "browDownLeft": 0.5, "browDownRight": 0.5,
        "noseSneerLeft": 0.8, "noseSneerRight": 0.8,
        "eyeSquintLeft": 0.6, "eyeSquintRight": 0.6,
    },
    "neutral": {}, "other": {}, "unknown": {},
}

CONCAT_DIM = EGEMAPS_DIM * 3  # 264


@dataclasses.dataclass(frozen=True)
class EmotionFrontendConfig:
    """Static configuration of the device-side emotion frontend."""

    backend: str = "egemaps"       # egemaps | emotion2vec | basic
    use_concatenation: bool = True  # 3-window concat (production)
    sample_rate: int = 16000
    context_window: float = 20.0
    window_offsets: tuple[float, ...] = (0.0, 0.3, 0.6)
    # throughput knob (egemaps backend): False selects frame-level
    # jitter/shimmer proxies, ~25% faster batched decode — see
    # ops.egemaps.EgemapsConfig.per_period_voice_quality
    egemaps_per_period: bool = True

    @property
    def feature_dim(self) -> int:
        if self.backend == "emotion2vec":
            return 1024
        if self.backend == "egemaps":
            return CONCAT_DIM if self.use_concatenation else EGEMAPS_DIM
        if self.backend == "basic":
            return BASIC_DIM
        raise ValueError(f"Unknown emotion backend: {self.backend}")


def emotion_features(
    audio: jnp.ndarray,
    cfg: EmotionFrontendConfig = EmotionFrontendConfig(),
    *,
    egemaps_cfg: EgemapsConfig | None = None,
) -> jnp.ndarray:
    """Device-side emotion feature vector ``(..., L) -> (..., D)``.

    This is the function the jitted model step calls; the emotion2vec
    backend is excluded here because it carries its own Flax parameters (the
    model owns that submodule — see SimplifiedDualStreamModel).
    """
    if cfg.backend == "egemaps":
        ecfg = egemaps_cfg or EgemapsConfig(
            sample_rate=cfg.sample_rate,
            per_period_voice_quality=cfg.egemaps_per_period)
        if cfg.use_concatenation:
            return egemaps_concat_windows(audio, ecfg, cfg.window_offsets)
        return egemaps_functionals(audio, ecfg)
    if cfg.backend == "basic":
        return basic_emotion_features(audio, cfg.sample_rate)
    raise ValueError(
        f"Backend {cfg.backend!r} has trained parameters; call it through "
        "the model, not this function")


# ---------------------------------------------------------------------------
# heuristics (host-side numpy; used by monitoring and degraded paths)
# ---------------------------------------------------------------------------

def emotion_to_blendshapes(predictions: dict[str, float]) -> np.ndarray:
    """Map emotion predictions to 52 blendshape weights
    (reference emotion_extractor.py:697-717)."""
    weights = np.zeros(len(ARKIT_BLENDSHAPES), dtype=np.float32)
    for emotion, confidence in predictions.items():
        mapping = EMOTION_TO_BLENDSHAPE_MAPPING.get(emotion)
        if not mapping:
            continue
        for name, w in mapping.items():
            weights[ARKIT_BLENDSHAPES.index(name)] += confidence * w
    return np.clip(weights, 0.0, 1.0)


def egemaps_to_emotion(features: np.ndarray) -> dict[str, float]:
    """Arousal/valence heuristics over the 88-D vector
    (reference emotion_extractor.py:570-621)."""
    predictions = {"neutral": 0.5}
    f = np.asarray(features).reshape(-1)
    if len(f) < 31:
        return {"neutral": 0.8, "other": 0.2}
    f0_mean, f0_std = f[0], f[1]
    loud_mean, loud_std = f[12], f[13]
    jitter, shimmer = f[10], f[22]
    hnr = f[24]

    arousal = 0.0
    # f[1]/f[13] are stddevNorm (coefficient of variation, std/|mean|), not
    # raw std — the reference compared CV against raw-std thresholds, making
    # its high-arousal branches unreachable (fix-forward: CV-scale
    # thresholds; expressive speech has F0-semitone CV ~0.05-0.15 and
    # loudness CV ~0.3-0.8)
    if f0_std > 0.06 and loud_std > 0.25:
        arousal += 0.4
    if jitter > 0.005 or shimmer > 0.05:
        arousal += 0.3
    valence = 0.0
    if f0_mean > 35 and hnr > 10:       # semitone scale: 35 st ~ 207 Hz
        valence += 0.4
    elif f0_mean < 28 and hnr < 5:      # 28 st ~ 139 Hz
        valence -= 0.4

    if arousal > 0.5 and valence > 0.2:
        predictions = {"happy": 0.6, "surprised": 0.2, "neutral": 0.2}
    elif arousal > 0.5 and valence < -0.2:
        predictions = {"angry": 0.5, "fearful": 0.3, "neutral": 0.2}
    elif arousal < 0.2 and valence < -0.2:
        predictions = {"sad": 0.6, "neutral": 0.4}
    elif arousal > 0.3 and abs(valence) < 0.2:
        predictions = {"surprised": 0.5, "neutral": 0.5}
    else:
        predictions = {"neutral": 0.8, "other": 0.2}
    return predictions


def egemaps_to_expression_blendshapes(features: np.ndarray) -> np.ndarray:
    """Direct eGeMAPS -> expression-blendshape mapping
    (reference emotion_extractor.py:623-675)."""
    weights = np.zeros(len(ARKIT_BLENDSHAPES), dtype=np.float32)
    f = np.asarray(features).reshape(-1)
    if len(f) < 14:
        return weights
    f0_mean, f0_std = f[0], f[1]
    loud_mean, loud_std = f[12], f[13]
    # stddevNorm (CV) scaling — see egemaps_to_emotion note
    f0_var_norm = float(np.clip(f0_std / 0.15, 0, 1))
    energy_norm = float(np.clip(loud_mean / 2.0, 0, 1))
    energy_var_norm = float(np.clip(loud_std / 0.5, 0, 1))

    def setw(name, value):
        weights[ARKIT_BLENDSHAPES.index(name)] = max(0.0, value)

    setw("browInnerUp", f0_var_norm * 0.6)
    brow = (1 - energy_norm) * f0_var_norm * 0.5
    setw("browDownLeft", brow)
    setw("browDownRight", brow)
    eye = f0_var_norm * energy_var_norm * 0.4
    setw("eyeWideLeft", eye)
    setw("eyeWideRight", eye)
    cheek = energy_norm * (1 - f0_var_norm) * 0.3
    setw("cheekSquintLeft", cheek)
    setw("cheekSquintRight", cheek)
    return np.clip(weights, 0.0, 1.0)


def basic_emotion_heuristic(energy, zcr, f0_mean, f0_std) -> dict[str, float]:
    """Reference emotion_extractor.py:677-695."""
    if energy > 0.1 and f0_std > 50:
        return {"angry": 0.6, "neutral": 0.4}
    if energy > 0.05 and f0_mean > 200:
        return {"happy": 0.5, "surprised": 0.3, "neutral": 0.2}
    if energy < 0.01:
        return {"sad": 0.6, "neutral": 0.4}
    return {"neutral": 0.8, "other": 0.2}


# ---------------------------------------------------------------------------
# host-side wrapper with the reference-compatible API
# ---------------------------------------------------------------------------

class PrecomputedEmotionFeatures:
    """1024-D emotion2vec features computed offline and shipped as .npy.

    Files are keyed by the audio content hash
    (``Emotion2VecCache.compute_audio_hash``), so the extractor can serve
    exact features for known utterances without the FunASR/transformers
    stack — the path to use real emotion2vec features in an image without
    network access (reference extracts them online,
    emotion_extractor.py:137-174).

    Layout: ``<dir>/<audio_hash>.npy`` each ``(1024,)`` (utterance) or
    ``(T, 1024)`` (sequence; mean-pooled at lookup).
    """

    def __init__(self, directory: Union[str, Path]):
        self.directory = Path(directory)
        if not self.directory.is_dir():
            raise FileNotFoundError(
                f"precomputed emotion feature dir missing: {directory}")

    @staticmethod
    def save(directory: Union[str, Path], audio: np.ndarray,
             features: np.ndarray) -> Path:
        """Record features for an utterance (used by offline exporters)."""
        from koemorph_tpu.features.emotion2vec import Emotion2VecCache

        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        key = Emotion2VecCache.compute_audio_hash(
            np.asarray(audio, np.float32))
        path = directory / f"{key}.npy"
        np.save(path, np.asarray(features, np.float32))
        return path

    def lookup(self, audio: np.ndarray) -> np.ndarray:
        from koemorph_tpu.features.emotion2vec import Emotion2VecCache

        key = Emotion2VecCache.compute_audio_hash(
            np.asarray(audio, np.float32))
        path = self.directory / f"{key}.npy"
        if not path.exists():
            raise KeyError(f"no precomputed emotion features for {key}")
        feats = np.load(path)
        if feats.ndim == 2:
            feats = feats.mean(axis=0)
        return feats.astype(np.float32)


class EmotionExtractor:
    """Host-facing extractor with fallback levels, caching, and statistics.

    fallback_level: 0 = emotion2vec (requires a params pytree for the Flax
    backbone), 1 = on-device eGeMAPS, 2 = basic prosodic features. Level 0
    demotes to 1 at construction when no parameters are supplied (the
    reference demotes when FunASR is missing, emotion_extractor.py:164-174).
    """

    def __init__(
        self,
        backend: str = "emotion2vec",
        model_name: str = "conv_emotion_encoder",
        device: str = "tpu",
        cache_dir: Optional[Union[str, Path]] = None,
        enable_caching: bool = True,
        batch_size: int = 4,
        sample_rate: int = 16000,
        emotion2vec_params=None,
        use_concatenation: bool = True,
        pretrained_path: Optional[Union[str, Path]] = None,
        precomputed_dir: Optional[Union[str, Path]] = None,
    ):
        self.backend = backend
        self.model_name = model_name
        self.device = device
        self.cache_dir = Path(cache_dir) if cache_dir else None
        self.enable_caching = enable_caching and self.cache_dir is not None
        self.batch_size = batch_size
        self.sample_rate = sample_rate
        self.use_concatenation = use_concatenation
        self._e2v_params = emotion2vec_params
        self._e2v_module = None
        self._precomputed = (
            PrecomputedEmotionFeatures(precomputed_dir)
            if precomputed_dir is not None else None)

        if backend == "emotion2vec":
            if pretrained_path is not None:
                # real wav2vec2-family weights from a local HF checkpoint
                # (reference emotion2vec.py:96-122); load failure falls
                # through to the next emotion2vec source (trainable
                # encoder params, then precomputed features) before
                # demoting, mirroring the reference's chain semantics
                try:
                    from koemorph_tpu.features.wav2vec2 import (
                        Wav2Vec2Encoder, load_hf_checkpoint)

                    w2v_cfg, loaded = load_hf_checkpoint(pretrained_path)
                    # build BOTH before assigning either, so a failure
                    # here leaves the extractor consistent and the
                    # fall-through below still applies
                    module = Wav2Vec2Encoder(w2v_cfg,
                                             use_layer_fusion=True)
                    p = {"params": jax.tree_util.tree_map(
                        jnp.asarray, loaded)}
                    self._e2v_module = module
                    self._e2v_params = p
                except Exception as e:
                    logger.warning(
                        "pretrained emotion2vec weights unavailable (%s)",
                        e)
            if self._e2v_module is None and emotion2vec_params is not None:
                from koemorph_tpu.features.emotion2vec import ConvEmotionEncoder
                self._e2v_module = ConvEmotionEncoder()
            if self._e2v_module is not None or self._precomputed is not None:
                # precomputed: 1024-D features computed offline (e.g. by
                # FunASR on a CPU box) and shipped as .npy files
                self.fallback_level = 0
            else:
                logger.info(
                    "no emotion2vec source available; falling back to "
                    "on-device eGeMAPS backend")
                self.fallback_level = 1
        elif backend == "opensmile" or backend == "egemaps":
            self.fallback_level = 1
        else:
            self.fallback_level = 2

        if self.enable_caching:
            self.cache_dir.mkdir(parents=True, exist_ok=True)

        self.extraction_stats = {
            "total_calls": 0, "total_processed": 0, "success_rate": 1.0,
            "cache_hits": 0, "emotion2vec_calls": 0, "fallback_calls": 0,
            "avg_processing_time": 0.0,
        }

    # -- config for the device-side path ---------------------------------

    def frontend_config(self) -> EmotionFrontendConfig:
        backend = {0: "emotion2vec", 1: "egemaps", 2: "basic"}[
            self.fallback_level]
        return EmotionFrontendConfig(
            backend=backend, use_concatenation=self.use_concatenation,
            sample_rate=self.sample_rate)

    @property
    def feature_dim(self) -> int:
        return self.frontend_config().feature_dim

    def _get_backend_name(self) -> str:
        return {0: "emotion2vec", 1: "opensmile", 2: "basic"}[
            self.fallback_level]

    # -- extraction -------------------------------------------------------

    def extract_features(self, audio, return_embeddings: bool = True,
                         return_predictions: bool = True) -> dict:
        from koemorph_tpu.utils.emotion_monitor import get_monitor

        start = time.time()
        self.extraction_stats["total_calls"] += 1
        audio_np = np.asarray(audio, dtype=np.float32)
        if audio_np.ndim == 1:
            audio_np = audio_np[None]
        b = audio_np.shape[0]
        monitor = get_monitor()
        token = monitor.log_processing_start(
            self._get_backend_name(), audio_shape=audio_np.shape,
            batch_size=b)

        def run_batch():
            embeddings, predictions, blendshapes = [], [], []
            for i in range(b):
                sample = audio_np[i]
                cached = self._load_from_cache(sample)
                if cached is not None and \
                        len(cached["embeddings"]) == self.feature_dim:
                    self.extraction_stats["cache_hits"] += 1
                    result = cached
                else:
                    result = self._extract_one(sample)
                    if result is not None:
                        self._save_to_cache(sample, result)
                if result is None:
                    embeddings.append(
                        np.zeros(self.feature_dim, dtype=np.float32))
                    predictions.append({})
                    blendshapes.append(np.zeros(52, dtype=np.float32))
                else:
                    embeddings.append(result["embeddings"])
                    predictions.append(result["predictions"])
                    blendshapes.append(result["blendshape_weights"])
            return embeddings, predictions, blendshapes

        try:
            # Runtime demotion mid-batch changes the embedding dim; redo the
            # whole batch until the level is stable so the stacked output is
            # homogeneous. The chain has 3 levels, so at most 2 re-runs.
            restore_level = (
                self.fallback_level
                if (self.fallback_level == 0 and self._e2v_module is None
                    and self._precomputed is not None)
                else None)
            for _ in range(3):
                level_before = self.fallback_level
                embeddings, predictions, blendshapes = run_batch()
                if self.fallback_level == level_before:
                    break
            served_backend = self._get_backend_name()
            # A precomputed-store MISS only concerns THIS batch's
            # utterances; unlike genuine backend failure, later batches of
            # known utterances should still get their 1024-D features, so
            # re-promote after the batch (the reference demotes
            # permanently because its failures are import/model-level).
            if restore_level is not None \
                    and self.fallback_level != restore_level:
                logger.info(
                    "precomputed emotion features missing for this batch; "
                    "served level-%d fallback, restoring emotion2vec for "
                    "future batches", self.fallback_level)
                self.fallback_level = restore_level
        except Exception:
            monitor.log_processing_end(token, success=False,
                                       error="batch extraction failed")
            raise

        out = {
            "metadata": {
                "backend_used": served_backend,
                "processing_time": time.time() - start,
                "cache_used": self.extraction_stats["cache_hits"] > 0,
            },
            "blendshape_weights": np.stack(blendshapes),
        }
        if return_embeddings:
            out["embeddings"] = np.stack(embeddings)
        if return_predictions:
            out["predictions"] = predictions

        self.extraction_stats["total_processed"] += b
        n = self.extraction_stats["total_calls"]
        self.extraction_stats["avg_processing_time"] = (
            (self.extraction_stats["avg_processing_time"] * (n - 1)
             + out["metadata"]["processing_time"]) / n)
        monitor.log_processing_end(
            token, success=any(np.any(e) for e in embeddings),
            emotion_predictions=predictions[0] if predictions else None,
            blendshape_weights=out["blendshape_weights"][0])
        return out

    def _extract_one(self, sample: np.ndarray) -> Optional[dict]:
        try:
            if self.fallback_level == 0:
                self.extraction_stats["emotion2vec_calls"] += 1
                from koemorph_tpu.features.emotion2vec import (
                    pool_to_fps, utterance_embedding)
                if self._e2v_module is None:
                    if self._precomputed is None:
                        raise RuntimeError("no emotion2vec source")
                    emb = self._precomputed.lookup(sample)
                else:
                    feats = self._e2v_module.apply(
                        self._e2v_params, jnp.asarray(sample[None]))
                    emb = np.asarray(utterance_embedding(feats))[0]
                preds = {"neutral": 0.6, **{l: 0.05 for l in
                                            ("happy", "sad", "angry")}}
                return {"embeddings": emb, "predictions": preds,
                        "blendshape_weights": emotion_to_blendshapes(preds)}
            if self.fallback_level == 1:
                self.extraction_stats["fallback_calls"] += 1
                emb = np.asarray(
                    emotion_features(jnp.asarray(sample),
                                     self.frontend_config()))
                preds = egemaps_to_emotion(emb[:88])
                bw = emotion_to_blendshapes(preds)
                bw = 0.7 * bw + 0.3 * egemaps_to_expression_blendshapes(
                    emb[:88])
                return {"embeddings": emb, "predictions": preds,
                        "blendshape_weights": np.clip(bw, 0, 1)}
            # basic
            self.extraction_stats["fallback_calls"] += 1
            emb = np.asarray(basic_emotion_features(jnp.asarray(sample),
                                                    self.sample_rate))
            preds = basic_emotion_heuristic(emb[0], emb[1], emb[3], emb[4])
            return {"embeddings": emb, "predictions": preds,
                    "blendshape_weights": emotion_to_blendshapes(preds)}
        except Exception as e:  # runtime demotion (reference :427-431)
            logger.warning("Emotion extraction failed at level %d: %s",
                           self.fallback_level, e)
            if self.fallback_level < 2:
                from koemorph_tpu.utils.emotion_monitor import get_monitor
                prev = self._get_backend_name()
                self.fallback_level += 1
                get_monitor().log_fallback_usage(
                    prev, self._get_backend_name(), str(e))
                return self._extract_one(sample)
            return None

    # -- caching ----------------------------------------------------------

    def _cache_path(self, audio: np.ndarray) -> Optional[Path]:
        if not self.enable_caching:
            return None
        import hashlib
        # stable content hash: Python's hash() is salted per process, which
        # would give the on-disk cache a 0% cross-run hit rate
        h = hashlib.sha1(np.ascontiguousarray(audio).tobytes()).hexdigest()
        return self.cache_dir / f"emotion_{h}.pkl"

    def _load_from_cache(self, audio: np.ndarray) -> Optional[dict]:
        p = self._cache_path(audio)
        if p is not None and p.exists():
            try:
                with open(p, "rb") as f:
                    return pickle.load(f)
            except Exception:
                return None
        return None

    def _save_to_cache(self, audio: np.ndarray, result: dict) -> None:
        p = self._cache_path(audio)
        if p is None:
            return
        try:
            with open(p, "wb") as f:
                pickle.dump(result, f)
        except Exception as e:
            logger.debug("Failed to cache results: %s", e)

    def get_statistics(self) -> dict:
        return self.extraction_stats.copy()

    def reset_statistics(self) -> None:
        self.extraction_stats = {
            "total_calls": 0, "total_processed": 0, "success_rate": 1.0,
            "cache_hits": 0, "emotion2vec_calls": 0, "fallback_calls": 0,
            "avg_processing_time": 0.0,
        }


def create_emotion_extractor(config: dict) -> EmotionExtractor:
    """Factory from a config dict (reference emotion_extractor.py:777-787)."""
    return EmotionExtractor(
        backend=config.get("backend", "emotion2vec"),
        model_name=config.get("model_name", "conv_emotion_encoder"),
        device=config.get("device", "tpu"),
        cache_dir=config.get("cache_dir"),
        enable_caching=config.get("enable_caching", True),
        batch_size=config.get("batch_size", 4),
        sample_rate=config.get("sample_rate", 16000),
        emotion2vec_params=config.get("emotion2vec_params"),
        use_concatenation=config.get("use_concatenation", True),
    )
