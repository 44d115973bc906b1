"""Reference public-API surface check.

A user of the reference repo (atsuki-ichikawa/KoeMorph) migrating to this
framework should find every public symbol SURVEY.md section 2 inventories,
importable from the analogous package. This test pins that contract so
refactors can't silently drop reference-parity names.
"""

import importlib

import pytest

SURFACE = {
    "koemorph_tpu.blendshapes": [
        # dual_stream_attention.py:14-45
        "ARKIT_BLENDSHAPES", "MOUTH_BLENDSHAPES", "MOUTH_INDICES",
        "EXPRESSION_INDICES",
    ],
    "koemorph_tpu.data": [
        # io.py:23-218, dataset.py:24-316, sequential_dataset.py:22-363,
        # adaptive_sequential_dataset.py:21-348
        "ARKitDataLoader", "validate_data_consistency",
        "KoeMorphDataset", "collate_fn", "KoeMorphDataModule",
        "SequentialKoeMorphDataset", "SequentialBatchSampler",
        "create_sequential_dataloader", "AdaptiveSequentialDataset",
        "create_adaptive_dataloader",
    ],
    "koemorph_tpu.features": [
        # stft.py:23-337, mel_sliding_window.py:21-440,
        # opensmile_extractor.py:29-697, emotion_extractor.py:64-786,
        # emotion2vec.py:29-469
        "MelSpectrogramExtractor", "InverseMelSpectrogram",
        "MelAudioBuffer", "MelSlidingWindowExtractor",
        "create_mel_extractor",
        "AudioBuffer", "OpenSMILEeGeMAPSExtractor",
        "create_opensmile_extractor",
        "EmotionExtractor", "EMOTION_TO_BLENDSHAPE_MAPPING",
        "create_emotion_extractor",
        "Emotion2VecCache",
    ],
    "koemorph_tpu.models": [
        # dual_stream_attention.py:48-391,
        # simplified_dual_stream_model.py:23,
        # sequential_dual_stream_model.py:17, attention.py:22-509,
        # decoder.py:21-533, losses.py:29-524, gaussian_face.py:27-325,
        # simplified_model.py:12
        "DualStreamCrossAttention", "DualStreamEncoder",
        "SimplifiedDualStreamModel", "SequentialDualStreamModel",
        "MultiHeadCrossAttention", "create_attention_mask",
        "MultiStreamAudioEncoder", "PositionalEncoding",
        "BlendshapeQueryEmbedding",
        "BlendshapeDecoder", "TemporalSmoother", "BlendshapeConstraints",
        "validate_blendshape_output",
        "KoeMorphLoss", "PerceptualBlendshapeLoss",
        "LandmarkConsistencyLoss", "BlendshapeMetrics",
        "compute_lip_sync_metrics",
        "KoeMorphModel", "create_koemorph_model",
        "SimplifiedKoeMorphModel",
    ],
    "koemorph_tpu.features.prosody_api": [],  # prosody lives in ops
    "koemorph_tpu.ops": [
        # prosody.py:24-459 (functional form), stft.py helpers
        "compute_reconstruction_snr", "validate_mel_parameters",
        "yin_f0",
    ],
    "koemorph_tpu.utils": [
        # emotion_monitor.py:22-509
        "EmotionProcessingMonitor", "get_monitor",
    ],
    "koemorph_tpu.train": [
        # train.py:32, train_dual_stream.py:32, train_sequential.py:34
        "KoeMorphTrainer", "DualStreamTrainer", "SequentialTrainer",
    ],
}


@pytest.mark.parametrize("module,names", sorted(SURFACE.items()))
def test_reference_surface_importable(module, names):
    if not names:
        pytest.skip("placeholder entry")
    mod = importlib.import_module(module)
    missing = [n for n in names if not hasattr(mod, n)]
    assert not missing, f"{module} missing reference symbols: {missing}"


def test_prosody_functions_available():
    from koemorph_tpu.ops.prosody import (  # noqa: F401
        denormalize_prosody,
        extract_prosody,
        normalize_prosody,
    )
