"""Feature extraction: emotion chain with fallback levels, streaming
extractor host APIs, emotion2vec backbone."""

from koemorph_tpu.features.basic import BASIC_DIM, basic_emotion_features
from koemorph_tpu.features.emotion import (
    CONCAT_DIM,
    EMOTION_TO_BLENDSHAPE_MAPPING,
    EmotionExtractor,
    EmotionFrontendConfig,
    PrecomputedEmotionFeatures,
    create_emotion_extractor,
    emotion_features,
    emotion_to_blendshapes,
)
from koemorph_tpu.features.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Encoder,
)
from koemorph_tpu.features.emotion2vec import (
    ConvEmotionEncoder,
    Emotion2VecCache,
    pool_to_fps,
    utterance_embedding,
)
from koemorph_tpu.features.sliding_window import (
    MelAudioBuffer,
    MelSlidingWindowExtractor,
    create_mel_extractor,
)
from koemorph_tpu.features.egemaps_extractor import (
    AudioBuffer,
    EgemapsStreamingExtractor,
    OpenSMILEeGeMAPSExtractor,
    create_egemaps_extractor,
    create_opensmile_extractor,
)
from koemorph_tpu.features.stft import (
    InverseMelSpectrogram,
    MelSpectrogramExtractor,
)

__all__ = [
    "BASIC_DIM", "basic_emotion_features",
    "CONCAT_DIM", "EMOTION_TO_BLENDSHAPE_MAPPING",
    "EmotionExtractor", "EmotionFrontendConfig",
    "PrecomputedEmotionFeatures", "Wav2Vec2Config", "Wav2Vec2Encoder",
    "create_emotion_extractor", "emotion_features",
    "emotion_to_blendshapes",
    "ConvEmotionEncoder", "Emotion2VecCache", "pool_to_fps",
    "utterance_embedding",
    "MelAudioBuffer", "MelSlidingWindowExtractor", "create_mel_extractor",
    "AudioBuffer", "EgemapsStreamingExtractor",
    "OpenSMILEeGeMAPSExtractor",
    "create_egemaps_extractor", "create_opensmile_extractor",
    "MelSpectrogramExtractor", "InverseMelSpectrogram",
]
