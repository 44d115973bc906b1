"""Streaming real-time inference: device-resident ring-buffer state, one
jitted per-frame step, host audio/output shells."""

from koemorph_tpu.runtime.streaming import (
    StreamingConfig,
    StreamingInference,
    StreamState,
    init_stream_state,
    stream_frame,
)
from koemorph_tpu.runtime.streamers import BlendshapeStreamer, encode_osc_message
from koemorph_tpu.runtime.audio import (
    HAS_PYAUDIO,
    AudioFileReader,
    MicCapture,
    list_audio_devices,
)
from koemorph_tpu.runtime.engine import run_realtime_loop
from koemorph_tpu.runtime.multistream import MultiStreamInference

__all__ = [
    "StreamingConfig", "StreamState", "StreamingInference",
    "MultiStreamInference",
    "init_stream_state", "stream_frame",
    "BlendshapeStreamer", "encode_osc_message",
    "AudioFileReader", "MicCapture", "HAS_PYAUDIO", "list_audio_devices",
    "run_realtime_loop",
]
