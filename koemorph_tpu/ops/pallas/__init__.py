"""Pallas TPU kernels for the hot DSP ops (interpreter-mode on CPU)."""

from koemorph_tpu.ops.pallas.frontend_kernel import (
    fused_frames_to_logmel,
    fused_log_mel_frontend,
)

__all__ = ["fused_frames_to_logmel", "fused_log_mel_frontend"]
