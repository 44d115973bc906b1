"""Export: jax2tf SavedModel / TFLite with numerical parity gates."""

from koemorph_tpu.export.exporter import (
    ExportReport,
    benchmark_fn,
    export_savedmodel,
    export_tflite,
    verify_export,
)

__all__ = ["ExportReport", "export_savedmodel", "export_tflite",
           "verify_export", "benchmark_fn"]
