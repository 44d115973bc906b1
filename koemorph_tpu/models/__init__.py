"""Model layer: dual-stream production core, legacy KoeMorph family,
losses/metrics — reference ``src/model`` public API re-exported
(SURVEY.md section 2.3)."""

from koemorph_tpu.models.attention import (
    BlendshapeQueryEmbedding,
    MultiHeadCrossAttention,
    MultiStreamAudioEncoder,
    PositionalEncoding,
    create_attention_mask,
)
from koemorph_tpu.models.decoder import (
    BlendshapeConstraints,
    BlendshapeDecoder,
    ConstraintState,
    SmootherState,
    TemporalSmoother,
    validate_blendshape_output,
)
from koemorph_tpu.models.dual_stream import (
    DualStreamCrossAttention,
    DualStreamEncoder,
)
from koemorph_tpu.models.dual_stream_model import (
    SequentialDualStreamModel,
    SimplifiedDualStreamModel,
    TemporalState,
)
from koemorph_tpu.models.legacy import KoeMorphModel, create_koemorph_model
from koemorph_tpu.models.losses import (
    BlendshapeMetrics,
    KoeMorphLoss,
    KoeMorphLossConfig,
    LandmarkConsistencyLoss,
    PerceptualBlendshapeLoss,
    compute_lip_sync_metrics,
    dual_stream_loss,
    koemorph_loss,
    sequence_koemorph_loss,
)
from koemorph_tpu.models.simplified import SimplifiedKoeMorphModel

__all__ = [
    "BlendshapeQueryEmbedding", "MultiHeadCrossAttention",
    "MultiStreamAudioEncoder", "PositionalEncoding",
    "create_attention_mask",
    "BlendshapeConstraints", "BlendshapeDecoder", "ConstraintState",
    "SmootherState", "TemporalSmoother", "validate_blendshape_output",
    "DualStreamCrossAttention", "DualStreamEncoder",
    "SequentialDualStreamModel", "SimplifiedDualStreamModel",
    "TemporalState",
    "KoeMorphModel", "create_koemorph_model",
    "BlendshapeMetrics", "KoeMorphLoss", "KoeMorphLossConfig",
    "LandmarkConsistencyLoss", "PerceptualBlendshapeLoss",
    "compute_lip_sync_metrics", "dual_stream_loss", "koemorph_loss",
    "sequence_koemorph_loss",
    "SimplifiedKoeMorphModel",
]
