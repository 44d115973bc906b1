"""Import PyTorch reference checkpoints into this framework.

A user of the reference repo has trained ``.pth`` checkpoints
(``{"model_state_dict": ...}`` dicts, reference src/train.py:300-328 /
train_sequential.py:297-329). This module maps the reference's
``DualStreamCrossAttention`` / ``SimplifiedDualStreamModel`` weights onto
our Flax parameter tree so those checkpoints serve and fine-tune here
unchanged. The mapping is the same one the weight-transplant parity tests
pin at 1e-5 (tests/models/test_reference_parity.py,
tests/models/test_e2e_reference_parity.py).

Notes on the reference checkpoint contents:
- ``dual_stream_attention.*``: fully mapped (queries, per-channel encoder,
  LayerNorms, packed-QKV MHAs, output projections, decoder head, stream
  weights).
- ``smoothing_alpha``: mapped.
- The 264->256 emotion compression does NOT exist in reference
  checkpoints — the reference created it lazily inside the *feature
  extractor*, unregistered and untrained (opensmile_extractor.py:587-604,
  flagged in SURVEY.md). Our trained ``emotion_projection`` keeps its
  initialization and should be fine-tuned.

Everything here operates on numpy arrays; ``torch`` is only needed by
:func:`load_torch_state_dict` to read the file.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Union

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["load_torch_state_dict", "attention_params_from_state_dict",
           "model_params_from_state_dict", "import_torch_checkpoint"]


def load_torch_state_dict(path: Union[str, Path]) -> dict:
    """Read a reference ``.pth`` file -> {name: np.ndarray}.

    Accepts both raw state dicts and trainer checkpoint dicts
    (``model_state_dict`` key, reference train.py:300-328).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in blob.items()}


def attention_params_from_state_dict(sd: dict, prefix: str = "") -> dict:
    """Reference ``DualStreamCrossAttention`` state dict -> our Flax
    ``DualStreamCrossAttention`` params (same mapping as the parity
    tests)."""
    def g(name):
        return sd[f"{prefix}{name}"]

    def lin(p):
        return {"kernel": g(f"{p}.weight").T, "bias": g(f"{p}.bias")}

    def ln(p):
        return {"scale": g(f"{p}.weight"), "bias": g(f"{p}.bias")}

    def mha(p):
        return {
            "in_proj_weight": g(f"{p}.in_proj_weight"),
            "in_proj_bias": g(f"{p}.in_proj_bias"),
            "out_proj": lin(f"{p}.out_proj"),
        }

    params = {
        "mouth_queries": g("mouth_queries"),
        "expression_queries": g("expression_queries"),
        "mel_channel_encoder": lin("mel_channel_encoder"),
        "mel_norm": ln("mel_norm"),
        "emotion_norm": ln("emotion_norm"),
        "emotion_encoder": lin("emotion_encoder"),
        "mel_attention": mha("mel_attention"),
        "emotion_attention": mha("emotion_attention"),
        "mel_output_proj": lin("mel_output_proj"),
        "emotion_output_proj": lin("emotion_output_proj"),
        "decoder_hidden": lin("blendshape_decoder.0"),
        "decoder_out": lin("blendshape_decoder.3"),
    }
    if f"{prefix}mel_weights" in sd:   # learnable fusion (production)
        params["mel_weights"] = g("mel_weights")
        params["emotion_weights"] = g("emotion_weights")
    return params


def model_params_from_state_dict(sd: dict, init_params: dict) -> dict:
    """Map a reference ``SimplifiedDualStreamModel`` (or sequential
    subclass) state dict onto a freshly initialized parameter tree of our
    model. Unmapped subtrees (the emotion projection; see module
    docstring) keep their initialization."""
    import jax
    import jax.numpy as jnp

    params = dict(init_params)
    att = attention_params_from_state_dict(sd,
                                           prefix="dual_stream_attention.")
    init_att = params["dual_stream_attention"]
    want = set(init_att)
    got = set(att)
    if want - got:
        raise ValueError(
            f"checkpoint missing attention parameters: {sorted(want - got)}"
            " (a checkpoint without mel_weights/emotion_weights was "
            "trained with fixed fusion — build the model with "
            "use_learnable_weights=False)")
    surplus = got - want
    if surplus == {"mel_weights", "emotion_weights"}:
        # the reference stores fusion weights as buffers even in fixed
        # mode; a use_learnable_weights=False target recomputes the same
        # binary masks statically, so dropping them is lossless
        logger.info("dropping checkpoint fusion weights (target model "
                    "uses fixed fusion masks)")
        att = {k: v for k, v in att.items() if k not in surplus}
    elif surplus:
        raise ValueError(
            f"checkpoint has attention parameters the model does not "
            f"expect: {sorted(surplus)}")
    # fail fast on architecture mismatches (wrong --d-model etc.) instead
    # of writing a checkpoint that crashes opaquely at serve time
    def check_shapes(path, init_leaf, new_leaf):
        if np.shape(init_leaf) != np.shape(new_leaf):
            raise ValueError(
                f"shape mismatch at dual_stream_attention.{path}: model "
                f"expects {np.shape(init_leaf)}, checkpoint has "
                f"{np.shape(new_leaf)} — check --d-model / --num-heads / "
                "--mel-sequence-length against the training config")

    for key, init_leaf in jax.tree_util.tree_leaves_with_path(init_att):
        new_leaf = att
        for k in key:
            new_leaf = new_leaf[k.key]
        check_shapes(jax.tree_util.keystr(key), init_leaf, new_leaf)
    params["dual_stream_attention"] = jax.tree_util.tree_map(
        jnp.asarray, att)
    if "smoothing_alpha" in sd:
        params["smoothing_alpha"] = jnp.asarray(
            np.reshape(sd["smoothing_alpha"], ()))
    logger.info("mapped attention + smoothing_alpha from reference "
                "checkpoint; emotion_projection keeps initialization "
                "(untrained in the reference)")
    return params


def import_torch_checkpoint(pth_path: Union[str, Path], model,
                            out_dir: Union[str, Path],
                            example_audio_len: int | None = None) -> str:
    """Convert a reference ``.pth`` into an orbax checkpoint dir usable by
    rt/infer/export/--resume.

    ``model`` is our SimplifiedDualStreamModel / SequentialDualStreamModel
    configured to the checkpoint's architecture (d_model, window, ...).
    """
    import jax
    import jax.numpy as jnp

    from koemorph_tpu.train.checkpoint import save_checkpoint

    sd = load_torch_state_dict(pth_path)
    hop = int(model.sample_rate / model.target_fps)
    n = example_audio_len or model.mel_sequence_length * hop
    init = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, n), jnp.float32))["params"]
    params = model_params_from_state_dict(sd, init)
    save_checkpoint(Path(out_dir), params,
                    config={"imported_from": str(pth_path),
                            "source": "torch-reference"})
    return str(out_dir)
