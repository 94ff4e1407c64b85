"""Model registry keyed by ``conf.model.name``.

Covers the seven names the reference's collate dispatch enumerates
(lib/embedding_dataset/collate_functions.py:428-430). ``build_model`` returns
(module, call_signature) where call_signature documents which batch tensors
the model consumes — mirroring how the collate formats differ per model.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from wealy_tpu.models.fusion import (
    ConcatFusion,
    CrossAttentionFusion,
    TwoStreamModel,
    WealyClewsModel,
    WealyQueryFusion,
)
from wealy_tpu.models.heads import ProjectionHead

MODEL_NAMES = (
    "whisper",
    "wealy-clews",
    "whisper-clews",
    "multimodal-cross-attention",
    "multimodal-concatenation",
    "multimodal-cross-attention-residual",
    "multimodal-two-stream",
)


def build_model(name: str, zdim: int = 512, dtype: Any = jnp.float32, **kwargs):
    """Build the model for ``conf.model.name``.

    Returns (module, signature) where signature in:
      - "single"    : (emb, mask) -> z
      - "wealy"     : (wealy_vec, clews_seq, clews_mask) -> z
        (wealy-clews AND the cross-attention/concatenation family — the
        reference trains all four on the WEALY 5-item collate)
      - "dual"      : (whisper_seq, whisper_mask, clews_seq, clews_mask) -> z
        (library signature of the raw sequence-fusion modules)
      - "two_stream": same inputs as dual -> (z, z_whisper, z_clews)
    """
    if name == "whisper":
        return ProjectionHead(zdim=zdim, dtype=dtype, **kwargs), "single"
    if name == "wealy-clews":
        return WealyClewsModel(zdim=zdim, dtype=dtype, **kwargs), "wealy"
    if name in ("whisper-clews", "multimodal-two-stream"):
        return TwoStreamModel(zdim=zdim, dtype=dtype, **kwargs), "two_stream"
    # the cross-attention / concatenation family trains on the WEALY 5-item
    # format per the reference's collate dispatch (collate_functions.py:
    # 428-571): one (512,) WEALY chunk embedding per version + CLEWS context.
    # WealyQueryFusion adapts that vector into the sequence-fusion modules as
    # a length-1 query, so their data signature is "wealy".
    if name == "multimodal-cross-attention":
        return (
            WealyQueryFusion(CrossAttentionFusion(zdim=zdim, dtype=dtype, **kwargs)),
            "wealy",
        )
    if name == "multimodal-concatenation":
        return WealyQueryFusion(ConcatFusion(zdim=zdim, dtype=dtype, **kwargs)), "wealy"
    if name == "multimodal-cross-attention-residual":
        return (
            WealyQueryFusion(
                CrossAttentionFusion(zdim=zdim, residual=True, dtype=dtype, **kwargs)
            ),
            "wealy",
        )
    raise KeyError(f"unknown model name {name!r}; available: {MODEL_NAMES}")
