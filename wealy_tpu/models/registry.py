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
      - "dual"      : (whisper_seq, whisper_mask, clews_seq, clews_mask) -> z
      - "two_stream": same inputs as dual -> (z, z_whisper, z_clews)
    """
    if name == "whisper":
        return ProjectionHead(zdim=zdim, dtype=dtype, **kwargs), "single"
    if name == "wealy-clews":
        return WealyClewsModel(zdim=zdim, dtype=dtype, **kwargs), "wealy"
    if name in ("whisper-clews", "multimodal-two-stream"):
        return TwoStreamModel(zdim=zdim, dtype=dtype, **kwargs), "two_stream"
    if name == "multimodal-cross-attention":
        return CrossAttentionFusion(zdim=zdim, dtype=dtype, **kwargs), "dual"
    if name == "multimodal-concatenation":
        return ConcatFusion(zdim=zdim, dtype=dtype, **kwargs), "dual"
    if name == "multimodal-cross-attention-residual":
        return CrossAttentionFusion(zdim=zdim, residual=True, dtype=dtype, **kwargs), "dual"
    raise KeyError(f"unknown model name {name!r}; available: {MODEL_NAMES}")
