"""Projection heads: Whisper-embedding sequences -> metric-space vectors.

The reference ships the blocks (lib/layers.py ConvBlock/MeanPool/Linear) but
the head assembly lives in its absent driver (SURVEY.md §2.4). This module
defines the canonical WEALY head: a ConvBlock stack over the (B, T, C_in)
embedding sequence with optional temporal striding, masked mean pooling, and a
linear projection to ``zdim`` (512 per the reference's WEALY chunk embedding
shape, lib/embedding_dataset/collate_functions.py:19-23).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from wealy_tpu.models.layers import ConvBlock, mean_pool


class ProjectionHead(nn.Module):
    """ConvBlock stack + masked mean pool + Dense(zdim).

    x: (B, T, C_in); mask: (B, T) True=valid. Returns (B, zdim).
    With ``l2_normalize``, the output lands on the unit sphere (cosine
    retrieval geometry, matching CLEWSLoss — lib/losses.py:231-234).
    """

    zdim: int = 512
    hidden: Sequence[int] = (512, 512)
    kernel_size: int = 3
    strides: Optional[Sequence[int]] = None
    l2_normalize: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        strides = self.strides or (1,) * len(self.hidden)
        assert len(strides) == len(self.hidden)
        for i, (c, s) in enumerate(zip(self.hidden, strides)):
            x = ConvBlock(
                c, kernel_size=self.kernel_size, stride=s, dtype=self.dtype, name=f"conv_{i}"
            )(x)
            if mask is not None and s > 1:
                mask = mask[:, ::s]
        z = mean_pool(x, mask)
        z = nn.Dense(self.zdim, dtype=self.dtype, name="proj")(z)
        if self.l2_normalize:
            z = z / jnp.clip(jnp.linalg.norm(z, axis=-1, keepdims=True), min=1e-12)
        return z


class SequenceProjectionHead(nn.Module):
    """Like ProjectionHead but keeps the time axis: (B, T, C_in) -> (B, T', zdim).

    Used for chunked similarity (per-frame/per-window embeddings scored with
    distance_tensor_redux) and as the pre-pooling stage of fusion models.
    """

    zdim: int = 512
    hidden: Sequence[int] = (512,)
    kernel_size: int = 3
    strides: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        strides = self.strides or (1,) * len(self.hidden)
        for i, (c, s) in enumerate(zip(self.hidden, strides)):
            x = ConvBlock(
                c, kernel_size=self.kernel_size, stride=s, dtype=self.dtype, name=f"conv_{i}"
            )(x)
            if mask is not None and s > 1:
                mask = mask[:, ::s]
        x = nn.Dense(self.zdim, dtype=self.dtype, name="proj")(x)
        return x, mask
