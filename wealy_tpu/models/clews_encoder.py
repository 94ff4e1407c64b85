"""CLEWS acoustic encoder: CQT spectrogram -> IBN-ResNet CNN -> GeM -> 2048-d.

The reference consumes precomputed CLEWS embeddings (hs_clews (116, 2048),
lib/embedding_dataset/multimodal_dataset.py:143-152) and ships only the
building blocks (CQTPrepare / MyIBNResBlock / GeMPool, lib/layers.py). This
module assembles the encoder so the framework owns the acoustic branch
end-to-end: (B, F, T, 1) CQT -> (B, embed_dim) or a per-window sequence
matching the (116, 2048) layout.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from wealy_tpu.models.layers import CQTPrepare, GeMPool, MyIBNResBlock, PadConv2d


class ClewsEncoder(nn.Module):
    """CQTPrepare -> stem conv -> MyIBNResBlock stages -> GeM pool -> Dense.

    Input: (B, F, T, 1) CQT magnitude (freq-major, channel-last).
    Output: (B, embed_dim) embedding (2048-d to match the reference's CLEWS
    shape envelope).
    """

    embed_dim: int = 2048
    stem: int = 64
    stages: Sequence[Tuple[int, int]] = ((64, 1), (128, 2), (256, 2), (512, 2))
    blocks_per_stage: int = 2
    ibn: str = "pre"
    se: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cqt, train: bool = False):
        h = CQTPrepare(name="prepare")(cqt, add_noise=train)
        h = PadConv2d(self.stem, 7, stride=2, use_bias=False, name="stem")(h)
        ncin = self.stem
        for si, (ncout, stride) in enumerate(self.stages):
            for bi in range(self.blocks_per_stage):
                h = MyIBNResBlock(
                    ncin,
                    ncout,
                    stride=stride if bi == 0 else 1,
                    ibn=self.ibn,
                    se=self.se,
                    name=f"stage{si}_block{bi}",
                )(h, train=train)
                ncin = ncout
        z = GeMPool(features=1, name="gem")(h)  # (B, C)
        z = nn.Dense(self.embed_dim, name="proj")(z)
        return z


class ClewsWindowEncoder(nn.Module):
    """Apply :class:`ClewsEncoder` per time window to produce the sequence
    layout of the reference's ``hs_clews`` files: (B, n_windows, embed_dim).

    The input CQT is split into ``n_windows`` equal time slices (XLA-friendly:
    a reshape, then vmap-style batching through the shared encoder).
    """

    n_windows: int = 116
    embed_dim: int = 2048
    encoder_kwargs: dict = None

    @nn.compact
    def __call__(self, cqt, train: bool = False):
        B, F, T, C = cqt.shape
        W = self.n_windows
        assert T % W == 0, f"time axis {T} must divide into {W} windows"
        win = T // W
        x = cqt.reshape(B, F, W, win, C)
        x = jnp.moveaxis(x, 2, 1).reshape(B * W, F, win, C)
        enc = ClewsEncoder(
            embed_dim=self.embed_dim, **(self.encoder_kwargs or {}), name="encoder"
        )
        z = enc(x, train=train)  # (B*W, D)
        return z.reshape(B, W, self.embed_dim)
