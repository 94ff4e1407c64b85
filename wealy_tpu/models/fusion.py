"""Multimodal fusion models: Whisper (lyric) branch x CLEWS (acoustic) branch.

The reference enumerates seven model names in its collate dispatch
(lib/embedding_dataset/collate_functions.py:428-430) but ships no model
assembly (absent driver). This module defines the fusion architectures for
each name; the batching contracts (which tensors each model consumes) follow
the collate formats in §2.2 of SURVEY.md:

  whisper                          -> single-modal whisper head
  wealy-clews                      -> WEALY chunk embeddings (n_chunks, 512) x CLEWS
  whisper-clews / multimodal-two-stream -> whisper hs_last_seq x CLEWS, two towers
  multimodal-cross-attention       -> whisper seq attends into CLEWS seq
  multimodal-concatenation         -> pooled concat -> MLP
  multimodal-cross-attention-residual -> cross-attention + concat residual

All fusion heads output a single (B, zdim) metric-space embedding (CLEWSLoss
contract), except the two-stream model which returns both tower embeddings
plus their average.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from wealy_tpu.models.heads import ProjectionHead
from wealy_tpu.models.layers import mean_pool


class CrossAttentionFusion(nn.Module):
    """Whisper sequence (queries) attends into the CLEWS sequence (keys/values);
    attended + query streams are pooled and projected to zdim.

    ``residual=True`` adds the concatenated pooled single-modal streams back
    into the fused projection (the *-residual model name).
    """

    zdim: int = 512
    width: int = 512
    n_heads: int = 8
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, whisper_seq, whisper_mask, clews_seq, clews_mask):
        q = nn.Dense(self.width, dtype=self.dtype, name="q_in")(whisper_seq)
        kv = nn.Dense(self.width, dtype=self.dtype, name="kv_in")(clews_seq)
        attn_mask = None
        if clews_mask is not None:
            # (B, 1, Tq, Tk) True=attend
            attn_mask = clews_mask[:, None, None, :].astype(bool)
        fused = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, name="cross_attn"
        )(inputs_q=q, inputs_k=kv, inputs_v=kv, mask=attn_mask)
        fused = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(
            fused + q
        ).astype(self.dtype)
        z = mean_pool(fused, whisper_mask)
        if self.residual:
            zw = mean_pool(whisper_seq, whisper_mask)
            zc = mean_pool(clews_seq, clews_mask)
            z = jnp.concatenate([z, zw, zc], axis=-1)
        z = nn.Dense(self.zdim, dtype=self.dtype, name="proj")(z)
        return z


class ConcatFusion(nn.Module):
    """Pool each modality, concat, MLP -> zdim (multimodal-concatenation)."""

    zdim: int = 512
    hidden: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, whisper_seq, whisper_mask, clews_seq, clews_mask):
        zw = mean_pool(whisper_seq, whisper_mask)
        zc = mean_pool(clews_seq, clews_mask)
        z = jnp.concatenate([zw, zc], axis=-1)
        z = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(z)
        z = nn.relu(z)
        z = nn.Dense(self.zdim, dtype=self.dtype, name="proj")(z)
        return z


class TwoStreamModel(nn.Module):
    """Independent projection towers per modality (whisper-clews /
    multimodal-two-stream). Returns (z_fused, z_whisper, z_clews); the fused
    embedding is the L2-normalized mean of the tower outputs."""

    zdim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, whisper_seq, whisper_mask, clews_seq, clews_mask):
        zw = ProjectionHead(zdim=self.zdim, dtype=self.dtype, name="whisper_head")(
            whisper_seq, whisper_mask
        )
        zc = ProjectionHead(zdim=self.zdim, dtype=self.dtype, name="clews_head")(
            clews_seq, clews_mask
        )
        z = 0.5 * (zw + zc)
        z = z / jnp.clip(jnp.linalg.norm(z, axis=-1, keepdims=True), min=1e-12)
        return z, zw, zc


class WealyQueryFusion(nn.Module):
    """Adapter matching the reference's data contract for the
    multimodal-cross-attention / multimodal-concatenation /
    multimodal-cross-attention-residual names: these train on the WEALY
    5-item format (ONE precomputed (512,) WEALY chunk embedding per version
    + the CLEWS context — lib/embedding_dataset/collate_functions.py:428-571),
    not on raw whisper sequences. The WEALY vector enters the underlying
    sequence-fusion module as a length-1 query sequence."""

    inner: nn.Module

    @nn.compact
    def __call__(self, wealy_vec, clews_seq, clews_mask=None):
        q = wealy_vec[:, None, :]  # (B, 1, C)
        qm = jnp.ones(q.shape[:2], bool)
        return self.inner(q, qm, clews_seq, clews_mask)


class WealyClewsModel(nn.Module):
    """wealy-clews: precomputed WEALY chunk embedding (B, 512) (one chunk per
    song at train time — lib/embedding_dataset/collate_functions.py:9-51)
    fused with the CLEWS sequence (B, 116, 2048) via gated concat."""

    zdim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wealy_vec, clews_seq, clews_mask=None):
        zc = mean_pool(clews_seq, clews_mask)
        zc = nn.Dense(self.zdim, dtype=self.dtype, name="clews_proj")(zc)
        zw = nn.Dense(self.zdim, dtype=self.dtype, name="wealy_proj")(wealy_vec)
        gate = jax.nn.sigmoid(
            nn.Dense(self.zdim, dtype=self.dtype, name="gate")(
                jnp.concatenate([zw, zc], axis=-1)
            )
        )
        z = gate * zw + (1.0 - gate) * zc
        z = nn.Dense(self.zdim, dtype=self.dtype, name="proj")(z)
        return z
