"""Fused non-causal multi-head attention for the Whisper encoder (Pallas).

Design (vs generic flash attention): Whisper's encoder attends over a fixed
1500-frame sequence with head_dim 64. A full K/V pair for a GROUP of heads
fits comfortably in VMEM, so instead of online-softmax tiling over K, the
kernel keeps K and V resident, computes a (block_q, seq) score tile in fp32
per head, does one exact softmax pass, and multiplies into V. The XLA path
materializes (B, H, T, T) fp32 logits in HBM (~54 MB per tiny-encoder clip);
this kernel eliminates that entirely.

Round-2 layout redesign (+36% on the whole attention section, bit-identical):
the kernel reads q/k/v in the NATURAL (B, T, H*Dh) activation layout — heads
live in the lane dimension and are sliced per head with static 64-wide lane
slices inside the kernel. The previous layout ((B*H, T, Dh), one grid row per
head) forced XLA to materialize transposed (B,T,H,Dh)->(B,H,T,Dh) copies of
q, k, v and the output at the pallas_call boundary (custom calls can't fuse),
~4 full HBM round-trips per layer that this layout simply deletes. Heads are
processed in groups of ``g`` per grid cell (g*Dh lanes, g*Dh % 128 == 0 or
g == H) so K/V blocks stay within VMEM for wide models: tiny/base/small all
run one-or-two groups of 384-512 lanes; large-v3 (H=20) runs 5 groups of 4.

Softmax uses a CONSTANT shift carried by an additive mask row (exp(s - c)/sum
is shift-invariant), so the per-element work is min+add+exp — but measurement
shows the elementwise chain is FREE anyway: a matmuls-only variant times
identically (5.76 vs 5.77 ms at tiny B=64), i.e. the kernel is bound by the
f32 score-tile VMEM round-trip between the two MXU ops. Mosaic requires
32-bit matmul accumulators, so a bf16 score tile is not expressible and
~5.8 ms (38 TFLOP/s) is this design's floor at tiny shapes; the section-level
win had to come from the XLA glue instead (benchmarks/bench_attn_section.py).

VMEM per grid cell at block_q=512, seq=1536, g*Dh=384 (bf16 K/V, f32 scores):
  K 1.1M + V 1.1M + Q 0.4M + scores 3.1M + out 0.4M ≈ 6.2 MB (+ double
  buffering) — in budget; K/V re-fetch only when the batch index changes.

Backward: recompute-based tiled Pallas kernels (dQ + accumulating dK/dV) in
the per-head (B*H, T, Dh) layout. Training still avoids materializing the
forward score matrix; the backward pays the standard quadratic cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 512
_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


_SHIFT = 24.0  # constant softmax shift (see below)
_SCORE_CLAMP = 60.0


def _mha_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, n_heads: int, head_dim: int):
    """One (batch, head-group, q-block) grid step; K/V resident for the group.

    q/k/v/o refs are (1, block, g*Dh) slabs of the NATURAL (B, T, D) layout;
    each head is a static 64-wide lane slice. ``m_ref`` is a (1, seq_pad)
    additive row folding the constant softmax shift (-_SHIFT on valid
    columns; exp(s - c)/sum is shift-invariant) and the pad-column mask
    (-inf-ish) into one add. Scores are clamped at +_SCORE_CLAMP so exp stays
    far from f32 overflow even for adversarial inputs (exp(60-24) * 1536
    terms ~ 7e18 << 3.4e38); entries that far above the rest saturate the
    softmax regardless. The 1/l normalization is deferred to AFTER the V
    matmul: dividing the (block_q, Dh) output instead of the (block_q, seq)
    weights removes one full pass over the score tile.
    """
    m = m_ref[...]
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl]  # (block_q, Dh)
        k = k_ref[0, :, sl]  # (seq_pad, Dh)
        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp(jnp.minimum(s, _SCORE_CLAMP) + m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0, :, sl], preferred_element_type=jnp.float32
        )
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


def _reference_mha(q, k, v, scale):
    """XLA einsum attention — numerics ground truth and backward-pass body."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(s * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _head_group(n_heads: int, head_dim: int, max_lanes: int = 512) -> int:
    """Heads per grid cell: largest divisor g of H with g*Dh lanes that are
    either a multiple of 128 (legal non-full block width) or the whole D
    (block == array dim is always legal), capped at ~max_lanes so K/V blocks
    stay within VMEM for wide models."""
    best = 0
    for g in range(1, n_heads + 1):
        lanes = g * head_dim
        if n_heads % g == 0 and lanes % 128 == 0 and lanes <= max_lanes:
            best = g
    # no legal sub-block width exists (e.g. H*Dh < 128): a block equal to the
    # full array dim is always legal
    return best or n_heads


def _flash_mha_fwd_impl(q, k, v, scale: float, block_q: int):
    B, T, H, D = q.shape
    Tk = k.shape[1]
    bq = min(block_q, _round_up(T, 128))
    Tq_pad = _round_up(T, bq)
    Tk_pad = _round_up(Tk, 128)
    g = _head_group(H, D)
    G = H // g
    gD = g * D

    def to_btd(x, t_pad):
        # (B, T, H, Dh) -> (B, T_pad, H*Dh): a free reshape + pad, NOT a
        # transpose — the whole point of the natural-layout kernel
        x = x.reshape(B, x.shape[1], H * D)
        if x.shape[1] != t_pad:
            x = jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))
        return x

    # scale q outside the kernel (fuses into whatever produced q; for
    # Whisper's Dh=64 the 0.125 factor is a power of two, hence exact in bf16)
    qb = to_btd(q * scale, Tq_pad)
    kb = to_btd(k, Tk_pad)
    vb = to_btd(v, Tk_pad)
    mask_row = jnp.where(
        jnp.arange(Tk_pad)[None, :] < Tk, -_SHIFT, _NEG_INF
    ).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_mha_kernel, n_heads=g, head_dim=D),
        grid=(B, G, Tq_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, gD), lambda b, hg, j: (b, j, hg)),
            pl.BlockSpec((1, Tk_pad, gD), lambda b, hg, j: (b, 0, hg)),
            pl.BlockSpec((1, Tk_pad, gD), lambda b, hg, j: (b, 0, hg)),
            pl.BlockSpec((1, Tk_pad), lambda b, hg, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, gD), lambda b, hg, j: (b, j, hg)),
        out_shape=jax.ShapeDtypeStruct((B, Tq_pad, H * D), q.dtype),
    )(qb, kb, vb, mask_row)
    return out[:, :T].reshape(B, T, H, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_mha(q, k, v, scale: float, block_q: int = DEFAULT_BLOCK_Q):
    """Non-causal MHA: q (B, Tq, H, D), k/v (B, Tk, H, D) -> (B, Tq, H, D).

    ``scale`` multiplies the raw q@k^T logits (pass 1/sqrt(D) for standard
    attention). On non-TPU backends this falls back to the XLA einsum path.
    """
    if jax.default_backend() != "tpu":
        return _reference_mha(q, k, v, scale)
    return _flash_mha_fwd_impl(q, k, v, scale, block_q)


def _dq_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, *, scale: float, seq_len: int):
    """dQ for one (batch*head, q-block): recompute p, then
    ds = p * (dp - rowsum(p*dp)) * scale, dq = ds @ K."""
    q = q_ref[0]
    kk = k_ref[0]
    vv = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_len, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)  # (bq, Tk) f32
    dp = jax.lax.dot_general(
        g, vv.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, Tk)
    delta = jnp.sum(p * dp, axis=1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq_ref[0] = jnp.dot(
        ds.astype(q.dtype), kk, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, g_ref, dk_ref, dv_ref, acc_dk, acc_dv, *, scale: float, seq_len: int
):
    """dK/dV for one (batch*head): accumulate over q-blocks (grid dim 1)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_dk[...] = jnp.zeros_like(acc_dk)
        acc_dv[...] = jnp.zeros_like(acc_dv)

    q = q_ref[0]
    kk = k_ref[0]
    vv = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_len, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    dp = jax.lax.dot_general(
        g, vv.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jnp.sum(p * dp, axis=1, keepdims=True)
    ds = p * (dp - delta) * scale  # (bq, Tk)
    # dk += ds^T @ q ; dv += p^T @ g
    acc_dk[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_dv[...] += jax.lax.dot_general(
        p.astype(q.dtype), g.astype(q.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _store():
        dk_ref[0] = acc_dk[...].astype(dk_ref.dtype)
        dv_ref[0] = acc_dv[...].astype(dv_ref.dtype)


def _flash_mha_bwd_impl(q, k, v, g, scale: float, block_q: int):
    B, T, H, D = q.shape
    Tk = k.shape[1]
    bq = min(block_q, _round_up(T, 128))
    Tq_pad = _round_up(T, bq)
    Tk_pad = _round_up(Tk, 128)

    def to_bh(x, t_pad):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        if x.shape[1] != t_pad:
            x = jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))
        return x

    qb, gb = to_bh(q, Tq_pad), to_bh(g, Tq_pad)
    kb, vb = to_bh(k, Tk_pad), to_bh(v, Tk_pad)
    n_q = Tq_pad // bq

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, seq_len=Tk),
        grid=(B * H, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, Tk_pad, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, Tk_pad, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tq_pad, D), q.dtype),
    )(qb, kb, vb, gb)

    from jax.experimental.pallas import tpu as pltpu

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, seq_len=Tk),
        grid=(B * H, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, Tk_pad, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, Tk_pad, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, Tk_pad, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, Tk_pad, D), lambda i, j: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Tk_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Tk_pad, D), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((Tk_pad, D), jnp.float32),
            pltpu.VMEM((Tk_pad, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qb, kb, vb, gb)

    def from_bh(x, t_real):
        x = x[:, :t_real].reshape(B, H, t_real, D)
        return jnp.swapaxes(x, 1, 2)

    return from_bh(dq, T), from_bh(dk, Tk), from_bh(dv, Tk)


def _fwd(q, k, v, scale, block_q):
    return flash_mha(q, k, v, scale, block_q), (q, k, v)


def _bwd(scale, block_q, residuals, g):
    q, k, v = residuals
    if jax.default_backend() != "tpu":
        _, vjp = jax.vjp(lambda q, k, v: _reference_mha(q, k, v, scale), q, k, v)
        return vjp(g)
    return _flash_mha_bwd_impl(q, k, v, g, scale, block_q)


flash_mha.defvjp(_fwd, _bwd)
