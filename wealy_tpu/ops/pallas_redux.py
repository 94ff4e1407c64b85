"""Fused chunk-set ``bpwr`` reduction (Pallas) — the retrieval scoring kernel.

``distance_tensor_redux(redux="bpwr")`` (ops/redux.py; reference
lib/tensor_ops.py:306-335) is the song-pair scorer of the reference's test
protocol: an n-round greedy best-pairs-without-replacement knockout over each
(s1, s2) segment-distance matrix. As plain XLA the loop is HBM-bound: the
(Q, B, s1, s2) block tensor is re-read (and its knockout mask re-written)
every round — n≈s1 full round-trips of a ~64 MB tensor per block pair, which
BENCH_NOTES measured as the ceiling of corpus-scale chunk-set evaluate once
the dispatch structure was fixed (the resident fast path).

This kernel runs the whole knockout in VMEM, touching HBM once:

  - Layout: the block tensor is transposed to ``(Q, s1, s2, B)`` so the PAIR
    axis is the TPU lane dimension. Every op in the loop (masked min over
    rows/columns/both, tie-select, knockout OR) is then an (s1, s2)-tile op
    vectorized across ``block_p`` pairs per lane — no 18x18 matrices starving
    the 8x128 VPU, no HBM traffic after the single block load.
  - Masking: chunk-validity exclusions are baked in as a fill value ABOVE the
    redux ``inf`` (1e12) before the kernel, so the kernel reconstructs the
    initial knockout mask as ``d > inf`` — bitwise the same initial state as
    ``_bpwr``'s explicit mask (excluded entries are filled to ``inf`` by
    ``mmin`` either way, and a fully-excluded pair reduces to 0/eps = 0).
  - The selected-pair mean is ``sum(d[selected]) / max(count, eps)`` —
    ``mmean`` semantics. Values match the XLA path to f32 reduction-order
    tolerance (~1e-6); within one evaluate run every block goes through the
    SAME function, so gather/count tie comparisons stay exactly consistent
    (the invariant streaming_relevant_ranks relies on).

``bpwr_block_redux`` is a drop-in for the bpwr branch of
``distance_tensor_redux`` over a (Q, B, s1, s2) block: it falls back to the
XLA path off-TPU (tests run the kernel in interpret mode) or when the
(s1, s2, 128) working set would not fit VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INF = 1e12  # distance_tensor_redux's mask fill (ops/redux.py `inf`)
_BAKE = 1e13  # exclusion fill; > _INF so the kernel recovers the mask
_EPS = 1e-7
# Live working set per grid cell, budgeted against ~16 MB VMEM with headroom
# for Mosaic's own scratch: the double-buffered f32 input tile (2x) plus the
# f32 knockout-state carry `dm` (1x) — ~3 tiles of s1*s2*bp*4 bytes.
_VMEM_WORKING_SET_BUDGET = 6 * 1024 * 1024
_TILES_LIVE = 3  # 2x double-buffered input + 1x dm carry


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _block_p(s1: int, s2: int) -> int:
    """Pairs per grid cell: largest multiple of 128 whose ~3x-live f32
    working set stays within the VMEM budget, capped at 512. 0 = does not
    fit (fall back)."""
    per_pair = _TILES_LIVE * s1 * s2 * 4
    bp = (_VMEM_WORKING_SET_BUDGET // per_pair) // 128 * 128
    return min(512, bp)


def _bpwr_kernel(d_ref, o_ref, *, n: int, eps: float, inf: float):
    """One (query row, pair block) grid cell: n knockout rounds in VMEM.

    ``d_ref`` is (1, s1, s2, bp): the s1 x s2 segment-distance matrices of
    ``bp`` (query, candidate) pairs, pairs in lanes. Mirrors ops/redux.py
    ``_bpwr`` round for round: global masked min -> select ties -> knock out
    every row/column whose masked min reaches the global min.

    The knockout state is carried as the MASKED DISTANCE array ``dm``
    (knocked-out entries pinned at ``inf``) rather than a boolean mask:
    Mosaic scalarizes wide i1 loop carries into hundreds of mask vregs and
    falls over (observed lowering crash); f32 carries lower cleanly. Since an
    entry's row is knocked out the round it is selected, every entry is
    selected at most once, so the selected-pair mean can be accumulated
    per round (sum of disjoint contributions == one final masked sum, up to
    f32 ordering).
    """
    d = d_ref[0]  # (s1, s2, bp)
    # baked exclusions sit ABOVE inf -> pinning to inf reproduces _bpwr's
    # initial `mask = dist > inf` state; valid cosine distances are <= 2
    dm0 = jnp.minimum(d, inf)
    zero = jnp.zeros((1, 1, d.shape[-1]), jnp.float32)

    def body(_, carry):
        dm, num, den = carry
        rowmin = jnp.min(dm, axis=1, keepdims=True)  # (s1, 1, bp)
        colmin = jnp.min(dm, axis=0, keepdims=True)  # (1, s2, bp)
        mn = jnp.min(rowmin, axis=0, keepdims=True)  # (1, 1, bp)
        sel = (d <= mn) & (dm < inf)
        num = num + jnp.sum(jnp.where(sel, d, 0.0), axis=(0, 1), keepdims=True)
        den = den + jnp.sum(sel.astype(jnp.float32), axis=(0, 1), keepdims=True)
        dm = jnp.where((rowmin <= mn) | (colmin <= mn), inf, dm)
        return dm, num, den

    _, num, den = jax.lax.fori_loop(0, n, body, (dm0, zero, zero))
    o_ref[...] = (num / jnp.maximum(den, eps)).reshape(1, 1, d.shape[-1])


def _bpwr_redux_impl(d, n: int, *, eps: float, inf: float, interpret: bool):
    """(Q, B, s1, s2) f32 with exclusions baked as ``_BAKE`` -> (Q, B)."""
    Q, B, s1, s2 = d.shape
    bp = _block_p(s1, s2)
    dp = jnp.transpose(d, (0, 2, 3, 1))  # (Q, s1, s2, B): pairs -> lanes
    Bp = _round_up(B, bp)
    if Bp != B:
        # pad pairs with the bake fill: fully-masked -> 0, sliced off below
        dp = jnp.pad(dp, ((0, 0), (0, 0), (0, 0), (0, Bp - B)),
                     constant_values=_BAKE)
    out = pl.pallas_call(
        functools.partial(_bpwr_kernel, n=n, eps=eps, inf=inf),
        grid=(Q, Bp // bp),
        in_specs=[pl.BlockSpec((1, s1, s2, bp), lambda i, j: (i, 0, 0, j))],
        # 3-D output: Mosaic requires the block's second-to-last dim to be
        # 8-divisible OR span the array — a (Q, 1, Bp) layout satisfies it
        # with a degenerate middle axis
        out_specs=pl.BlockSpec((1, 1, bp), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((Q, 1, Bp), jnp.float32),
        interpret=interpret,
    )(dp)
    return out[:, 0, :B]


def bpwr_block_redux(
    d,
    qvalid,
    cvalid,
    redux: str = "bpwr",
    *,
    eps: float = _EPS,
    inf: float = _INF,
    interpret: bool = False,
):
    """Fused ``distance_tensor_redux(redux="bpwr[-n]")`` over a block.

    Args:
      d: (Q, B, s1, s2) segment distances (the ``_block_dist`` layout of
        parallel/similarity.py).
      qvalid: (Q, s1) bool, True = valid query chunk.
      cvalid: (B, s2) bool, True = valid candidate chunk.
      redux: "bpwr" or "bpwr-n".

    Returns (Q, B) f32 song-pair distances. Falls back to the XLA
    ``distance_tensor_redux`` off-TPU (unless ``interpret``) or when the
    per-pair tile exceeds the VMEM budget — callers can use it
    unconditionally for bpwr modes.
    """
    assert redux.split("-")[0] == "bpwr", redux
    Q, B, s1, s2 = d.shape
    n_req = s1 if "-" not in redux else int(redux.split("-")[-1])
    usable = (interpret or jax.default_backend() == "tpu") and _block_p(
        min(s1, s2), max(s1, s2)
    ) > 0
    if not usable:
        from wealy_tpu.ops.redux import distance_tensor_redux

        excl = (~qvalid)[:, None, :, None] | (~cvalid)[None, :, None, :]
        return distance_tensor_redux(
            d, redux, mask=jnp.broadcast_to(excl, d.shape), eps=eps, inf=inf
        )

    d = d.astype(jnp.float32)
    d = jnp.where((~qvalid)[:, None, :, None], _BAKE, d)
    d = jnp.where((~cvalid)[None, :, None, :], _BAKE, d)
    if s2 < s1:  # _bpwr transposes so s1 <= s2 (reference :308-311)
        d = jnp.swapaxes(d, 2, 3)
        s1, s2 = s2, s1
    n = max(1, min(n_req, s1))
    return _bpwr_redux_impl(d, n, eps=eps, inf=inf, interpret=interpret)
