"""Sharded all-pairs similarity — the corpus-scale retrieval compute.

The reference computes a monolithic (N, N) matrix on one device
(lib/tensor_ops.py:152-176 + the implied eval, SURVEY.md §3.4). Here the
query rows are sharded over the mesh's ``data`` axis: each chip holds a row
slab, candidates are replicated (or streamed in column blocks for very large
corpora), and each chip computes ``q_slab @ cᵀ`` on its MXU — the only
all-to-all pattern the capability set needs (SURVEY.md §2.8 item 4).

``sharded_topk`` never materializes the full matrix on one device: each chip
reduces its row slab to (k) candidates locally; ranks/metrics are computed on
the host from the k-sized result.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from wealy_tpu.ops.distance import pairwise_distance_matrix
from wealy_tpu.parallel.mesh import data_sharding, replicated


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


def streaming_relevant_ranks(
    queries,
    corpus,
    query_labels,
    corpus_labels,
    mesh: Optional[Mesh] = None,
    mode: str = "cossim",
    block_size: int = 4096,
    query_idx=None,
    corpus_idx=None,
    max_relevant: int = 64,
):
    """Ranks of every relevant candidate per query WITHOUT materializing the
    (Q, N) matrix — the corpus-scale MAP/MR1 path (SURVEY.md §7: "distributed
    top-k/rank computation without materializing the full matrix").

    Two streamed passes over corpus column blocks:
      1. gather each query's relevant-candidate scores (padded to
         ``max_relevant`` slots);
      2. for each block, count candidates scoring strictly better than each
         relevant score (ties broken toward better rank, matching a stable
         ascending-distance sort).

    Returns (ranks (Q, max_relevant) int32 — 1-based, 0 = empty slot,
    n_relevant (Q,)). Feed to :func:`map_from_ranks`.
    """
    import numpy as np

    queries = jnp.asarray(queries)
    corpus = jnp.asarray(corpus)
    query_labels = np.asarray(query_labels)
    corpus_labels = np.asarray(corpus_labels)
    Q = queries.shape[0]
    N = corpus.shape[0]
    if query_idx is None:
        query_idx = np.arange(Q)
    if corpus_idx is None:
        corpus_idx = np.arange(N)
    sim_mode = mode.endswith("sim")  # larger = better

    # pass 1 (host): relevant slots per query
    rel_cols = np.full((Q, max_relevant), -1, np.int64)
    n_rel = np.zeros((Q,), np.int32)
    for q in range(Q):
        cols = np.flatnonzero(
            (corpus_labels == query_labels[q]) & (corpus_idx != query_idx[q])
        )[:max_relevant]
        rel_cols[q, : len(cols)] = cols
        n_rel[q] = len(cols)

    # pass 1 (device): scores of the relevant pairs, one block at a time
    def block_scores(block):
        return pairwise_distance_matrix(queries, block, mode=mode)

    rel_scores = np.zeros((Q, max_relevant), np.float64)
    better = np.zeros((Q, max_relevant), np.int64)

    blocks = [
        (start, np.asarray(block_scores(corpus[start : start + block_size])))
        for start in range(0, N, block_size)
    ]
    for start, d in blocks:
        end = start + d.shape[1]
        in_range = (rel_cols >= start) & (rel_cols < end)
        qi, si = np.nonzero(in_range)
        rel_scores[qi, si] = d[qi, rel_cols[qi, si] - start]

    # pass 2: count strictly-better candidates (self excluded)
    for start, d in blocks:
        end = start + d.shape[1]
        valid = (corpus_idx[start:end][None, :] != query_idx[:, None])  # (Q, b)
        for s in range(max_relevant):
            active = rel_cols[:, s] >= 0
            if not active.any():
                break
            ref = rel_scores[:, s][:, None]
            if sim_mode:
                b = (d > ref) & valid
            else:
                b = (d < ref) & valid
            better[:, s] += np.where(active, b.sum(axis=1), 0)

    ranks = np.where(rel_cols >= 0, better + 1, 0).astype(np.int32)
    return ranks, n_rel


def map_from_ranks(ranks, n_rel):
    """MAP / MR1 from per-query relevant-candidate ranks (1-based, 0=empty).

    Matches rank_metrics' definitions: AP over relevant items in rank order;
    MR1 = rank of the best relevant item; queries without relevants skipped.
    """
    import numpy as np

    ranks = np.asarray(ranks)
    n_rel = np.asarray(n_rel)
    aps, mr1 = [], []
    for q in range(ranks.shape[0]):
        r = np.sort(ranks[q, : n_rel[q]])
        if len(r) == 0:
            continue
        # i-th relevant (1-based among relevants) at overall rank r[i]; among
        # non-self candidates its precision contribution is (i+1)/r[i] —
        # but r counts only strictly-better items + 1, so co-relevant items
        # ranked ahead must be added: rank among all = r[i] + (# relevants
        # with strictly better score) which the sort already reflects via
        # counting; adjust by position to break rel-rel ties consistently.
        adj = np.maximum(r, np.arange(1, len(r) + 1))
        aps.append(float(np.mean(np.arange(1, len(r) + 1) / adj)))
        mr1.append(int(r[0]))
    return {
        "MAP": float(np.mean(aps)) if aps else 0.0,
        "MR1": float(np.mean(mr1)) if mr1 else 0.0,
        "n_queries": len(aps),
    }


def sharded_topk(
    x,
    y,
    mesh: Mesh,
    k: int,
    mode: str = "cossim",
    largest: Optional[bool] = None,
):
    """Top-k candidate indices+scores per query without materializing (Q, N)
    on any single host array.

    For similarity modes (``cossim``/``dotsim``) top-k means largest; for
    distance modes smallest. Returns (values (Q, k), indices (Q, k)).
    """
    if largest is None:
        largest = mode.endswith("sim")
    n_dev = mesh.shape["data"]
    xp, q_real = _pad_rows(jnp.asarray(x), n_dev)

    @functools.partial(
        jax.jit,
        in_shardings=(data_sharding(mesh, 2), replicated(mesh)),
        out_shardings=(data_sharding(mesh, 2), data_sharding(mesh, 2)),
    )
    def _topk(xs, ys):
        d = pairwise_distance_matrix(xs, ys, mode=mode)
        vals, idx = jax.lax.top_k(d if largest else -d, k)
        return (vals if largest else -vals), idx

    vals, idx = _topk(xp, jnp.asarray(y))
    return vals[:q_real], idx[:q_real]
