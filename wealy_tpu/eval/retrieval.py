"""Retrieval metrics and chunk->song scoring.

The reference implies (but does not ship) the evaluation path: overlapping
chunks -> per-chunk embeddings -> regroup per song via chunk_info ->
``pairwise_distance_matrix`` + ``distance_tensor_redux`` -> MAP / MR1
(SURVEY.md §3.4). This module owns it end-to-end:

- :func:`regroup_chunks`: flat chunk batch -> (n_songs, max_chunks, C) + mask
- :func:`song_distance_matrix`: chunk-set pairwise distances reduced to song
  pairs with any redux mode (wealy_tpu.ops.redux)
- :func:`rank_metrics`: MAP / MR1 / P@k, self-match excluded by version idx

Cover-song metric conventions (SHS100K / Da-TACOS literature): for each query,
candidates are ranked by ascending distance with the query itself excluded;
relevant = same clique; MAP = mean average precision; MR1 = mean rank of the
first relevant item (1-based).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from wealy_tpu.ops.distance import pairwise_distance_matrix
from wealy_tpu.ops.redux import distance_tensor_redux


def average_precision(rel_sorted: np.ndarray) -> float:
    """AP of one query given relevance flags in rank order (self excluded)."""
    rel_sorted = np.asarray(rel_sorted, dtype=bool)
    n_rel = rel_sorted.sum()
    if n_rel == 0:
        return 0.0
    ranks = np.flatnonzero(rel_sorted) + 1  # 1-based ranks of relevant items
    precision_at = np.arange(1, n_rel + 1) / ranks
    return float(precision_at.mean())


def rank_metrics(
    dist: np.ndarray,
    query_labels: np.ndarray,
    cand_labels: np.ndarray,
    query_idx: Optional[np.ndarray] = None,
    cand_idx: Optional[np.ndarray] = None,
    topk: Tuple[int, ...] = (10,),
) -> Dict[str, float]:
    """MAP / MR1 / P@k from a (Q, N) distance matrix (smaller = closer).

    Self-matches (same idx) are excluded from the ranking. Queries with no
    relevant candidates are skipped (standard SHS evaluation).
    """
    dist = np.asarray(dist)
    Q, N = dist.shape
    query_labels = np.asarray(query_labels)
    cand_labels = np.asarray(cand_labels)
    if query_idx is None:
        query_idx = np.arange(Q)
    if cand_idx is None:
        cand_idx = np.arange(N)

    aps, first_ranks, pk = [], [], {k: [] for k in topk}
    for q in range(Q):
        keep = cand_idx != query_idx[q]
        order = np.argsort(dist[q][keep], kind="stable")
        rel = (cand_labels[keep] == query_labels[q])[order]
        if not rel.any():
            continue
        aps.append(average_precision(rel))
        first_ranks.append(int(np.flatnonzero(rel)[0]) + 1)
        for k in topk:
            pk[k].append(float(rel[:k].sum()) / k)

    out = {
        "MAP": float(np.mean(aps)) if aps else 0.0,
        "MR1": float(np.mean(first_ranks)) if first_ranks else 0.0,
        "n_queries": len(aps),
    }
    for k in topk:
        out[f"P@{k}"] = float(np.mean(pk[k])) if pk[k] else 0.0
    return out


def slabbed_apply(
    apply_fn,
    *arrays: np.ndarray,
    slab_size: int = 256,
) -> np.ndarray:
    """Run ``apply_fn(*slabs) -> z_slab`` over flat batches (all sharing a
    leading dim) in fixed-size slabs (final slab zero-padded), so the encoder
    jit compiles ONCE for the slab shape and host memory never holds more
    than one slab's activations. This is the corpus-scale evaluate path: the
    reference eval (SURVEY.md §3.4) would push the whole overlapping-chunk
    tensor through the model at once, which only works for toy corpora.
    """
    import jax.numpy as jnp

    n = arrays[0].shape[0]
    slab_size = min(slab_size, max(n, 1))
    outs = []
    for s in range(0, n, slab_size):
        slabs = [a[s : s + slab_size] for a in arrays]
        pad = slab_size - slabs[0].shape[0]
        if pad:
            slabs = [
                np.concatenate([a, np.zeros((pad, *a.shape[1:]), a.dtype)])
                for a in slabs
            ]
        z = np.asarray(apply_fn(*(jnp.asarray(a) for a in slabs)))
        outs.append(z[: slab_size - pad] if pad else z)
    if not outs:
        return np.zeros((0, 0), np.float32)
    return np.concatenate(outs, axis=0)


def regroup_chunks(
    chunk_embeddings: np.ndarray,
    chunk_info: np.ndarray,
    chunk_valid: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Flat per-chunk embeddings -> per-song chunk sets.

    chunk_info rows are (batch_idx, version_idx, chunk_idx)
    (lib/embedding_dataset/collate_functions.py:357-374). Songs are keyed by
    (batch_idx, version_idx) in first-appearance order.

    Returns (song_sets (S, max_chunks, C), set_mask (S, max_chunks) True=valid,
    song_batch_idx (S,), song_version_idx (S,)).
    """
    chunk_embeddings = np.asarray(chunk_embeddings)
    chunk_info = np.asarray(chunk_info)
    if chunk_valid is not None:
        keep = np.asarray(chunk_valid, bool)
        chunk_embeddings = chunk_embeddings[keep]
        chunk_info = chunk_info[keep]

    songs: dict[tuple, list[int]] = {}
    for row, (b, v, _k) in enumerate(chunk_info):
        songs.setdefault((int(b), int(v)), []).append(row)
    keys = list(songs.keys())
    S = len(keys)
    max_chunks = max(len(rows) for rows in songs.values())
    C = chunk_embeddings.shape[-1]

    sets = np.zeros((S, max_chunks, C), chunk_embeddings.dtype)
    mask = np.zeros((S, max_chunks), bool)
    for s, key in enumerate(keys):
        rows = songs[key]
        sets[s, : len(rows)] = chunk_embeddings[rows]
        mask[s, : len(rows)] = True
    batch_idx = np.array([k[0] for k in keys])
    version_idx = np.array([k[1] for k in keys])
    return sets, mask, batch_idx, version_idx


def song_distance_matrix_jnp(
    query_sets,
    query_mask,
    cand_sets,
    cand_mask,
    mode: str = "cos",
    redux: str = "bpwr",
    key=None,
    fused: bool = True,
):
    """jnp-pure core of :func:`song_distance_matrix` — safe to call under
    jit / lax.map (the serving engine's device-resident scorer does).

    For bpwr reduxes the fused Pallas VMEM knockout is used by default.
    This assumes single-device jit, shard_map, vmap, or lax.map callers
    (all verified on-chip); a pallas_call is NOT partitionable under
    GSPMD ``in_shardings`` — a caller jitting this with sharded inputs
    must pass ``fused=False`` (mirrors ``streaming_relevant_ranks``'s
    ``fused_redux`` escape hatch)."""
    Q, s1, C = query_sets.shape
    N, s2, _ = cand_sets.shape
    qs = jnp.asarray(query_sets).reshape(Q * s1, C)
    cs = jnp.asarray(cand_sets).reshape(N * s2, C)
    d = pairwise_distance_matrix(qs, cs, mode=mode)  # (Q*s1, N*s2)
    d = d.reshape(Q, s1, N, s2).transpose(0, 2, 1, 3)  # (Q, N, s1, s2)
    if redux.split("-")[0] == "bpwr" and key is None and fused:
        # fused VMEM knockout on TPU (XLA identity off-TPU / oversize tiles):
        # the n-round bpwr loop otherwise re-reads the (Q, N, s1, s2) tensor
        # from HBM every round — see ops/pallas_redux.py
        from wealy_tpu.ops.pallas_redux import bpwr_block_redux

        return bpwr_block_redux(
            d, jnp.asarray(query_mask), jnp.asarray(cand_mask), redux
        )
    # exclusion mask (ops convention True=excluded): invalid query or cand chunk
    qm = ~jnp.asarray(query_mask)[:, None, :, None]  # (Q, 1, s1, 1)
    cm = ~jnp.asarray(cand_mask)[None, :, None, :]  # (1, N, 1, s2)
    excl = jnp.broadcast_to(qm | cm, d.shape)
    return distance_tensor_redux(d, redux, mask=excl, key=key)


def song_distance_matrix(
    query_sets: np.ndarray,
    query_mask: np.ndarray,
    cand_sets: np.ndarray,
    cand_mask: np.ndarray,
    mode: str = "cos",
    redux: str = "bpwr",
    key=None,
) -> np.ndarray:
    """(Q, s1, C) x (N, s2, C) chunk sets -> (Q, N) song distances.

    Chunk-pair distances are one flattened MXU matmul
    (pairwise_distance_matrix on (Q*s1, C) x (N*s2, C)); the (Q, N, s1, s2)
    tensor is then reduced with ``distance_tensor_redux`` under a mask marking
    invalid (padding) chunk pairs as excluded.
    """
    return np.asarray(
        song_distance_matrix_jnp(
            query_sets, query_mask, cand_sets, cand_mask,
            mode=mode, redux=redux, key=key,
        )
    )


def evaluate_retrieval(
    song_sets: np.ndarray,
    set_mask: np.ndarray,
    labels: np.ndarray,
    version_ids: Optional[np.ndarray] = None,
    mode: str = "cos",
    redux: str = "bpwr",
    topk: Tuple[int, ...] = (10,),
) -> Dict[str, float]:
    """All-pairs song retrieval within one corpus: every song queries all
    others. Returns rank_metrics plus the (S, S) distance matrix under key
    ``_dist`` for inspection."""
    d = song_distance_matrix(song_sets, set_mask, song_sets, set_mask, mode=mode, redux=redux)
    metrics = rank_metrics(
        d, labels, labels, query_idx=version_ids, cand_idx=version_ids, topk=topk
    )
    metrics["_dist"] = d
    return metrics
