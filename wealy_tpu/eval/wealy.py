"""WEALY-specific evaluation: song-level retrieval over per-song chunk sets
and fused multimodal embeddings.

Covers the test-mode contracts of the reference collates:
- WEALY test mode emits per-song dicts with ALL (n_chunks, 512) chunk
  embeddings (collate_functions.py:54-88) -> scored with
  pairwise chunk distances + distance_tensor_redux;
- fusion models emit one z per song -> plain cosine ranking.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from wealy_tpu.eval.retrieval import rank_metrics, song_distance_matrix
from wealy_tpu.ops.distance import pairwise_distance_matrix


def wealy_song_sets(songs: Sequence[dict]):
    """Per-song dicts (wealy_test_mode_items output) -> padded chunk sets.

    Returns (sets (S, max_chunks, C), mask (S, max_chunks) True=valid,
    labels (S,), version_ids (S,)).
    """
    chunks = [np.atleast_2d(np.asarray(s["wealy_all_chunks"], np.float32)) for s in songs]
    S = len(chunks)
    max_chunks = max(c.shape[0] for c in chunks)
    C = chunks[0].shape[-1]
    sets = np.zeros((S, max_chunks, C), np.float32)
    mask = np.zeros((S, max_chunks), bool)
    for i, c in enumerate(chunks):
        sets[i, : c.shape[0]] = c
        mask[i, : c.shape[0]] = True
    labels = np.array([s["clique_id"] for s in songs])
    ids = np.array([s["version_id"] for s in songs])
    return sets, mask, labels, ids


def evaluate_wealy_songs(
    songs: Sequence[dict],
    mode: str = "cos",
    redux: str = "bpwr",
    topk=(10,),
) -> Dict[str, float]:
    """All-pairs MAP/MR1 over WEALY chunk sets (chunk-set scoring via
    distance_tensor_redux — the implied reference evaluate())."""
    sets, mask, labels, ids = wealy_song_sets(songs)
    d = song_distance_matrix(sets, mask, sets, mask, mode=mode, redux=redux)
    return rank_metrics(d, labels, labels, query_idx=ids, cand_idx=ids, topk=topk)


def evaluate_song_embeddings(
    z: np.ndarray,
    labels: np.ndarray,
    version_ids: Optional[np.ndarray] = None,
    mode: str = "cos",
    topk=(10,),
) -> Dict[str, float]:
    """All-pairs MAP/MR1 over one embedding per song (fusion-model eval)."""
    d = np.asarray(pairwise_distance_matrix(np.asarray(z), np.asarray(z), mode=mode))
    return rank_metrics(d, labels, labels, query_idx=version_ids, cand_idx=version_ids, topk=topk)
