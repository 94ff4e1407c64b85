"""Chunking policies and batching collates with **static output shapes**.

Parity surface: lib/embedding_dataset/collate_functions.py —
  - train: random chunk_size-frame window; val: first window; test:
    overlapping windows (stride = chunk_size*(1-overlap)) regrouped per song
    via chunk_info (:91-374)
  - SBERT (seq=1) and CLEWS (fixed 16x2048) shape overrides
  - avg-pooling mode collapsing time entirely (:131-172)
  - WEALY chunk axis: train random / val first / test all chunks (:9-51)

TPU-first difference: the test-time overlapping collate pads the *chunk count*
to a bucket (multiple of ``chunk_bucket``) with an explicit chunk-valid mask,
so the jitted encoder sees a bounded set of shapes instead of recompiling per
batch (SURVEY.md §7 "variable-length everything vs XLA static shapes").

Batch layout: instead of the reference's flat interleaved list
``[icl, id_1, emb_1, mask_1, id_2, ...]``, collates return a dict of arrays
with a leading (B, n_per_class) structure plus ``flatten_versions`` to get the
(B*n, ...) layout the losses consume.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

Item = Tuple[int, List[Tuple[int, Optional[np.ndarray]]]]
# one item = (clique_label, [(version_id, embedding (T, C) or None), ...])


def select_wealy_chunk(
    wealy: np.ndarray, mode: str, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """WEALY chunk selection (collate_functions.py:9-51): (n_chunks, 512) ->
    train 'random' one chunk (512,), val 'deterministic' first chunk,
    test 'all' all chunks."""
    wealy = np.asarray(wealy)
    if wealy.ndim == 1:
        wealy = wealy[None]
    if mode == "random":
        if wealy.shape[0] == 1:
            return wealy[0]
        assert rng is not None, "mode='random' needs an rng"
        return wealy[int(rng.integers(0, wealy.shape[0]))]
    if mode == "deterministic":
        return wealy[0]
    if mode == "all":
        return wealy
    raise ValueError(f"unknown WEALY chunking mode: {mode!r}")


def chunk_embedding(
    emb: Optional[np.ndarray],
    chunk_size: int,
    mode: str,
    embed_dim: int,
    rng: Optional[np.random.Generator] = None,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """One (T, C) embedding -> ((chunk_size, C), (chunk_size,) True=valid).

    mode 'random' (train) picks a random full window when T > chunk_size;
    mode 'first' (val) takes the prefix. Short sequences are zero-padded with
    a matching mask; None (missing) becomes all-zero / all-invalid.
    ``dtype`` sets the output allocation (default keeps the legacy f32);
    pass the source dtype (fp16 from a packed store) to window without a
    host-side upcast — assignment casts exactly when they differ.
    """
    out = np.zeros((chunk_size, embed_dim), dtype)
    mask = np.zeros((chunk_size,), bool)
    if emb is None:
        return out, mask
    emb = np.asarray(emb)
    T = emb.shape[0]
    if T <= chunk_size:
        out[:T] = emb
        mask[:T] = True
    elif mode == "random":
        assert rng is not None, "mode='random' needs an rng"
        start = int(rng.integers(0, T - chunk_size + 1))
        out[:] = emb[start : start + chunk_size]
        mask[:] = True
    else:  # first
        out[:] = emb[:chunk_size]
        mask[:] = True
    return out, mask


@dataclasses.dataclass
class Batch:
    """Fixed-shape training/val batch."""

    clique_ids: np.ndarray  # (B,)
    version_ids: np.ndarray  # (B, n_per_class)
    embeddings: np.ndarray  # (B, n_per_class, L, C) or (B, n_per_class, C) for avg
    masks: np.ndarray  # (B, n_per_class, L) or (B, n_per_class)

    def flatten_versions(self):
        """-> (z_label (B*n,), z_idx (B*n,), emb (B*n, ...), mask (B*n, ...)),
        the layout the losses consume (labels repeat per version)."""
        B, n = self.version_ids.shape
        labels = np.repeat(self.clique_ids, n)
        idx = self.version_ids.reshape(-1)
        emb = self.embeddings.reshape(B * n, *self.embeddings.shape[2:])
        mask = self.masks.reshape(B * n, *self.masks.shape[2:])
        return labels, idx, emb, mask


def _fixed_length_for(items: Sequence[Item], chunk_size: int, embedding_type: str) -> Tuple[int, int, np.dtype]:
    """(actual_length, embed_dim, alloc_dtype) with the SBERT/CLEWS
    fixed-shape overrides (collate_functions.py:174-195). alloc_dtype is the
    first embedding's float dtype — collates are dtype-preserving so an fp16
    packed-store pipeline never materializes f32 on host (non-float sources
    allocate f32 as before)."""
    first_emb = None
    for _, versions in items:
        for _, emb in versions:
            if emb is not None:
                first_emb = np.asarray(emb)
                break
        if first_emb is not None:
            break
    if first_emb is None:
        raise ValueError("all embeddings in batch are None")
    embed_dim = first_emb.shape[-1]
    dt = (
        first_emb.dtype
        if np.issubdtype(first_emb.dtype, np.floating)
        else np.dtype(np.float32)
    )
    if first_emb.shape[0] == 1:  # sbert-like
        return 1, embed_dim, dt
    if embedding_type == "clews":  # fixed (16, 2048)
        return first_emb.shape[0], embed_dim, dt
    return chunk_size, embed_dim, dt


def collate_fixed_length(
    items: Sequence[Item],
    chunk_size: int = 1000,
    use_random_chunks: bool = False,
    embedding_type: str = "whisper",
    rng: Optional[np.random.Generator] = None,
) -> Batch:
    """Train/val collate: one fixed window per version (collate_functions.py:174-251)."""
    B = len(items)
    n = len(items[0][1])
    L, C, edt = _fixed_length_for(items, chunk_size, embedding_type)
    mode = "random" if use_random_chunks else "first"

    clique_ids = np.empty((B,), np.int64)
    version_ids = np.zeros((B, n), np.int64)
    embeddings = np.zeros((B, n, L, C), edt)
    masks = np.zeros((B, n, L), bool)
    for i, (label, versions) in enumerate(items):
        clique_ids[i] = label
        for j, (vid, emb) in enumerate(versions):
            version_ids[i, j] = vid
            if emb is not None and np.asarray(emb).shape[0] == 1:
                embeddings[i, j, 0] = np.asarray(emb)[0]
                masks[i, j, 0] = True
            elif embedding_type == "clews" and emb is not None:
                embeddings[i, j, :] = np.asarray(emb)
                masks[i, j, :] = True
            else:
                embeddings[i, j], masks[i, j] = chunk_embedding(
                    emb, L, mode, C, rng, dtype=edt
                )
    return Batch(clique_ids, version_ids, embeddings, masks)


def collate_full_songs(
    items: Sequence[Item], length_bucket: int = 256, max_length: Optional[int] = None
) -> Batch:
    """``fullsongs`` collate (reference base_dataset.py:20-22 flag): no
    chunking — sequences padded to the batch max rounded UP to a multiple of
    ``length_bucket`` (bounded jit-shape set), optionally hard-capped."""
    B = len(items)
    n = len(items[0][1])
    C, longest = None, 1
    for _, versions in items:
        for _, emb in versions:
            if emb is not None:
                e = np.asarray(emb)
                C = e.shape[-1]
                longest = max(longest, e.shape[0])
    assert C is not None, "all embeddings in batch are None"
    L = -(-longest // length_bucket) * length_bucket
    if max_length is not None:
        L = min(L, max_length)

    clique_ids = np.empty((B,), np.int64)
    version_ids = np.zeros((B, n), np.int64)
    embeddings = np.zeros((B, n, L, C), np.float32)
    masks = np.zeros((B, n, L), bool)
    for i, (label, versions) in enumerate(items):
        clique_ids[i] = label
        for j, (vid, emb) in enumerate(versions):
            version_ids[i, j] = vid
            if emb is None:
                continue
            e = np.asarray(emb, np.float32)[:L]
            embeddings[i, j, : e.shape[0]] = e
            masks[i, j, : e.shape[0]] = True
    return Batch(clique_ids, version_ids, embeddings, masks)


def collate_avg_pool(items: Sequence[Item]) -> Batch:
    """Avg-pooling collate: time collapsed to a single vector per version
    (collate_functions.py:131-172). masks: (B, n) True=embedding present."""
    B = len(items)
    n = len(items[0][1])
    C = None
    for _, versions in items:
        for _, emb in versions:
            if emb is not None:
                C = np.asarray(emb).shape[-1]
                break
        if C is not None:
            break
    assert C is not None, "all embeddings in batch are None"

    clique_ids = np.empty((B,), np.int64)
    version_ids = np.zeros((B, n), np.int64)
    embeddings = np.zeros((B, n, C), np.float32)
    masks = np.zeros((B, n), bool)
    for i, (label, versions) in enumerate(items):
        clique_ids[i] = label
        for j, (vid, emb) in enumerate(versions):
            version_ids[i, j] = vid
            if emb is None:
                continue
            emb = np.asarray(emb, np.float32)
            embeddings[i, j] = emb[0] if emb.shape[0] == 1 else emb.mean(axis=0)
            masks[i, j] = True
    return Batch(clique_ids, version_ids, embeddings, masks)


@dataclasses.dataclass
class ChunkedBatch:
    """Test-time overlapping-chunk batch. ``chunk_info`` rows are
    (batch_idx, version_idx, chunk_idx) — the regrouping key for song-level
    scoring (collate_functions.py:357-374). Rows beyond ``n_chunks`` are
    bucket padding (chunk_valid False)."""

    clique_ids: np.ndarray  # (N,)
    version_ids: np.ndarray  # (N,)
    embeddings: np.ndarray  # (N, L, C)
    masks: np.ndarray  # (N, L)
    chunk_info: np.ndarray  # (N, 3) int
    chunk_valid: np.ndarray  # (N,) bool
    n_chunks: int


def collate_overlapping(
    items: Sequence[Item],
    chunk_size: int = 1000,
    overlap: float = 0.9,
    embedding_type: str = "whisper",
    chunk_bucket: int = 64,
) -> ChunkedBatch:
    """Test collate: overlapping windows per song, chunk-count padded to a
    bucket multiple for stable jit shapes."""
    stride = max(1, chunk_size - int(chunk_size * overlap))

    rows = []  # (clique, version, chunk (L,C), mask (L,), i, j, k)
    fixed = None
    for i, (label, versions) in enumerate(items):
        for j, (vid, emb) in enumerate(versions):
            if emb is not None and (
                np.asarray(emb).shape[0] == 1 or embedding_type == "clews"
            ):
                # fixed-shape embeddings: a single chunk, as-is
                emb = np.asarray(emb, np.float32)
                L = emb.shape[0]
                fixed = L if fixed is None else fixed
                rows.append((label, vid, emb, np.ones(L, bool), i, j, 0))
                continue
            if emb is None:
                rows.append(
                    (label, vid, None, None, i, j, 0)
                )
                continue
            emb = np.asarray(emb, np.float32)
            T = emb.shape[0]
            if T <= chunk_size:
                chunk = np.zeros((chunk_size, emb.shape[-1]), np.float32)
                mask = np.zeros((chunk_size,), bool)
                chunk[:T] = emb
                mask[:T] = True
                rows.append((label, vid, chunk, mask, i, j, 0))
            else:
                for k, start in enumerate(range(0, T - chunk_size + 1, stride)):
                    rows.append(
                        (
                            label,
                            vid,
                            emb[start : start + chunk_size],
                            np.ones(chunk_size, bool),
                            i,
                            j,
                            k,
                        )
                    )

    L = fixed if fixed is not None else chunk_size
    C = None
    for r in rows:
        if r[2] is not None:
            C = r[2].shape[-1]
            break
    assert C is not None, "all embeddings in batch are None"

    n_real = len(rows)
    N = -(-n_real // chunk_bucket) * chunk_bucket
    clique_ids = np.zeros((N,), np.int64)
    version_ids = np.zeros((N,), np.int64)
    embeddings = np.zeros((N, L, C), np.float32)
    masks = np.zeros((N, L), bool)
    chunk_info = np.full((N, 3), -1, np.int64)
    chunk_valid = np.zeros((N,), bool)
    for idx, (label, vid, chunk, mask, i, j, k) in enumerate(rows):
        clique_ids[idx] = label
        version_ids[idx] = vid
        if chunk is not None:
            embeddings[idx, : chunk.shape[0]] = chunk
            masks[idx, : chunk.shape[0]] = mask
        chunk_info[idx] = (i, j, k)
        chunk_valid[idx] = True
    return ChunkedBatch(
        clique_ids, version_ids, embeddings, masks, chunk_info, chunk_valid, n_real
    )
