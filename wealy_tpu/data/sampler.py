"""Clique-positive sampling: the training-batch construction policy.

Parity: lib/embedding_dataset/base_dataset.py:178-296 —
  - split-local clique -> int labels with cross-split offsets (val labels
    start after train's count, test after val's; :178-189)
  - per anchor: ``n_per_class - 1`` positives from the same clique, sampled
    without replacement when possible, with optional ``p_samesong``
    self-repeats and ``augment`` shuffling (:262-296)
  - deterministic per-version ids (MD5) as z_idx

This is a host-side iterator producing ``Item`` tuples for the chunking
collates; pair it with a prefetching loop feeding jax.device_put.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

from wealy_tpu.data.chunking import Item
from wealy_tpu.data.metadata import Metadata, SPLITS


def split_clique_labels(md: Metadata) -> Dict[str, Dict[str, int]]:
    """split -> clique_id -> int label, with cross-split offsets
    (base_dataset.py:178-189)."""
    out: Dict[str, Dict[str, int]] = {}
    offset = 0
    for split in SPLITS:
        cliques = list(md.splits[split].keys())
        out[split] = {c: offset + i for i, c in enumerate(cliques)}
        offset += len(cliques)
    return out


class CliqueSampler:
    """Iterates versions of one split, emitting (label, [(id, emb), ...]) items.

    ``load_fn(version_key) -> (T, C) array or None`` supplies embeddings
    (typically EmbeddingStore.load + key pick); ``id_fn(version_key) -> int``
    supplies z_idx values (typically the deterministic MD5 id from info).
    """

    def __init__(
        self,
        md: Metadata,
        split: str,
        load_fn: Callable[[str], Optional[np.ndarray]],
        n_per_class: int = 2,
        p_samesong: float = 0.0,
        augment: bool = False,
        seed: int = 0,
        id_fn: Optional[Callable[[str], int]] = None,
    ):
        assert split in SPLITS
        self.md = md
        self.split = split
        self.load_fn = load_fn
        self.n_per_class = n_per_class
        self.p_samesong = p_samesong
        self.augment = augment
        self.seed = int(seed)
        self.rng = np.random.default_rng(seed)
        self.labels = split_clique_labels(md)[split]
        self.id_fn = id_fn or (lambda v: int(md.info[v]["id"]))

        self.clique_of: Dict[str, str] = {}
        self.versions: List[str] = []
        for clique_id, versions in md.splits[split].items():
            for v in versions:
                self.versions.append(v)
                self.clique_of[v] = clique_id

    def __len__(self) -> int:
        return len(self.versions)

    def sample_item(self, index: int) -> Item:
        """Anchor = versions[index]; positives sampled from its clique."""
        anchor = self.versions[index]
        clique_id = self.clique_of[anchor]
        label = self.labels[clique_id]
        pool = [v for v in self.md.splits[self.split][clique_id] if v != anchor]

        chosen = [anchor]
        need = self.n_per_class - 1
        for _ in range(need):
            if not pool or (
                self.p_samesong > 0 and self.rng.random() < self.p_samesong
            ):
                chosen.append(anchor)  # self-repeat (p_samesong semantics)
            else:
                pick = int(self.rng.integers(0, len(pool)))
                chosen.append(pool.pop(pick))
        if self.augment:
            self.rng.shuffle(chosen)

        return (
            label,
            [(self.id_fn(v), self.load_fn(v)) for v in chosen],
        )

    def epoch(self, shuffle: bool = True, batch_size: int = 16) -> Iterator[List[Item]]:
        """Yield lists of items (one per anchor) of size ``batch_size``;
        incomplete trailing batches are dropped (train drop_last semantics,
        lib/audio_dataset/dataloader.py:231-234)."""
        order = np.arange(len(self.versions))
        if shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            yield [self.sample_item(int(i)) for i in order[start : start + batch_size]]

    def n_batches(self, batch_size: int) -> int:
        return len(self.versions) // batch_size

    def epoch_batches(
        self, epoch: int, batch_size: int, start_batch: int = 0
    ) -> Iterator[tuple]:
        """Seekable deterministic epoch stream: batch ``b`` of epoch ``e`` is
        a pure function of ``(seed, e, b)`` — the epoch order derives from
        ``default_rng([seed, e])`` and every batch's positive/chunk draws
        from ``default_rng([seed, e, b])``. Exact checkpoint resume therefore
        needs only ``(epoch, next_batch)`` — no RNG-state persistence, no
        replay (the stateless-randomness analog of ``jax.random.fold_in``).

        Yields ``(batch_index, batch_rng, items)``; ``batch_rng`` has the
        remaining stream for the collate's chunk draws. Trailing incomplete
        batches are dropped (train drop_last semantics)."""
        order = np.arange(len(self.versions))
        np.random.default_rng([self.seed, epoch]).shuffle(order)
        for b in range(start_batch, len(order) // batch_size):
            rng = np.random.default_rng([self.seed, epoch, b])
            keep = self.rng
            self.rng = rng  # sample_item draws come from the batch stream
            try:
                items = [
                    self.sample_item(int(i))
                    for i in order[b * batch_size : (b + 1) * batch_size]
                ]
            finally:
                self.rng = keep
            yield b, rng, items
