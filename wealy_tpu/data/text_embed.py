"""Text (lyrics) embedding stage — the hs_sbert taxonomy entry.

The reference consumes precomputed sentence-transformer embeddings
(``hs_sbert.pt``, base_dataset.py:120-121) produced out-of-repo. This module
owns the stage with a pluggable backend:

- :class:`HFTextEmbedder`: any locally-available Hugging Face encoder
  checkpoint (mean-pooled last hidden state, L2-normalized) — the standard
  sentence-transformers recipe, usable when a model directory is provided
  (no network access is attempted).
- :class:`HashedNgramEmbedder`: a deterministic, dependency-free fallback —
  character n-gram feature hashing into a fixed dim, L2-normalized. Not a
  semantic model, but a well-defined, reproducible text representation that
  keeps the SBERT-shaped pipeline runnable end-to-end (store layout, seq=1
  collate path, retrieval machinery) in environments without weights.

Both write store entries shaped (1, dim) — the SBERT-like layout the collates
special-case (collate_functions.py:174-195 "is_sbert_like").
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Optional, Protocol, Sequence

import numpy as np


class TextEmbedder(Protocol):
    dim: int

    def embed(self, texts: Sequence[str]) -> np.ndarray:  # (N, dim)
        ...


class HashedNgramEmbedder:
    """Character n-gram feature hashing -> fixed-dim L2-normalized vectors."""

    def __init__(self, dim: int = 384, n_min: int = 3, n_max: int = 5):
        self.dim = dim
        self.n_min = n_min
        self.n_max = n_max

    def _features(self, text: str) -> Iterable[str]:
        t = " " + " ".join(text.lower().split()) + " "
        for n in range(self.n_min, self.n_max + 1):
            for i in range(max(0, len(t) - n + 1)):
                yield t[i : i + n]

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for row, text in enumerate(texts):
            for feat in self._features(text or ""):
                h = hashlib.blake2b(feat.encode("utf-8"), digest_size=8).digest()
                idx = int.from_bytes(h[:4], "little") % self.dim
                sign = 1.0 if h[4] & 1 else -1.0
                out[row, idx] += sign
            norm = np.linalg.norm(out[row])
            if norm > 0:
                out[row] /= norm
        return out


class HFTextEmbedder:
    """Mean-pooled transformer encoder from a LOCAL checkpoint directory."""

    def __init__(self, model_dir: str, max_length: int = 256, device: str = "cpu"):
        import torch
        from transformers import AutoModel, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_dir, local_files_only=True)
        self.model = AutoModel.from_pretrained(model_dir, local_files_only=True).eval()
        self.max_length = max_length
        self.dim = self.model.config.hidden_size
        self._torch = torch

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        torch = self._torch
        with torch.no_grad():
            enc = self.tokenizer(
                list(texts),
                padding=True,
                truncation=True,
                max_length=self.max_length,
                return_tensors="pt",
            )
            hidden = self.model(**enc).last_hidden_state  # (N, T, D)
            mask = enc["attention_mask"].unsqueeze(-1).float()
            pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
            pooled = torch.nn.functional.normalize(pooled, dim=-1)
        return pooled.cpu().numpy().astype(np.float32)


def extract_text_embeddings(
    embedder: TextEmbedder,
    store,
    texts_by_version: dict[str, Optional[str]],
    filename: str = "hs_sbert.npz",
    batch_size: int = 64,
) -> dict:
    """Embed transcriptions per version and write (1, dim) store entries.

    Versions with missing/None text are skipped and reported.
    """
    keys = [k for k, t in texts_by_version.items() if t]
    skipped = [k for k, t in texts_by_version.items() if not t]
    for start in range(0, len(keys), batch_size):
        chunk = keys[start : start + batch_size]
        vecs = embedder.embed([texts_by_version[k] for k in chunk])
        for k, v in zip(chunk, vecs):
            store.save(k, filename, embeddings=v[None, :])
    return {"done": keys, "skipped_no_text": skipped}
