"""Embedding store: per-version .npz files with manifest + resumable audits.

Replaces the reference's per-version torch.load .pt files and the
EmbeddingVerifier's missing-file census (lib/embedding_dataset/
embedding_verifier.py:14-248): the same per-version layout (so SHS/discogs
tree structures are preserved), float16 on disk / float32 in memory
(base_dataset.py:226-233 upcast semantics), plus missing-work-list output for
idempotent, shard-resumable extraction jobs (SURVEY.md §5.3/§5.4).

`.pt` interop: the store transparently READS a reference embedding tree —
torch `.pt` files in the reference's on-disk formats (raw fp16 tensors for
most kinds, base_dataset.py:226-233; ``{embeddings, chunk_info,
extraction_method}`` dicts for ``hs_wealy_concat.pt``,
multimodal_dataset.py:104-126) — whenever the `.npz` is absent, and can
EXPORT `.pt` files the reference stack can consume (:func:`save_pt`), so
embedding dumps cross-check in both directions.
"""

from __future__ import annotations

import pickle
import zipfile
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from wealy_tpu.data.metadata import Metadata, SPLITS
from wealy_tpu.data.paths import find_embedding_path


def _upcast(a: np.ndarray) -> np.ndarray:
    """fp16-on-disk -> fp32-in-memory (base_dataset.py:229-233 semantics)."""
    if np.issubdtype(a.dtype, np.floating):
        return a.astype(np.float32)
    return a


def load_pt(path: str | Path) -> Dict[str, np.ndarray]:
    """Read one reference `.pt` embedding file into the store's dict layout.

    Reference formats: a raw tensor (most kinds; torch.load at
    base_dataset.py:226) becomes ``{"embeddings": fp32 array}``; a dict
    (``hs_wealy_concat.pt``: {embeddings, chunk_info, extraction_method},
    multimodal_dataset.py:104-126) keeps its keys, tensors upcast to fp32,
    non-tensor values converted to arrays where possible.
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # legacy pickled payloads (e.g. dicts with tuples/strs) need the
        # general unpickler; these are local dataset files, not checkpoints
        obj = torch.load(path, map_location="cpu", weights_only=False)

    def convert(v):
        if isinstance(v, torch.Tensor):
            return _upcast(v.numpy())
        return np.asarray(v)

    if isinstance(obj, torch.Tensor):
        return {"embeddings": _upcast(obj.numpy())}
    if isinstance(obj, dict):
        return {k: convert(v) for k, v in obj.items()}
    raise ValueError(f"{path}: unsupported .pt payload type {type(obj)!r}")


class EmbeddingStore:
    def __init__(self, root: str | Path, dataset_name: str):
        self.root = Path(root)
        self.dataset_name = dataset_name

    def version_dir(self, version_key: str) -> Path:
        """Canonical (write-side) directory for a version. SHS writes under
        the plain set_id folder (first candidate)."""
        if self.dataset_name == "shs":
            set_id = version_key.split("-", 1)[0]
            return self.root / set_id / version_key
        return self.root / version_key

    def path(self, version_key: str, filename: str) -> Optional[Path]:
        """Resolve an existing embedding file (read side probes all layout
        candidates). When the `.npz` is absent, the reference's `.pt`
        equivalent (same stem) is probed so a reference embedding tree is
        readable in place."""
        p = find_embedding_path(self.dataset_name, self.root, version_key, filename)
        if p is None and filename.endswith(".npz"):
            p = find_embedding_path(
                self.dataset_name, self.root, version_key,
                filename[: -len(".npz")] + ".pt",
            )
        return p

    def save(self, version_key: str, filename: str, **arrays: np.ndarray) -> Path:
        """Write arrays as fp16 .npz (atomic rename)."""
        d = self.version_dir(version_key)
        d.mkdir(parents=True, exist_ok=True)
        out = d / filename
        tmp = out.with_suffix(".tmp.npz")
        halved = {
            k: (v.astype(np.float16) if np.issubdtype(v.dtype, np.floating) else v)
            for k, v in arrays.items()
        }
        np.savez(tmp, **halved)
        tmp.replace(out)
        return out

    def load(self, version_key: str, filename: str) -> Optional[Dict[str, np.ndarray]]:
        """Load arrays, upcasting floats to fp32. None when missing/corrupt.
        Reads reference `.pt` files transparently (see :func:`load_pt`)."""
        p = self.path(version_key, filename)
        if p is None:
            return None
        try:
            if p.suffix == ".pt":
                # torch raises RuntimeError/UnpicklingError/EOFError on
                # truncated or corrupt payloads; all mean "missing work"
                return load_pt(p)
            with np.load(p) as z:
                return {k: _upcast(z[k]) for k in z.files}
        except (
            OSError,
            ValueError,
            RuntimeError,
            EOFError,
            pickle.UnpicklingError,
            zipfile.BadZipFile,
        ):
            return None

    def save_pt(self, version_key: str, filename: str, **arrays) -> Path:
        """Export in the reference's `.pt` on-disk format (fp16 tensors;
        raw tensor when the payload is a single ``embeddings`` array, dict
        otherwise — base_dataset.py:226-233, multimodal_dataset.py:104-126),
        so the torch reference stack can cross-check our embeddings.

        Non-array values (the ``extraction_method`` str and ``chunk_info``
        dict of hs_wealy_concat.pt, multimodal_dataset.py:110-126) pass
        through unconverted, exactly as the reference writes them."""
        import torch

        d = self.version_dir(version_key)
        d.mkdir(parents=True, exist_ok=True)
        out = d / filename

        def to_t(v):
            if isinstance(v, (str, dict)):
                return v
            v = np.asarray(v)
            if np.issubdtype(v.dtype, np.floating):
                return torch.from_numpy(v.astype(np.float16))
            return torch.from_numpy(v)

        if set(arrays) == {"embeddings"}:
            payload = to_t(arrays["embeddings"])
        else:
            payload = {k: to_t(v) for k, v in arrays.items()}
        tmp = out.with_suffix(".tmp.pt")
        torch.save(payload, tmp)
        tmp.replace(out)
        return out

    def exists(self, version_key: str, filename: str) -> bool:
        return self.path(version_key, filename) is not None

    def verify(
        self, md: Metadata, filename: str, out_dir: Optional[str | Path] = None
    ) -> Dict[str, List[str]]:
        """Audit every split for missing embedding files. Optionally writes
        ``missing_embeddings_{stem}.txt`` work lists (one version_key per
        line) to ``out_dir`` — the resumable re-extraction mechanism
        (embedding_verifier.py:173-248)."""
        missing: Dict[str, List[str]] = {}
        for split in SPLITS:
            miss = [
                v
                for versions in md.splits[split].values()
                for v in versions
                if not self.exists(v, filename)
            ]
            missing[split] = miss
        if out_dir is not None:
            out_dir = Path(out_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
            stem = filename.rsplit(".", 1)[0]
            all_missing = [v for split in SPLITS for v in missing[split]]
            (out_dir / f"missing_embeddings_{stem}.txt").write_text(
                "\n".join(all_missing) + ("\n" if all_missing else "")
            )
        return missing
