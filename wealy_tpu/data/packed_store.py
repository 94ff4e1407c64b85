"""Packed memory-mapped embedding store: one binary per (split, kind).

The per-version store (`embedding_store.py`) mirrors the reference's on-disk
tree — one `.npz`/`.pt` per version (base_dataset.py:226-233) — which is the
right interop/extraction format but a poor *training* format: every sampled
item costs an open+decompress. This module is the SURVEY.md §5.4 "resumable
embedding store (one array file per shard with a manifest)": all rows of one
embedding kind are concatenated into a single fp16 binary, the manifest maps
version_key -> (row_offset, n_rows), and reads are zero-copy ``np.memmap``
slices (the OS page cache replaces any hand-rolled RAM cache), upcast to
fp32 at the boundary per the reference's fp16->fp32 semantics.

Layout under ``root``:
  packed_{kind}.bin   — C-contiguous (total_rows, dim) little-endian bytes
  packed_{kind}.json  — {"dim", "dtype", "versions": {key: [offset, rows]}}

Packs are written atomically (tmp + rename) so a crashed pack job never
leaves a readable-but-truncated pair behind; repacking is idempotent.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, Iterable, Optional

import numpy as np


class PackedStore:
    """Reader for a packed embedding binary (one (split-independent) pack per
    embedding kind; versions absent from the manifest fall back to the
    caller's per-version store)."""

    def __init__(self, root: str | Path, kind: str):
        self.root = Path(root)
        self.kind = kind.removesuffix(".npz").removesuffix(".pt")
        self.bin_path = self.root / f"packed_{self.kind}.bin"
        self.manifest_path = self.root / f"packed_{self.kind}.json"
        self._mmap: Optional[np.memmap] = None
        self._index: Dict[str, tuple] = {}
        self._dim = 0
        self._dtype = np.float16
        if self.manifest_path.exists() and self.bin_path.exists():
            meta = json.loads(self.manifest_path.read_text())
            self._dim = int(meta["dim"])
            self._dtype = np.dtype(meta.get("dtype", "float16"))
            self._index = {k: (int(o), int(n)) for k, (o, n) in meta["versions"].items()}

    @property
    def available(self) -> bool:
        return bool(self._index)

    def __contains__(self, version_key: str) -> bool:
        return version_key in self._index

    def __len__(self) -> int:
        return len(self._index)

    def _rows(self) -> np.memmap:
        if self._mmap is None:
            total = sum(n for _, n in self._index.values())
            self._mmap = np.memmap(
                self.bin_path, dtype=self._dtype, mode="r", shape=(total, self._dim)
            )
        return self._mmap

    def load(self, version_key: str) -> Optional[np.ndarray]:
        """(T, C) fp32 array for a version, or None if not packed."""
        ent = self._index.get(version_key)
        if ent is None:
            return None
        off, n = ent
        return np.asarray(self._rows()[off : off + n], dtype=np.float32)

    @classmethod
    def pack(
        cls,
        root: str | Path,
        kind: str,
        arrays: Iterable[tuple],
        dtype=np.float16,
    ) -> "PackedStore":
        """Write a pack from ``(version_key, (T, C) array)`` pairs.

        Streams one version at a time (bounded host memory), writes to a tmp
        file, fsyncs, then renames both files — a crashed pack never leaves a
        readable partial pair.
        """
        root = Path(root)
        root.mkdir(parents=True, exist_ok=True)
        kind = kind.removesuffix(".npz").removesuffix(".pt")
        bin_tmp = root / f".packed_{kind}.bin.tmp"
        index: Dict[str, list] = {}
        dim = None
        offset = 0
        with open(bin_tmp, "wb") as f:
            for key, arr in arrays:
                a = np.ascontiguousarray(np.atleast_2d(np.asarray(arr)), dtype=dtype)
                if dim is None:
                    dim = a.shape[-1]
                elif a.shape[-1] != dim:
                    raise ValueError(
                        f"inconsistent embedding dim for {key!r}: "
                        f"{a.shape[-1]} != {dim}"
                    )
                f.write(a.tobytes())
                index[key] = [offset, a.shape[0]]
                offset += a.shape[0]
            f.flush()
            os.fsync(f.fileno())
        manifest = {
            "dim": int(dim or 0),
            "dtype": np.dtype(dtype).name,
            "versions": index,
        }
        man_tmp = root / f".packed_{kind}.json.tmp"
        man_tmp.write_text(json.dumps(manifest))
        os.replace(bin_tmp, root / f"packed_{kind}.bin")
        os.replace(man_tmp, root / f"packed_{kind}.json")
        return cls(root, kind)


def pack_from_store(store, versions, filename: str, root: str | Path) -> "PackedStore":
    """Pack every version's main embedding array from a per-version
    EmbeddingStore (versions with no file on disk are skipped — they stay on
    the per-version fallback path and in the verifier's missing-work lists).
    """

    def rows():
        for v in versions:
            data = store.load(v, filename)
            if data is None:
                continue
            arr = data.get("embeddings")
            if arr is None:
                arr = next(iter(data.values()))
            yield v, arr

    return PackedStore.pack(root, filename, rows())
