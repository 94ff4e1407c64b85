"""Packed memory-mapped embedding store: one binary per (split, kind).

The per-version store (`embedding_store.py`) mirrors the reference's on-disk
tree — one `.npz`/`.pt` per version (base_dataset.py:226-233) — which is the
right interop/extraction format but a poor *training* format: every sampled
item costs an open+decompress. This module is the SURVEY.md §5.4 "resumable
embedding store (one array file per shard with a manifest)": all rows of one
embedding kind are concatenated into a single fp16 binary, the manifest maps
version_key -> (row_offset, shape), and reads are zero-copy ``np.memmap``
slices (the OS page cache replaces any hand-rolled RAM cache), upcast to
fp32 at the boundary per the reference's fp16->fp32 semantics. Arrays of any
rank are supported ((T, C) for hs_last_seq, (n_chunks, max_len, C) for
hs_last_all, ...) — only the trailing dim must be uniform.

Layout under ``root``:
  packed_{kind}.bin   — C-contiguous (total_rows, dim) little-endian bytes
  packed_{kind}.json  — {"dim", "dtype", "bin_bytes", "fingerprint",
                          "versions": {key: [flat_row_offset, shape...]}}

Packs are written atomically (tmp + fsync + rename, manifest last). Because
bin and manifest are two files, the reader verifies the manifest's recorded
binary size and head/tail fingerprint on open — a crash between the two
renames (new bin + old manifest) is detected and the pack is treated as
absent rather than silently serving misaligned rows.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
from pathlib import Path
from typing import Dict, Iterable, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _fingerprint(path: Path) -> str:
    """sha1 over the first and last 4 KiB + size — cheap bin/manifest
    consistency check (not a content hash)."""
    size = path.stat().st_size
    h = hashlib.sha1(str(size).encode())
    with open(path, "rb") as f:
        h.update(f.read(4096))
        if size > 4096:
            f.seek(max(0, size - 4096))
            h.update(f.read(4096))
    return h.hexdigest()


class PackedStore:
    """Reader for a packed embedding binary (one (split-independent) pack per
    embedding kind; versions absent from the manifest fall back to the
    caller's per-version store)."""

    def __init__(self, root: str | Path, kind: str, dataset_name: Optional[str] = None):
        self.root = Path(root)
        self.kind = kind.removesuffix(".npz").removesuffix(".pt")
        self.dataset_name = dataset_name
        # packs are namespaced by dataset: two datasets sharing one
        # hidden_states root must not overwrite each other's packs or serve
        # rows across datasets on version-key overlap
        stem = (
            f"packed_{dataset_name}_{self.kind}" if dataset_name
            else f"packed_{self.kind}"
        )
        self.bin_path = self.root / f"{stem}.bin"
        self.manifest_path = self.root / f"{stem}.json"
        if dataset_name and not self.manifest_path.exists():
            # legacy fallback: packs written before dataset-namespacing live
            # at packed_{kind}.*. Safe to serve — the manifest `dataset`
            # check below rejects a legacy pack written for another dataset.
            legacy_bin = self.root / f"packed_{self.kind}.bin"
            legacy_man = self.root / f"packed_{self.kind}.json"
            if legacy_man.exists() and legacy_bin.exists():
                self.bin_path, self.manifest_path = legacy_bin, legacy_man
        self._mmap: Optional[np.memmap] = None
        self._index: Dict[str, tuple] = {}  # key -> (flat_row_offset, shape)
        self._dim = 0
        self._dtype = np.float16
        if self.manifest_path.exists() and self.bin_path.exists():
            meta = json.loads(self.manifest_path.read_text())
            ok = True
            if "bin_bytes" not in meta:
                # pre-shape-manifest format ([offset, n_rows] entries, no
                # consistency fields) — unreadable by this layout; repack
                logger.warning(
                    "packed store %s uses an old manifest format — ignoring; "
                    "repack with `wealy_tpu pack`", self.bin_path,
                )
                ok = False
            elif self.bin_path.stat().st_size != meta["bin_bytes"]:
                ok = False
            elif dataset_name and meta.get("dataset") not in (None, dataset_name):
                # a pack file manually moved/renamed across dataset trees
                logger.warning(
                    "packed store %s was written for dataset %r, not %r — "
                    "ignoring it", self.bin_path, meta.get("dataset"), dataset_name,
                )
                ok = False
            if ok and "fingerprint" in meta and _fingerprint(self.bin_path) != meta["fingerprint"]:
                ok = False
            if not ok:
                logger.warning(
                    "packed store %s does not match its manifest (interrupted "
                    "repack?) — ignoring the pack; repack with `wealy_tpu pack`",
                    self.bin_path,
                )
                return
            self._dim = int(meta["dim"])
            self._dtype = np.dtype(meta.get("dtype", "float16"))
            self._index = {
                k: (int(v[0]), tuple(int(d) for d in v[1:]))
                for k, v in meta["versions"].items()
            }

    @property
    def available(self) -> bool:
        return bool(self._index)

    def __contains__(self, version_key: str) -> bool:
        return version_key in self._index

    def __len__(self) -> int:
        return len(self._index)

    def _rows(self) -> np.memmap:
        if self._mmap is None:
            total = sum(
                int(np.prod(shape[:-1], dtype=np.int64)) for _, shape in self._index.values()
            )
            self._mmap = np.memmap(
                self.bin_path, dtype=self._dtype, mode="r", shape=(total, self._dim)
            )
        return self._mmap

    def newer_files_exist(self, store, filename: str, versions, sample: int = 8) -> bool:
        """Spot-check staleness: True if any sampled per-version file is
        newer than the pack binary (user re-extracted without repacking).
        Callers should then prefer the per-version path and warn."""
        try:
            bin_mtime = self.bin_path.stat().st_mtime
        except OSError:
            return True
        versions = list(versions)
        step = max(1, len(versions) // max(1, sample))
        for v in versions[::step][:sample]:
            p = store.path(v, filename) if store else None
            if p is None:
                continue
            try:
                newer = p.stat().st_mtime > bin_mtime
            except OSError:
                # file vanished between path() and stat() — not "newer"
                newer = False
            if newer:
                return True
        return False

    def load(self, version_key: str, dtype=np.float32) -> Optional[np.ndarray]:
        """Array in its original shape, or None if not packed.

        Default ``dtype=float32`` keeps the reference's fp16-disk -> fp32
        boundary (base_dataset.py:216-250). Passing the store's own dtype
        (fp16) returns a ZERO-COPY ``np.memmap`` view — the train input
        pipeline's fast path: no per-item upcast, no host copy until the
        collate windows the rows it actually uses."""
        ent = self._index.get(version_key)
        if ent is None:
            return None
        off, shape = ent
        n = int(np.prod(shape[:-1], dtype=np.int64))
        flat = self._rows()[off : off + n]
        if np.dtype(dtype) == self._dtype:
            return flat.reshape(shape)
        return np.asarray(flat, dtype=dtype).reshape(shape)

    @classmethod
    def pack(
        cls,
        root: str | Path,
        kind: str,
        arrays: Iterable[tuple],
        dtype=np.float16,
        dataset_name: Optional[str] = None,
    ) -> "PackedStore":
        """Write a pack from ``(version_key, array)`` pairs (any rank >= 1;
        1-D arrays are stored as (1, dim)).

        Streams one version at a time (bounded host memory), writes to a tmp
        file, fsyncs, renames the bin then the manifest; the reader's
        size+fingerprint check turns any crash window into "pack absent",
        never misaligned reads.
        """
        writer = PackWriter(root, kind, dtype=dtype, dataset_name=dataset_name)
        try:
            for key, arr in arrays:
                writer.add(key, arr)
        except BaseException:
            writer.abort()
            raise
        return writer.close()


class PackWriter:
    """Incremental pack writer — the direct-to-packed extraction sink
    (`extract --pack-direct`): ``add(key, arr)`` streams one version's rows
    to the tmp binary as it completes, ``close()`` fsync+renames bin then
    manifest (same crash-safety contract as :meth:`PackedStore.pack`, which
    is implemented on top of this). Until close(), readers see the OLD pack
    (or none) — never a torn one."""

    def __init__(
        self,
        root: str | Path,
        kind: str,
        dtype=np.float16,
        dataset_name: Optional[str] = None,
    ):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.kind = kind.removesuffix(".npz").removesuffix(".pt")
        self.dtype = np.dtype(dtype)
        self.dataset_name = dataset_name
        self._stem = (
            f"packed_{dataset_name}_{self.kind}" if dataset_name
            else f"packed_{self.kind}"
        )
        self._bin_tmp = self.root / f".{self._stem}.bin.tmp"
        self._f = open(self._bin_tmp, "wb")
        self._index: Dict[str, list] = {}
        self._dim: Optional[int] = None
        self._offset = 0

    def __contains__(self, key: str) -> bool:
        return key in self._index

    def __len__(self) -> int:
        return len(self._index)

    def add(self, key: str, arr) -> None:
        if key in self._index:
            # duplicate version keys (e.g. the 5 rows shared between the
            # reference's SHS VAL and TEST split files) must not advance
            # the offset twice — first occurrence wins
            return
        orig = np.asarray(arr)
        a = np.ascontiguousarray(np.atleast_2d(orig), dtype=self.dtype)
        if self._dim is None:
            self._dim = a.shape[-1]
        elif a.shape[-1] != self._dim:
            raise ValueError(
                f"inconsistent embedding dim for {key!r}: "
                f"{a.shape[-1]} != {self._dim}"
            )
        self._f.write(a.tobytes())
        # record the ORIGINAL shape (1-D kinds like hs_clews_avg load back
        # as (D,), not (1, D)); flat-row offsets stay 2-D
        self._index[key] = [self._offset, *orig.shape]
        self._offset += int(np.prod(a.shape[:-1], dtype=np.int64))

    def seed_from(self, old: "PackedStore", versions) -> int:
        """Carry forward already-packed versions (resume semantics for
        direct-to-packed extraction): sequential mmap copy, no re-extract."""
        n = 0
        for v in versions:
            if v in old and v not in self._index:
                # carry rows in the old pack's own dtype: mmap view in,
                # no upcast/downcast roundtrip (bit-identical either way)
                self.add(v, old.load(v, dtype=old._dtype))
                n += 1
        return n

    def abort(self) -> None:
        self._f.close()
        try:
            os.unlink(self._bin_tmp)
        except OSError:
            pass

    def close(self) -> "PackedStore":
        self._f.flush()
        os.fsync(self._f.fileno())
        self._f.close()
        bin_final = self.root / f"{self._stem}.bin"
        os.replace(self._bin_tmp, bin_final)
        manifest = {
            "dim": int(self._dim or 0),
            "dtype": self.dtype.name,
            "bin_bytes": bin_final.stat().st_size,
            "fingerprint": _fingerprint(bin_final),
            "dataset": self.dataset_name,
            "versions": self._index,
        }
        man_tmp = self.root / f".{self._stem}.json.tmp"
        with open(man_tmp, "w") as f:
            f.write(json.dumps(manifest))
            f.flush()
            os.fsync(f.fileno())
        os.replace(man_tmp, self.root / f"{self._stem}.json")
        return PackedStore(self.root, self.kind, dataset_name=self.dataset_name)


def pack_from_store(
    store, versions, filename: str, root: str | Path,
    dataset_name: Optional[str] = None,
) -> "PackedStore":
    """Pack every version's main embedding array from a per-version
    EmbeddingStore (versions with no file on disk are skipped — they stay on
    the per-version fallback path and in the verifier's missing-work lists).
    """

    def rows():
        for v in dict.fromkeys(versions):  # dedupe without re-reading dupes
            data = store.load(v, filename)
            if data is None:
                continue
            arr = data.get("embeddings")
            if arr is None:
                arr = next(iter(data.values()))
            yield v, arr

    return PackedStore.pack(root, filename, rows(), dataset_name=dataset_name)
