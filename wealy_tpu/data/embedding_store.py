"""Embedding store: per-version .npz files with manifest + resumable audits.

Replaces the reference's per-version torch.load .pt files and the
EmbeddingVerifier's missing-file census (lib/embedding_dataset/
embedding_verifier.py:14-248): the same per-version layout (so SHS/discogs
tree structures are preserved), float16 on disk / float32 in memory
(base_dataset.py:226-233 upcast semantics), plus missing-work-list output for
idempotent, shard-resumable extraction jobs (SURVEY.md §5.3/§5.4).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from wealy_tpu.data.metadata import Metadata, SPLITS
from wealy_tpu.data.paths import find_embedding_path


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
        candidates)."""
        return find_embedding_path(self.dataset_name, self.root, version_key, filename)

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
        """Load arrays, upcasting floats to fp32. None when missing/corrupt."""
        p = self.path(version_key, filename)
        if p is None:
            return None
        try:
            with np.load(p) as z:
                return {
                    k: (
                        z[k].astype(np.float32)
                        if np.issubdtype(z[k].dtype, np.floating)
                        else z[k]
                    )
                    for k in z.files
                }
        except (OSError, ValueError):
            return None

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
