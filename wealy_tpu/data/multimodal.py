"""Multimodal embedding datasets: WEALY+CLEWS and Whisper+CLEWS.

Parity: lib/embedding_dataset/multimodal_dataset.py —
  - WEALY+CLEWS loads per version: hs_wealy_concat ({embeddings (n_chunks,
    zdim), chunk_info, extraction_method}, legacy raw-tensor fallback),
    hs_clews (116, 2048), hs_clews_avg (2048,), hs_clews_mask (116,) bool
    (True = INVALID, ops convention) — each with a dummy fallback of the
    canonical shape on load failure (:104-163). Dummies here are **logged
    explicitly** (SURVEY.md §5.3: "make dummy-substitution explicit").
  - Whisper+CLEWS loads hs_last_seq ((seq_len, 1280)) + the CLEWS trio;
    whisper mask is all-valid (:306-346).
  - ensure_version_alignment: versions sorted by deterministic id within each
    clique (:64-78).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from wealy_tpu.data.dataset import EmbeddingDataset
from wealy_tpu.data.metadata import Metadata, SPLITS
from wealy_tpu.train.config import Config

CLEWS_SEQ_LEN = 116
CLEWS_DIM = 2048
WHISPER_DIM = 1280
DUMMY_WEALY_CHUNKS = 10
DUMMY_WHISPER_LEN = 15

WEALY_FILES = ("hs_wealy_concat.npz", "hs_clews.npz", "hs_clews_avg.npz", "hs_clews_mask.npz")
WHISPER_FILES = ("hs_last_seq.npz", "hs_clews.npz", "hs_clews_avg.npz", "hs_clews_mask.npz")


def ensure_version_alignment(md: Metadata, split: str) -> None:
    """Sort each clique's version list by deterministic id
    (multimodal_dataset.py:64-78) so ordering is reproducible across runs."""
    for clique_id, versions in md.splits[split].items():
        md.splits[split][clique_id] = sorted(
            versions, key=lambda v: int(md.info[v]["id"])
        )


def aligned_versions(md: Metadata, split: str) -> List[str]:
    """The flat version list sorted GLOBALLY by deterministic id — the
    reference's ensure_version_alignment sorts ``self.versions`` across
    cliques (multimodal_dataset.py:260-274), so __getitem__(idx) order
    is id-sorted, not clique-grouped. Verified item-for-item against the
    executed reference in tests/test_pt_interop.py."""
    flat = [v for versions in md.splits[split].values() for v in versions]
    return sorted(flat, key=lambda v: int(md.info[v]["id"]))


class MultimodalEmbeddingDataset(EmbeddingDataset):
    """Base for the two multimodal variants. ``mode``:
    'wealy-clews' (MultimodalEmbeddingDataset_WEALYCLEWS) or
    'whisper-clews' (MultimodalEmbeddingDataset_WHISPERCLEWS)."""

    FILES: tuple = ()

    def __init__(self, config: Config, split: str = "train", **kwargs):
        self.dummy_log: List[str] = []
        super().__init__(config, split, **kwargs)
        ensure_version_alignment(self.metadata, split)
        # rebuild sampler state with the aligned ordering and multimodal loader
        self.sampler.load_fn = self.load_multimodal
        self.sampler.versions = aligned_versions(self.metadata, split)
        self.sampler.clique_of = {
            v: c
            for c, versions in self.metadata.splits[split].items()
            for v in versions
        }

    # -- loading --------------------------------------------------------
    def _packed_load(self, version_key: str, filename: str):
        """Memory-mapped fast path (`wealy_tpu pack --kind <filename>`):
        one PackedStore per modality file, probed lazily; None = not packed
        (fall through to the per-version store)."""
        packs = getattr(self, "_packs", None)
        if packs is None:
            packs = self._packs = {}
        if filename not in packs:
            import logging

            from wealy_tpu.data.packed_store import PackedStore

            root = self.config.path.hidden_states
            pack = (
                PackedStore(
                    root, filename, dataset_name=self.config.data.dataset_name
                )
                if root
                else None
            )
            if pack is not None and pack.available:
                probe = [v for v in pack._index][:64]
                if pack.newer_files_exist(self.store, filename, probe):
                    logging.getLogger(__name__).warning(
                        "pack %s is older than re-extracted per-version "
                        "files — ignoring it; run `wealy_tpu pack` to refresh",
                        pack.bin_path,
                    )
                    pack = None
            packs[filename] = pack
        pack = packs[filename]
        if pack is None or not pack.available:
            return None
        return pack.load(version_key)

    def _load_array(self, version_key: str, filename: str, key: str = "embeddings"):
        packed = self._packed_load(version_key, filename)
        if packed is not None:
            return packed
        data = self.store.load(version_key, filename) if self.store else None
        if data is None:
            return None
        if key in data:
            return data[key]
        return next(iter(data.values()))

    def _dummy(self, version_key: str, what: str, arr: np.ndarray) -> np.ndarray:
        self.dummy_log.append(f"{version_key}:{what}")
        return arr

    def _load_clews_trio(self, version_key: str):
        full = self._load_array(version_key, "hs_clews.npz")
        if full is None:
            full = self._dummy(
                version_key, "full_clews", np.zeros((CLEWS_SEQ_LEN, CLEWS_DIM), np.float32)
            )
        avg = self._load_array(version_key, "hs_clews_avg.npz")
        if avg is None:
            avg = self._dummy(version_key, "avg_clews", np.zeros((CLEWS_DIM,), np.float32))
        mask = self._load_array(version_key, "hs_clews_mask.npz")
        if mask is None:
            # dummy mask is all-True = all positions INVALID (reference
            # torch.ones bool, multimodal_dataset.py:158-160)
            mask = self._dummy(
                version_key, "clews_mask", np.ones((CLEWS_SEQ_LEN,), bool)
            )
        return full, avg, np.asarray(mask, bool)

    def load_multimodal(self, version_key: str) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    # -- verification ---------------------------------------------------
    def verify_embeddings_exist(self) -> Dict[str, List[str]]:
        """Require the modality-primary file; CLEWS files are
        optional-with-dummy (embedding_verifier.py:63-127 semantics)."""
        primary = self.FILES[0]
        missing = {}
        for split in SPLITS:
            missing[split] = [
                v
                for versions in self.metadata.splits[split].values()
                for v in versions
                if not self.store.exists(v, primary)
            ]
        return missing


class WealyClewsDataset(MultimodalEmbeddingDataset):
    """Per item: {wealy: {embeddings, chunk_info, extraction_method},
    full_clews, avg_clews, clews_mask}."""

    FILES = WEALY_FILES

    def load_multimodal(self, version_key: str) -> Dict[str, np.ndarray]:
        packed = self._packed_load(version_key, "hs_wealy_concat.npz")
        if packed is not None:
            # chunk_info is derivable from the packed shape; flows into the
            # normalization branch below like a store dict would
            packed = np.atleast_2d(packed)
            wealy = {
                "embeddings": packed,
                "chunk_info": {"total_chunks": int(packed.shape[0])},
                "extraction_method": "packed",
            }
        else:
            wealy = (
                self.store.load(version_key, "hs_wealy_concat.npz")
                if self.store
                else None
            )
        zdim = self.config.model.zdim
        if wealy is None:
            wealy = {
                "embeddings": self._dummy(
                    version_key, "wealy", np.zeros((DUMMY_WEALY_CHUNKS, zdim), np.float32)
                ),
                "chunk_info": {"total_chunks": DUMMY_WEALY_CHUNKS},
                "extraction_method": "dummy",
            }
        elif "embeddings" not in wealy:
            # legacy raw-tensor format (multimodal_dataset.py:115-126)
            raw = next(iter(wealy.values()))
            if raw.ndim == 1:
                raw = raw[None]
            wealy = {
                "embeddings": raw.astype(np.float32),
                "chunk_info": {"total_chunks": raw.shape[0]},
                "extraction_method": "legacy_format",
            }
        else:
            wealy = {
                "embeddings": np.asarray(wealy["embeddings"], np.float32),
                "chunk_info": wealy.get("chunk_info", {"total_chunks": wealy["embeddings"].shape[0]}),
                "extraction_method": wealy.get("extraction_method", "concat"),
            }
        full, avg, mask = self._load_clews_trio(version_key)
        return {
            "wealy": wealy,
            "full_clews": full,
            "avg_clews": avg,
            "clews_mask": mask,
        }


class WhisperClewsDataset(MultimodalEmbeddingDataset):
    """Per item: {whisper_seq (T, 1280), whisper_mask (T,) all-valid,
    full_clews, avg_clews, clews_mask}."""

    FILES = WHISPER_FILES

    def load_multimodal(self, version_key: str) -> Dict[str, np.ndarray]:
        seq = self._load_array(version_key, "hs_last_seq.npz")
        if seq is None:
            seq = self._dummy(
                version_key, "whisper_seq", np.zeros((DUMMY_WHISPER_LEN, WHISPER_DIM), np.float32)
            )
        full, avg, mask = self._load_clews_trio(version_key)
        return {
            "whisper_seq": np.asarray(seq, np.float32),
            "whisper_mask": np.zeros((seq.shape[0],), bool),  # ops convention: False=valid
            "full_clews": full,
            "avg_clews": avg,
            "clews_mask": mask,
        }
