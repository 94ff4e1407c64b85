"""Dataset metadata: readers for shs / lyric-covers / discogs-vi.

Produces the same logical structures as the reference
(lib/embedding_dataset/metadata_loaders.py:70-268): an ``info`` dict keyed by
version_key and a ``splits`` dict {train,val,test} -> clique_id -> [keys], but
built with vectorized pandas (the reference's row-wise ``iterrows`` loop is a
documented hot spot, SURVEY.md §3.2).

Version-key / filename conventions (metadata_loaders.py:195-213):
  shs          key "{set_id}-{ver_id}"    file "{set_id}-{ver_id}.mp3"
  lyric-covers key str(id)                file "{id}_audio.mp3"
  discogs-vi   key base_filename          file "{base_filename}.mp3"
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, List, Optional

import pandas as pd

SPLITS = ("train", "val", "test")

DATASET_NAMES = ("shs", "lyric-covers", "discogs-vi")


@dataclasses.dataclass
class Metadata:
    """info: version_key -> field dict (id, clique, clique_idx, version_idx,
    filename, version_key + per-dataset extras). splits: split -> clique_id ->
    [version_keys]."""

    dataset_name: str
    info: Dict[str, dict]
    splits: Dict[str, Dict[str, List[str]]]

    def versions_in_split(self, split: str) -> List[str]:
        return [v for versions in self.splits[split].values() for v in versions]

    def n_versions(self) -> int:
        return len(self.info)

    def prune_to_splits(self) -> None:
        """Drop info entries whose version no longer appears in any split
        (reference _update_info_after_filtering, filters.py:209-223)."""
        keep = set()
        for split in SPLITS:
            for versions in self.splits[split].values():
                keep.update(versions)
        self.info = {k: v for k, v in self.info.items() if k in keep}

    # ---- JSON persistence (replaces the reference's torch.save/pickle
    #      metadata files, metadata_loaders.py:270-285 / cache_manager.py) ----
    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        payload = {
            "dataset_name": self.dataset_name,
            "info": self.info,
            "splits": self.splits,
        }
        tmp = path.with_suffix(path.suffix + ".tmp")
        tmp.write_text(json.dumps(payload))
        tmp.replace(path)

    @classmethod
    def load(cls, path: str | Path) -> "Metadata":
        payload = json.loads(Path(path).read_text())
        return cls(
            dataset_name=payload["dataset_name"],
            info=payload["info"],
            splits=payload["splits"],
        )


def _build(df: pd.DataFrame, dataset_name: str, extras: Dict[str, str]) -> Metadata:
    """Vectorized info/splits construction from a standardized dataframe with
    columns [version_key, filename, clique_id, split] (+ extra columns)."""
    df = df.copy()
    df["clique_id"] = df["clique_id"].astype(str)
    # sorted-unique integer indices (id_mapper.py:15-45 semantics)
    clique_ids = sorted(df["clique_id"].unique())
    c2i = {c: i for i, c in enumerate(clique_ids)}
    df["clique_idx"] = df["clique_id"].map(c2i)
    version_ids = sorted(df["version_key"].unique())
    v2i = {v: i for i, v in enumerate(version_ids)}
    df["version_idx"] = df["version_key"].map(v2i)

    info: Dict[str, dict] = {}
    records = df.to_dict("records")
    for row in records:
        entry = {
            "id": int(row["version_idx"]),
            "clique": row["clique_id"],
            "clique_idx": int(row["clique_idx"]),
            "version_idx": int(row["version_idx"]),
            "filename": row["filename"],
            "version_key": row["version_key"],
        }
        for field, col in extras.items():
            entry[field] = row[col]
        info[row["version_key"]] = entry

    splits: Dict[str, Dict[str, List[str]]] = {s: {} for s in SPLITS}
    grouped = df[df["split"].isin(SPLITS)].groupby(["split", "clique_id"], sort=False)[
        "version_key"
    ]
    for (split, clique), keys in grouped:
        splits[split][clique] = list(keys)
    return Metadata(dataset_name=dataset_name, info=info, splits=splits)


def load_shs(data_csv: str | Path, splits_dir: str | Path) -> Metadata:
    """SHS100K: main CSV (set_id, ver_id, ...) inner-joined with the
    tab-separated SHS100K-{TRAIN,VAL,TEST} split files (no header)."""
    main = pd.read_csv(data_csv)
    parts = []
    for split, fname in (("train", "SHS100K-TRAIN"), ("val", "SHS100K-VAL"), ("test", "SHS100K-TEST")):
        sf = pd.read_csv(
            Path(splits_dir) / fname,
            sep="\t",
            header=None,
            names=["set_id", "ver_id"],
            usecols=[0, 1],
        )
        sf["split"] = split
        parts.append(sf)
    split_df = pd.concat(parts, ignore_index=True)
    df = main.merge(split_df, on=["set_id", "ver_id"], how="inner")
    df["clique_id"] = df["set_id"]
    df["version_key"] = df["set_id"].astype(str) + "-" + df["ver_id"].astype(str)
    df["filename"] = df["version_key"] + ".mp3"
    return _build(df, "shs", {"set_id": "set_id", "ver_id": "ver_id"})


def load_lyric_covers(data_dir: str | Path) -> Metadata:
    """LyricCovers: {train,val,test}_no_dup.csv with header
    original_id,id,is_cover,song_text_type,label; clique=label, version=id."""
    parts = []
    for split in SPLITS:
        df = pd.read_csv(Path(data_dir) / f"{split}_no_dup.csv")
        df["split"] = split
        parts.append(df)
    df = pd.concat(parts, ignore_index=True)
    df["clique_id"] = df["label"]
    df["version_key"] = df["id"].astype(str)
    df["filename"] = df["version_key"] + "_audio.mp3"
    df["original_id"] = df["original_id"].astype(str)
    df["song_text_type"] = df["song_text_type"].astype(str)
    df["version_id"] = df["version_key"]
    return _build(
        df,
        "lyric-covers",
        {
            "original_id": "original_id",
            "is_cover": "is_cover",
            "song_text_type": "song_text_type",
            "version_id": "version_id",
        },
    )


def load_discogs_vi(data_dir: str | Path) -> Metadata:
    """Discogs-VI-YT: headerless id-to-file-mapping.csv with columns
    [split, clique_id, version_id, youtube_id, base_filename]."""
    df = pd.read_csv(
        Path(data_dir) / "id-to-file-mapping.csv",
        names=["split", "clique_id", "version_id", "youtube_id", "base_filename"],
    )
    df["version_id"] = df["version_id"].astype(str)
    df["youtube_id"] = df["youtube_id"].astype(str)
    df["base_filename"] = df["base_filename"].astype(str)
    df["version_key"] = df["base_filename"]
    df["filename"] = df["base_filename"] + ".mp3"
    return _build(
        df,
        "discogs-vi",
        {
            "base_filename": "base_filename",
            "youtube_id": "youtube_id",
            "version_id": "version_id",
        },
    )


def load_metadata(
    dataset_name: str,
    *,
    shs_data: Optional[str] = None,
    shs_splits: Optional[str] = None,
    lyric_covers_data: Optional[str] = None,
    discogs_vi_data: Optional[str] = None,
    meta_cache: Optional[str] = None,
) -> Metadata:
    """Top-level loader with the reference's cache priority: saved metadata
    file first (conf.path.meta, metadata_loaders.py:45-68), else per-dataset
    CSVs."""
    if meta_cache and Path(meta_cache).exists():
        return Metadata.load(meta_cache)
    if dataset_name == "shs":
        md = load_shs(shs_data, shs_splits)
    elif dataset_name == "lyric-covers":
        md = load_lyric_covers(lyric_covers_data)
    elif dataset_name == "discogs-vi":
        md = load_discogs_vi(discogs_vi_data)
    else:
        raise ValueError(f"unknown dataset {dataset_name!r}; expected {DATASET_NAMES}")
    if meta_cache:
        md.save(meta_cache)
    return md
