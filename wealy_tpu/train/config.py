"""Config dataclasses covering the reference's implied OmegaConf schema.

Every key reconstructed from the reference's access sites (SURVEY.md §5.6) has
a field here; ``Config.from_dict`` accepts a nested dict (or an OmegaConf
DictConfig converted via ``OmegaConf.to_container``) with the same key paths
(conf.path.*, conf.data.*, conf.model.*), so reference-style YAML configs load
unchanged.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional


@dataclasses.dataclass
class PathConfig:
    data: Optional[str] = None  # audio root (filters.py:20-24)
    hidden_states: Optional[str] = None  # embedding root (path_manager.py:17)
    meta: Optional[str] = None  # metadata cache file (metadata_loaders.py:29)
    cache: Optional[str] = None  # processed-dataset cache dir (cache_manager.py:20)
    working_dir: Optional[str] = None
    shs_data: Optional[str] = None  # shs_data.csv
    shs_splits: Optional[str] = None  # SHS100K-{TRAIN,VAL,TEST} dir
    lyric_covers_data: Optional[str] = None
    discogs_vi_data: Optional[str] = None
    checkpoints: Optional[str] = None  # new: orbax checkpoint dir


@dataclasses.dataclass
class DataConfig:
    dataset_name: str = "shs"  # {shs, lyric-covers, discogs-vi}
    embedding_type: str = "last_hidden_states"  # base_dataset.py:99-126 values
    embedding_format: str = "concat"  # {concat, all}
    chunk_size: int = 1000  # collate_functions.py:713
    use_random_chunks: bool = True
    use_avg_pooling: bool = False
    use_avg_clews: bool = False
    apply_masks_with_padding: bool = False
    overlap_percentage: float = 0.9  # test-time chunk overlap
    n_per_class: int = 2
    p_samesong: float = 0.0
    augment: bool = False
    fullsongs: bool = False  # base_dataset.py:20-22: no chunking, full sequences
    whisper_set: str = "turbo_nothing_whisper_42"  # dataset.py:17-19 default


@dataclasses.dataclass
class ModelConfig:
    name: str = "whisper"  # the 7 names (collate_functions.py:428-430)
    zdim: int = 512
    whisper_size: str = "tiny"  # extraction model (tiny..large-v3-turbo)
    scan_layers: bool = True  # nn.scan encoder stack (compile-scalable)


@dataclasses.dataclass
class TrainConfig:
    loss: str = "clews"  # {clews, ntxent, triplet}
    batch_size: int = 32
    lr: float = 1e-4
    weight_decay: float = 1e-4
    warmup_steps: int = 1000
    max_steps: int = 100_000
    seed: int = 0
    log_every: int = 50
    eval_every: int = 1000
    checkpoint_every: int = 1000
    debug_nans: bool = False  # enable jax_debug_nans + per-step finite checks


@dataclasses.dataclass
class Config:
    path: PathConfig = dataclasses.field(default_factory=PathConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        def build(klass, sub):
            fields = {f.name for f in dataclasses.fields(klass)}
            return klass(**{k: v for k, v in (sub or {}).items() if k in fields})

        return cls(
            path=build(PathConfig, d.get("path")),
            data=build(DataConfig, d.get("data")),
            model=build(ModelConfig, d.get("model")),
            train=build(TrainConfig, d.get("train")),
        )

    @classmethod
    def from_json(cls, path: str | Path) -> "Config":
        return cls.from_dict(json.loads(Path(path).read_text()))

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)
