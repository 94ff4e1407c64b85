"""End-to-end data-pipeline tests: Config -> build_clean_dataset ->
EmbeddingDataset / multimodal datasets -> collate factory, over a synthetic
lyric-covers fixture tree with a populated embedding store."""

import json

import numpy as np
import pandas as pd
import pytest

from wealy_tpu.data.collate_factory import (
    collate_wealy_clews,
    collate_whisper_clews,
    create_collate_fn,
    wealy_test_mode_items,
)
from wealy_tpu.data.dataset import (
    EmbeddingDataset,
    build_clean_dataset,
    ensure_perfect_consistency,
    processed_cache_path,
    validate_data_structures,
)
from wealy_tpu.data.embedding_store import EmbeddingStore
from wealy_tpu.data.multimodal import (
    WealyClewsDataset,
    WhisperClewsDataset,
    ensure_version_alignment,
)
from wealy_tpu.train.config import Config


@pytest.fixture
def fixture_tree(tmp_path):
    """lyric-covers metadata (3 cliques x 2-3 versions) + embedding store."""
    lc = tmp_path / "lc"
    lc.mkdir()
    rows = {
        "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A"),
                  (2, 200, False, "o", "B"), (2, 201, True, "c", "B"), (2, 202, True, "c", "B")],
        "val": [(3, 300, False, "o", "C"), (3, 301, True, "c", "C")],
        "test": [(4, 400, False, "o", "D"), (4, 401, True, "c", "D")],
    }
    for split, data in rows.items():
        pd.DataFrame(
            data, columns=["original_id", "id", "is_cover", "song_text_type", "label"]
        ).to_csv(lc / f"{split}_no_dup.csv", index=False)

    store_root = tmp_path / "hs"
    store = EmbeddingStore(store_root, "lyric-covers")
    rng = np.random.default_rng(0)
    for split, data in rows.items():
        for _, vid, *_ in data:
            key = str(vid)
            T = int(rng.integers(20, 40))
            store.save(key, "hs_last_seq.npz", embeddings=rng.normal(size=(T, 32)).astype(np.float32))
            store.save(key, "hs_wealy_concat.npz",
                       embeddings=rng.normal(size=(3, 16)).astype(np.float32))
            store.save(key, "hs_clews.npz",
                       embeddings=rng.normal(size=(8, 24)).astype(np.float32))
            store.save(key, "hs_clews_avg.npz", embeddings=rng.normal(size=(24,)).astype(np.float32))
            mask = np.zeros(8, bool)
            mask[6:] = True  # last two positions invalid
            store.save(key, "hs_clews_mask.npz", embeddings=mask)

    config = Config.from_dict(
        {
            "path": {
                "lyric_covers_data": str(lc),
                "hidden_states": str(store_root),
                "cache": str(tmp_path / "cache"),
            },
            "data": {
                "dataset_name": "lyric-covers",
                "embedding_type": "last_hidden_states",
                "embedding_format": "concat",
                "chunk_size": 16,
                "use_random_chunks": True,
            },
            "model": {"name": "whisper", "zdim": 16},
        }
    )
    return config, store


class TestBuildCleanDataset:
    def test_builds_and_caches(self, fixture_tree):
        config, _ = fixture_tree
        md, clique2id = build_clean_dataset(config)
        assert set(md.splits["train"]) == {"A", "B"}
        assert clique2id["A"] == 0 and clique2id["C"] == 2
        cache = processed_cache_path(config)
        assert cache.exists()
        payload = json.loads(cache.read_text())
        assert payload["clique2id"] == clique2id

    def test_cache_hit_short_circuits(self, fixture_tree):
        config, _ = fixture_tree
        build_clean_dataset(config)
        # poison the CSVs: cache must make reload unnecessary
        import pathlib

        for f in pathlib.Path(config.path.lyric_covers_data).glob("*.csv"):
            f.write_text("garbage")
        md, _ = build_clean_dataset(config)
        assert set(md.splits["train"]) == {"A", "B"}

    def test_missing_embeddings_blocks_cache(self, fixture_tree, tmp_path):
        config, store = fixture_tree
        # remove one embedding file -> verification fails -> no processed cache
        p = store.path("100", "hs_last_seq.npz")
        p.unlink()
        build_clean_dataset(config)
        assert not processed_cache_path(config).exists()
        # work list written instead
        audit = processed_cache_path(config).parent / "missing_embeddings_hs_last_seq.txt"
        assert audit.exists() and "100" in audit.read_text()

    def test_validate_report(self, fixture_tree):
        config, _ = fixture_tree
        md, _ = build_clean_dataset(config)
        report = validate_data_structures(md, "train")
        assert report["ok"] and report["n_cliques"] == 2 and report["n_versions"] == 5

    def test_ensure_perfect_consistency_raises(self, fixture_tree):
        config, _ = fixture_tree
        md, _ = build_clean_dataset(config)
        # a clique whose versions lack info entries collapses below 2 -> pruned;
        # consistency passes after pruning
        md.splits["train"]["Z"] = ["nope-1", "nope-2"]
        ensure_perfect_consistency(md, "train")
        assert "Z" not in md.splits["train"]


class TestEmbeddingDataset:
    def test_items_and_epoch(self, fixture_tree):
        config, _ = fixture_tree
        ds = EmbeddingDataset(config, "train", seed=0)
        assert len(ds) == 5
        label, versions = ds[0]
        assert len(versions) == 2
        vid, emb = versions[0]
        assert emb is not None and emb.shape[-1] == 32
        batches = list(ds.epoch(batch_size=2))
        assert len(batches) == 2

    def test_limit_cliques(self, fixture_tree):
        config, _ = fixture_tree
        ds = EmbeddingDataset(config, "train", limit_cliques=1)
        assert ds.report["n_cliques"] == 1

    def test_val_labels_offset(self, fixture_tree):
        config, _ = fixture_tree
        ds = EmbeddingDataset(config, "val")
        label, _ = ds[0]
        assert label == 2  # after train's two cliques

    def test_collate_integration(self, fixture_tree):
        config, _ = fixture_tree
        ds = EmbeddingDataset(config, "train", seed=0)
        collate = create_collate_fn(config)
        batch = collate(next(iter(ds.epoch(batch_size=2))))
        assert batch.embeddings.shape == (2, 2, 16, 32)
        labels, ids, emb, mask = batch.flatten_versions()
        assert emb.shape == (4, 16, 32)


class TestMultimodalDatasets:
    def test_wealy_clews_items(self, fixture_tree):
        config, _ = fixture_tree
        ds = WealyClewsDataset(config, "train", seed=0)
        label, versions = ds[0]
        vid, mm = versions[0]
        assert mm["wealy"]["embeddings"].shape == (3, 16)
        assert mm["full_clews"].shape == (8, 24)
        assert mm["avg_clews"].shape == (24,)
        assert mm["clews_mask"].shape == (8,)
        assert ds.dummy_log == []

    def test_dummy_fallback_logged(self, fixture_tree):
        config, store = fixture_tree
        store.path("100", "hs_clews.npz").unlink()
        ds = WealyClewsDataset(config, "train", seed=0)
        mm = ds.load_multimodal("100")
        assert mm["full_clews"].shape == (116, 2048)  # canonical dummy shape
        assert any("100:full_clews" in s for s in ds.dummy_log)

    def test_version_alignment_sorted_by_id(self, fixture_tree):
        config, _ = fixture_tree
        ds = WealyClewsDataset(config, "train")
        for clique, versions in ds.metadata.splits["train"].items():
            ids = [int(ds.metadata.info[v]["id"]) for v in versions]
            assert ids == sorted(ids)

    def test_whisper_clews_items(self, fixture_tree):
        config, _ = fixture_tree
        ds = WhisperClewsDataset(config, "train", seed=0)
        _, versions = ds[0]
        _, mm = versions[0]
        assert mm["whisper_seq"].shape[-1] == 32
        assert not mm["whisper_mask"].any()  # all valid


class TestCollateFactory:
    def _mm_items(self, fixture_tree, n=2):
        config, _ = fixture_tree
        ds = WealyClewsDataset(config, "train", seed=0)
        return config, [ds[i] for i in range(n)]

    def test_wealy_clews_batch(self, fixture_tree):
        config, items = self._mm_items(fixture_tree)
        batch = collate_wealy_clews(items, wealy_mode="deterministic")
        assert batch["wealy"].shape == (2, 2, 16)
        assert batch["full_clews"].shape == (2, 2, 8, 24)
        assert batch["clews_mask"].shape == (2, 2, 8)
        # mask True = invalid (positions 6,7 from the fixture)
        assert batch["clews_mask"][0, 0, 6] and not batch["clews_mask"][0, 0, 0]

    def test_masks_with_padding_compaction(self, fixture_tree):
        config, items = self._mm_items(fixture_tree)
        batch = collate_wealy_clews(
            items, wealy_mode="deterministic", apply_masks_with_padding=True
        )
        # every sample has 6 valid positions -> compacted length 6
        assert batch["full_clews"].shape == (2, 2, 6, 24)
        assert not batch["clews_mask"].any()  # all positions valid after compaction

    def test_test_mode_items(self, fixture_tree):
        config, items = self._mm_items(fixture_tree)
        songs = wealy_test_mode_items(items)
        assert len(songs) == 4
        assert songs[0]["wealy_all_chunks"].shape == (3, 16)
        assert songs[0]["batch_idx"] == 0 and songs[1]["version_idx"] == 1

    def test_whisper_clews_batch(self, fixture_tree):
        config, _ = fixture_tree
        ds = WhisperClewsDataset(config, "train", seed=0)
        items = [ds[i] for i in range(2)]
        batch = collate_whisper_clews(items, chunk_size=16)
        assert batch["whisper_seq"].shape == (2, 2, 16, 32)
        assert batch["whisper_mask"].shape == (2, 2, 16)
        assert batch["full_clews"].shape == (2, 2, 8, 24)

    def test_dispatch_by_model_name(self, fixture_tree):
        config, items = self._mm_items(fixture_tree)
        for name in ("wealy-clews", "multimodal-concatenation"):
            config.model.name = name
            fn = create_collate_fn(config)
            assert "wealy" in fn(items)
        config.model.name = "whisper"
        fn = create_collate_fn(config)
        assert callable(fn)
        config.model.name = "wealy-clews"
        fn_test = create_collate_fn(config, use_overlapping_chunks=True)
        assert fn_test is wealy_test_mode_items


class TestPathAccessors:
    def test_embedding_and_audio_paths(self, fixture_tree):
        config, store = fixture_tree
        ds = EmbeddingDataset(config, "train", seed=0)
        p = ds.get_embedding_path("100")
        assert p is not None and p.name == "hs_last_seq.npz"
        assert ds.get_embedding_path("nope") is None
        assert ds.get_audio_path("100") is None  # no audio root configured
