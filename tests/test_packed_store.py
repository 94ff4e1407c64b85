"""Packed memory-mapped embedding store (SURVEY.md §5.4 shard-file store):
pack/read roundtrip, per-version fallback, dataset fast-path wiring, and the
pack CLI."""

import json

import numpy as np
import pytest

from wealy_tpu.data.embedding_store import EmbeddingStore
from wealy_tpu.data.packed_store import PackedStore, pack_from_store


@pytest.fixture
def store_tree(tmp_path):
    store = EmbeddingStore(tmp_path / "hs", "lyric-covers")
    rng = np.random.default_rng(0)
    arrays = {}
    for vid in ("100", "101", "200"):
        arr = rng.normal(size=(int(rng.integers(3, 9)), 16)).astype(np.float32)
        store.save(vid, "hs_last_seq.npz", embeddings=arr)
        arrays[vid] = arr.astype(np.float16).astype(np.float32)  # disk dtype
    return store, arrays, tmp_path / "hs"


class TestPackRoundtrip:
    def test_matches_store_loads(self, store_tree):
        store, arrays, root = store_tree
        packed = pack_from_store(store, list(arrays), "hs_last_seq.npz", root)
        assert packed.available and len(packed) == 3
        for vid, want in arrays.items():
            got = packed.load(vid)
            assert got.dtype == np.float32
            np.testing.assert_array_equal(got, want)

    def test_reader_reopens_from_disk(self, store_tree):
        store, arrays, root = store_tree
        pack_from_store(store, list(arrays), "hs_last_seq.npz", root)
        fresh = PackedStore(root, "hs_last_seq")
        assert fresh.available
        np.testing.assert_array_equal(fresh.load("200"), arrays["200"])

    def test_missing_version_returns_none(self, store_tree):
        store, arrays, root = store_tree
        packed = pack_from_store(store, list(arrays), "hs_last_seq.npz", root)
        assert packed.load("999") is None
        assert "999" not in packed

    def test_skips_versions_without_files(self, store_tree):
        store, arrays, root = store_tree
        packed = pack_from_store(
            store, list(arrays) + ["missing-1"], "hs_last_seq.npz", root
        )
        assert len(packed) == 3

    def test_3d_kinds_roundtrip(self, tmp_path):
        """hs_last_all-style (n_chunks, max_len, D) arrays pack and load in
        their original shape with correct offsets (regression: flat-row
        offsets were counted as shape[0], corrupting every later version)."""
        rng = np.random.default_rng(3)
        arrays = {
            "a": rng.normal(size=(2, 5, 8)).astype(np.float32),
            "b": rng.normal(size=(3, 5, 8)).astype(np.float32),
            "c": rng.normal(size=(4, 8)).astype(np.float32),  # mixed ranks ok
            "d": rng.normal(size=(8,)).astype(np.float32),  # 1-D -> (1, 8)
        }
        packed = PackedStore.pack(tmp_path, "hs_last_all", arrays.items())
        for k in ("a", "b"):
            got = packed.load(k)
            assert got.shape == arrays[k].shape
            np.testing.assert_array_equal(
                got, arrays[k].astype(np.float16).astype(np.float32)
            )
        assert packed.load("c").shape == (4, 8)
        assert packed.load("d").shape == (8,)  # 1-D preserved
        # reopen from disk
        fresh = PackedStore(tmp_path, "hs_last_all")
        np.testing.assert_array_equal(fresh.load("b"), packed.load("b"))

    def test_bin_manifest_mismatch_detected(self, tmp_path):
        """A bin that doesn't match its manifest (interrupted repack) must
        make the pack read as absent, never serve misaligned rows."""
        rng = np.random.default_rng(4)
        PackedStore.pack(
            tmp_path, "k", [("a", rng.normal(size=(3, 8)).astype(np.float32))]
        )
        # simulate: new bin landed, old manifest survived
        with open(tmp_path / "packed_k.bin", "ab") as f:
            f.write(b"\x00" * 16)
        assert not PackedStore(tmp_path, "k").available

    def test_duplicate_keys_pack_once(self, tmp_path):
        """Duplicate version keys (the reference's SHS split files share 5
        rows between VAL and TEST) must not advance offsets twice —
        regression: every entry after a duplicate read misaligned rows."""
        rng = np.random.default_rng(6)
        a = rng.normal(size=(3, 8)).astype(np.float32)
        b = rng.normal(size=(2, 8)).astype(np.float32)
        c = rng.normal(size=(4, 8)).astype(np.float32)
        packed = PackedStore.pack(tmp_path, "k", [("a", a), ("b", b), ("b", b), ("c", c)])
        assert len(packed) == 3
        np.testing.assert_array_equal(
            packed.load("c"), c.astype(np.float16).astype(np.float32)
        )
        fresh = PackedStore(tmp_path, "k")
        np.testing.assert_array_equal(fresh.load("c"), packed.load("c"))

    def test_inconsistent_dim_raises(self, tmp_path):
        rows = [("a", np.zeros((2, 8))), ("b", np.zeros((2, 12)))]
        with pytest.raises(ValueError, match="inconsistent"):
            PackedStore.pack(tmp_path, "k", rows)

    def test_unpacked_root_not_available(self, tmp_path):
        assert not PackedStore(tmp_path, "hs_last_seq").available


class TestDatasetFastPath:
    def test_dataset_prefers_pack(self, tmp_path):
        """EmbeddingDataset reads through the pack when present; values match
        the per-version files (same fp16 disk dtype both ways)."""
        import pandas as pd

        from wealy_tpu.data.dataset import EmbeddingDataset
        from wealy_tpu.train.config import Config

        lc = tmp_path / "lc"
        lc.mkdir()
        rows = {
            "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A"),
                      (2, 200, False, "o", "B"), (2, 201, True, "c", "B")],
            "val": [(3, 300, False, "o", "C"), (3, 301, True, "c", "C")],
            "test": [(4, 400, False, "o", "D"), (4, 401, True, "c", "D")],
        }
        for split, data in rows.items():
            pd.DataFrame(
                data,
                columns=["original_id", "id", "is_cover", "song_text_type", "label"],
            ).to_csv(lc / f"{split}_no_dup.csv", index=False)
        store = EmbeddingStore(tmp_path / "hs", "lyric-covers")
        rng = np.random.default_rng(1)
        for data in rows.values():
            for r in data:
                store.save(
                    str(r[1]), "hs_last_seq.npz",
                    embeddings=rng.normal(size=(5, 8)).astype(np.float32),
                )
        conf = Config.from_dict(
            {
                "path": {"lyric_covers_data": str(lc),
                         "hidden_states": str(tmp_path / "hs"),
                         "cache": str(tmp_path / "cache")},
                "data": {"dataset_name": "lyric-covers",
                         "embedding_type": "last_hidden_states",
                         "embedding_format": "concat"},
            }
        )
        ds_plain = EmbeddingDataset(conf, "train", seed=0)
        assert ds_plain.packed is None
        want = {v: ds_plain.load_embedding(v) for v in ds_plain.sampler.versions}

        pack_from_store(
            store, sorted(want), "hs_last_seq.npz", tmp_path / "hs",
            dataset_name="lyric-covers",
        )
        ds_packed = EmbeddingDataset(conf, "train", seed=0)
        assert ds_packed.packed is not None
        for v, arr in want.items():
            np.testing.assert_array_equal(ds_packed.load_embedding(v), arr)


class TestPackCLI:
    def test_pack_command(self, tmp_path, capsys):
        import pandas as pd

        from wealy_tpu.cli.main import main

        lc = tmp_path / "lc"
        lc.mkdir()
        rows = {
            "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A")],
            "val": [(3, 300, False, "o", "C"), (3, 301, True, "c", "C")],
            "test": [(4, 400, False, "o", "D"), (4, 401, True, "c", "D")],
        }
        for split, data in rows.items():
            pd.DataFrame(
                data,
                columns=["original_id", "id", "is_cover", "song_text_type", "label"],
            ).to_csv(lc / f"{split}_no_dup.csv", index=False)
        store = EmbeddingStore(tmp_path / "hs", "lyric-covers")
        rng = np.random.default_rng(2)
        for data in rows.values():
            for r in data:
                store.save(
                    str(r[1]), "hs_last_seq.npz",
                    embeddings=rng.normal(size=(4, 8)).astype(np.float32),
                )
        conf = {
            "path": {"lyric_covers_data": str(lc),
                     "hidden_states": str(tmp_path / "hs"),
                     "cache": str(tmp_path / "cache")},
            "data": {"dataset_name": "lyric-covers",
                     "embedding_type": "last_hidden_states",
                     "embedding_format": "concat"},
        }
        cpath = tmp_path / "conf.json"
        cpath.write_text(json.dumps(conf))
        rc = main(["pack", "--config", str(cpath)])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["versions_packed"] == 6
        assert PackedStore(
            tmp_path / "hs", "hs_last_seq", dataset_name="lyric-covers"
        ).available
        # packs are namespaced by dataset: another dataset sharing the same
        # hidden_states root must not see (or have clobbered) this pack
        assert not PackedStore(
            tmp_path / "hs", "hs_last_seq", dataset_name="shs"
        ).available


class TestMultimodalPackFastPath:
    def test_wealy_dataset_reads_packs(self, tmp_path):
        """All four WEALY+CLEWS modality files read through packs when
        packed; values match per-version loads (mask bools survive the fp16
        pack roundtrip as exact 0/1)."""
        import pandas as pd

        from wealy_tpu.data.multimodal import WealyClewsDataset
        from wealy_tpu.train.config import Config

        lc = tmp_path / "lc"
        lc.mkdir()
        rows = {
            "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A"),
                      (2, 200, False, "o", "B"), (2, 201, True, "c", "B")],
            "val": [(3, 300, False, "o", "C"), (3, 301, True, "c", "C")],
            "test": [(4, 400, False, "o", "D"), (4, 401, True, "c", "D")],
        }
        for split, data in rows.items():
            pd.DataFrame(
                data,
                columns=["original_id", "id", "is_cover", "song_text_type", "label"],
            ).to_csv(lc / f"{split}_no_dup.csv", index=False)
        store = EmbeddingStore(tmp_path / "hs", "lyric-covers")
        rng = np.random.default_rng(5)
        for data in rows.values():
            for r in data:
                vid = str(r[1])
                store.save(vid, "hs_wealy_concat.npz",
                           embeddings=rng.normal(size=(3, 16)).astype(np.float32))
                store.save(vid, "hs_clews.npz",
                           embeddings=rng.normal(size=(6, 12)).astype(np.float32))
                store.save(vid, "hs_clews_avg.npz",
                           embeddings=rng.normal(size=(12,)).astype(np.float32))
                store.save(vid, "hs_clews_mask.npz",
                           embeddings=(rng.random(6) > 0.5))
        conf = Config.from_dict(
            {
                "path": {"lyric_covers_data": str(lc),
                         "hidden_states": str(tmp_path / "hs"),
                         "cache": str(tmp_path / "cache")},
                "data": {"dataset_name": "lyric-covers"},
                "model": {"name": "wealy-clews", "zdim": 16},
            }
        )
        ds_plain = WealyClewsDataset(conf, "train", seed=0)
        want = {
            v: ds_plain.load_multimodal(v) for v in ds_plain.sampler.versions
        }

        for kind in ("hs_wealy_concat.npz", "hs_clews.npz",
                     "hs_clews_avg.npz", "hs_clews_mask.npz"):
            pack_from_store(
                store, sorted(want), kind, tmp_path / "hs",
                dataset_name="lyric-covers",
            )

        ds_packed = WealyClewsDataset(conf, "train", seed=0)
        for v, mm_want in want.items():
            mm = ds_packed.load_multimodal(v)
            assert mm["wealy"]["extraction_method"] == "packed"
            np.testing.assert_array_equal(
                mm["wealy"]["embeddings"], mm_want["wealy"]["embeddings"]
            )
            np.testing.assert_array_equal(mm["full_clews"], mm_want["full_clews"])
            np.testing.assert_array_equal(mm["avg_clews"], mm_want["avg_clews"])
            assert mm["avg_clews"].shape == mm_want["avg_clews"].shape
            np.testing.assert_array_equal(mm["clews_mask"], mm_want["clews_mask"])
            assert mm["clews_mask"].dtype == bool


class TestStaleness:
    def test_stale_pack_ignored(self, store_tree):
        """Re-extracting per-version files after packing must disable the
        pack (spot-check mtimes) instead of silently serving old values."""
        import os
        import time

        from wealy_tpu.data.packed_store import PackedStore

        store, arrays, root = store_tree
        packed = pack_from_store(store, list(arrays), "hs_last_seq.npz", root)
        assert not packed.newer_files_exist(store, "hs_last_seq.npz", list(arrays))
        # simulate a fresh re-extraction of one version
        p = store.path("101", "hs_last_seq.npz")
        future = time.time() + 60
        os.utime(p, (future, future))
        fresh = PackedStore(root, "hs_last_seq")
        assert fresh.newer_files_exist(store, "hs_last_seq.npz", list(arrays))

    def test_old_manifest_format_ignored(self, tmp_path):
        import json

        from wealy_tpu.data.packed_store import PackedStore

        rng = np.random.default_rng(7)
        PackedStore.pack(tmp_path, "k", [("a", rng.normal(size=(3, 8)).astype(np.float32))])
        # rewrite the manifest in the pre-shape format (no bin_bytes)
        m = json.loads((tmp_path / "packed_k.json").read_text())
        old = {"dim": m["dim"], "dtype": m["dtype"],
               "versions": {"a": [0, 3]}}
        (tmp_path / "packed_k.json").write_text(json.dumps(old))
        assert not PackedStore(tmp_path, "k").available
