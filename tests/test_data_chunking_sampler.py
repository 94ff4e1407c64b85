"""Tests for chunking collates, the clique sampler, transcription validation,
and the embedding store."""

import numpy as np
import pytest

from wealy_tpu.data.chunking import (
    Batch,
    chunk_embedding,
    collate_avg_pool,
    collate_fixed_length,
    collate_overlapping,
    select_wealy_chunk,
)
from wealy_tpu.data.embedding_store import EmbeddingStore
from wealy_tpu.data.metadata import Metadata
from wealy_tpu.data.sampler import CliqueSampler, split_clique_labels
from wealy_tpu.data.transcription import TranscriptionCache, TranscriptionValidator


def _items(rng, B=3, n=2, T=50, C=8):
    items = []
    for i in range(B):
        versions = [(100 + i * 10 + j, rng.normal(size=(T + i, C)).astype(np.float32)) for j in range(n)]
        items.append((i, versions))
    return items


class TestWealyChunk:
    def test_modes(self, rng):
        w = rng.normal(size=(5, 16)).astype(np.float32)
        assert select_wealy_chunk(w, "deterministic").shape == (16,)
        np.testing.assert_array_equal(select_wealy_chunk(w, "deterministic"), w[0])
        r = select_wealy_chunk(w, "random", rng)
        assert any(np.array_equal(r, w[i]) for i in range(5))
        np.testing.assert_array_equal(select_wealy_chunk(w, "all"), w)

    def test_1d_legacy(self):
        w = np.ones(16, np.float32)
        assert select_wealy_chunk(w, "deterministic").shape == (16,)


class TestChunkEmbedding:
    def test_short_padded(self, rng):
        emb = rng.normal(size=(5, 4)).astype(np.float32)
        out, mask = chunk_embedding(emb, 8, "first", 4)
        np.testing.assert_array_equal(out[:5], emb)
        np.testing.assert_array_equal(mask, [1, 1, 1, 1, 1, 0, 0, 0])

    def test_long_first(self, rng):
        emb = rng.normal(size=(20, 4)).astype(np.float32)
        out, mask = chunk_embedding(emb, 8, "first", 4)
        np.testing.assert_array_equal(out, emb[:8])
        assert mask.all()

    def test_long_random_is_window(self, rng):
        emb = np.arange(40, dtype=np.float32).reshape(20, 2)
        out, mask = chunk_embedding(emb, 8, "random", 2, rng)
        start = int(out[0, 0] // 2)
        np.testing.assert_array_equal(out, emb[start : start + 8])

    def test_none_invalid(self):
        out, mask = chunk_embedding(None, 8, "first", 4)
        assert not mask.any() and not out.any()


class TestCollates:
    def test_fixed_length_shapes(self, rng):
        items = _items(rng)
        b = collate_fixed_length(items, chunk_size=32)
        assert b.embeddings.shape == (3, 2, 32, 8)
        assert b.masks.shape == (3, 2, 32)
        labels, idx, emb, mask = b.flatten_versions()
        assert labels.shape == (6,) and idx.shape == (6,)
        np.testing.assert_array_equal(labels, [0, 0, 1, 1, 2, 2])
        np.testing.assert_array_equal(idx, [100, 101, 110, 111, 120, 121])

    def test_sbert_override(self, rng):
        items = [(0, [(1, rng.normal(size=(1, 8)).astype(np.float32)), (2, rng.normal(size=(1, 8)).astype(np.float32))])]
        b = collate_fixed_length(items, chunk_size=100)
        assert b.embeddings.shape == (1, 2, 1, 8)  # length forced to 1

    def test_clews_override(self, rng):
        items = [(0, [(1, rng.normal(size=(16, 32)).astype(np.float32)), (2, rng.normal(size=(16, 32)).astype(np.float32))])]
        b = collate_fixed_length(items, chunk_size=100, embedding_type="clews")
        assert b.embeddings.shape == (1, 2, 16, 32)
        assert b.masks.all()

    def test_avg_pool(self, rng):
        items = _items(rng)
        b = collate_avg_pool(items)
        assert b.embeddings.shape == (3, 2, 8)
        want = np.asarray(items[0][1][0][1]).mean(axis=0)
        np.testing.assert_allclose(b.embeddings[0, 0], want, rtol=1e-5)
        assert b.masks.all()

    def test_avg_pool_missing(self, rng):
        items = [(0, [(1, None), (2, rng.normal(size=(4, 8)).astype(np.float32))])]
        b = collate_avg_pool(items)
        assert not b.masks[0, 0] and b.masks[0, 1]

    def test_overlapping(self, rng):
        # T=25, chunk=10, overlap 0.5 -> stride 5 -> starts 0,5,10,15 -> 4 chunks
        emb = rng.normal(size=(25, 4)).astype(np.float32)
        items = [(7, [(42, emb)])]
        b = collate_overlapping(items, chunk_size=10, overlap=0.5, chunk_bucket=8)
        assert b.n_chunks == 4
        assert b.embeddings.shape == (8, 10, 4)  # padded to bucket
        assert b.chunk_valid.sum() == 4
        np.testing.assert_array_equal(b.chunk_info[0], [0, 0, 0])
        np.testing.assert_array_equal(b.chunk_info[3], [0, 0, 3])
        np.testing.assert_allclose(b.embeddings[1], emb[5:15], rtol=1e-6)
        np.testing.assert_array_equal(b.clique_ids[:4], [7] * 4)

    def test_overlapping_short_single_chunk(self, rng):
        emb = rng.normal(size=(6, 4)).astype(np.float32)
        b = collate_overlapping([(0, [(1, emb)])], chunk_size=10, overlap=0.9, chunk_bucket=4)
        assert b.n_chunks == 1
        assert b.masks[0].sum() == 6

    def test_overlapping_default_stride(self, rng):
        # reference default: chunk 1000, overlap 0.9 -> stride 100
        emb = rng.normal(size=(1200, 4)).astype(np.float32)
        b = collate_overlapping([(0, [(1, emb)])], chunk_size=1000, overlap=0.9, chunk_bucket=4)
        assert b.n_chunks == 3  # starts 0, 100, 200


@pytest.fixture
def toy_md():
    info = {}
    splits = {"train": {}, "val": {}, "test": {}}
    for ci, (clique, nv) in enumerate([("A", 3), ("B", 2)]):
        splits["train"][clique] = []
        for v in range(nv):
            key = f"{clique}-{v}"
            info[key] = {
                "id": 1000 * ci + v,
                "clique": clique,
                "clique_idx": ci,
                "version_idx": len(info),
                "filename": key + ".mp3",
                "version_key": key,
            }
            splits["train"][clique].append(key)
    splits["val"]["C"] = ["C-0", "C-1"]
    for v in range(2):
        key = f"C-{v}"
        info[key] = {
            "id": 2000 + v, "clique": "C", "clique_idx": 2,
            "version_idx": len(info), "filename": key + ".mp3", "version_key": key,
        }
    return Metadata("lyric-covers", info, splits)


class TestSampler:
    def test_split_labels_offsets(self, toy_md):
        labels = split_clique_labels(toy_md)
        assert labels["train"] == {"A": 0, "B": 1}
        assert labels["val"] == {"C": 2}

    def test_item_structure(self, toy_md, rng):
        load = lambda v: rng.normal(size=(10, 4)).astype(np.float32)
        s = CliqueSampler(toy_md, "train", load, n_per_class=2, seed=0)
        assert len(s) == 5
        label, versions = s.sample_item(0)
        assert label in (0, 1)
        assert len(versions) == 2
        anchor_id = versions[0][0]
        assert anchor_id == toy_md.info[s.versions[0]]["id"]
        # positive from same clique, different version (pool has others)
        assert versions[1][0] != anchor_id

    def test_p_samesong_forces_repeat(self, toy_md, rng):
        load = lambda v: np.zeros((4, 2), np.float32)
        s = CliqueSampler(toy_md, "train", load, n_per_class=2, p_samesong=1.0, seed=0)
        label, versions = s.sample_item(0)
        assert versions[0][0] == versions[1][0]  # always self-repeat

    def test_epoch_batches(self, toy_md):
        load = lambda v: np.zeros((4, 2), np.float32)
        s = CliqueSampler(toy_md, "train", load, seed=1)
        batches = list(s.epoch(batch_size=2))
        assert len(batches) == 2  # 5 versions -> 2 full batches, drop last
        assert all(len(b) == 2 for b in batches)

    def test_more_positives_than_pool(self, toy_md):
        load = lambda v: np.zeros((4, 2), np.float32)
        s = CliqueSampler(toy_md, "train", load, n_per_class=4, seed=2)
        # clique B has 2 versions; need 3 positives -> falls back to repeats
        idx = s.versions.index("B-0")
        label, versions = s.sample_item(idx)
        assert len(versions) == 4


class TestTranscription:
    def test_valid_text(self):
        v = TranscriptionValidator()
        text = (
            "The quick brown fox jumps over the lazy dog tonight. "
            "We sing a different story every single day my friend. "
            "Nothing ever stays the same in this little town of ours."
        )
        assert v.is_valid_transcription(text)

    def test_too_short(self):
        assert not TranscriptionValidator().is_valid_transcription("hello world")

    def test_symbols_only(self):
        assert TranscriptionValidator().is_only_symbols("... !!! ???")
        assert not TranscriptionValidator().is_only_symbols("hello world 123")

    def test_musical(self):
        v = TranscriptionValidator()
        assert v.is_musical_content("♪♪♪ ♪♪")
        assert v.is_musical_content("(music playing)")
        assert v.is_musical_content("la la la la la la forever")
        assert not v.is_musical_content("the rain in spain stays mainly in the plain")

    def test_repetition(self):
        v = TranscriptionValidator()
        assert v.has_excessive_repetition("thank you " * 20)
        long_ok = (
            "one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen sixteen"
        )
        assert not v.has_excessive_repetition(long_ok)

    def test_repeated_phrases(self):
        v = TranscriptionValidator()
        assert v.has_repeated_phrases("same line here. same line here. same line here. other.")

    def test_clean_text(self):
        v = TranscriptionValidator()
        out = v.clean_text("Hello [0:12] (applause) WORLD um don't!")
        assert out == "hello world don't"

    def test_details(self):
        d = TranscriptionValidator().get_validation_details("♪♪♪♪♪")
        assert not d["is_valid"]
        assert "musical_content" in d["issues"]

    def test_cache_index_and_persist(self, tmp_path):
        root = tmp_path / "trans"
        (root / "sub").mkdir(parents=True)
        (root / "sub" / "A-0.txt").write_text("hello " * 20)
        (root / "A-1.txt").write_text("♪♪♪")
        cache = TranscriptionCache(tmp_path / "cache", "shs", "turbo", "train")
        n = cache.build_index(root)
        assert n == 2
        assert cache.get("A-0").startswith("hello")
        assert cache.get("missing") is None
        census = cache.validate_all(["A-0", "A-1", "nope"])
        assert not census["A-1"]["has_valid_transcription"]
        assert census["nope"]["details"]["issues"] == ["missing"]
        cache.save_disk_cache()
        cache2 = TranscriptionCache(tmp_path / "cache", "shs", "turbo", "train")
        assert cache2.load_disk_cache()
        assert cache2.get("A-0").startswith("hello")


class TestEmbeddingStore:
    def test_roundtrip_fp16(self, tmp_path, rng):
        store = EmbeddingStore(tmp_path, "lyric-covers")
        x = rng.normal(size=(10, 8)).astype(np.float32)
        store.save("42", "x_concat.npz", embeddings=x)
        out = store.load("42", "x_concat.npz")
        assert out["embeddings"].dtype == np.float32
        np.testing.assert_allclose(out["embeddings"], x, atol=1e-2)  # fp16 on disk

    def test_shs_layout(self, tmp_path, rng):
        store = EmbeddingStore(tmp_path, "shs")
        store.save("12-3", "x_all.npz", a=np.ones(4, np.float32))
        assert (tmp_path / "12" / "12-3" / "x_all.npz").exists()
        assert store.exists("12-3", "x_all.npz")
        assert store.load("12-3", "x_all.npz") is not None

    def test_missing_returns_none(self, tmp_path):
        store = EmbeddingStore(tmp_path, "lyric-covers")
        assert store.load("7", "x_concat.npz") is None

    def test_verify_worklists(self, tmp_path, toy_md):
        store = EmbeddingStore(tmp_path / "emb", "lyric-covers")
        store.save("A-0", "x_concat.npz", embeddings=np.ones(4, np.float32))
        missing = store.verify(toy_md, "x_concat.npz", out_dir=tmp_path / "audit")
        assert "A-1" in missing["train"] and "A-0" not in missing["train"]
        txt = (tmp_path / "audit" / "missing_embeddings_x_concat.txt").read_text()
        assert "A-1" in txt and "C-0" in txt
