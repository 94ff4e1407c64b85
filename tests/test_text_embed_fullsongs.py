"""Tests for the text-embedding stage, fullsongs collate, and full-state
checkpointing."""

import numpy as np
import pytest

from wealy_tpu.data.chunking import collate_full_songs
from wealy_tpu.data.text_embed import HashedNgramEmbedder, extract_text_embeddings


class TestHashedNgram:
    def test_deterministic_and_normalized(self):
        e = HashedNgramEmbedder(dim=64)
        a = e.embed(["hello world", "hello world"])
        np.testing.assert_array_equal(a[0], a[1])
        np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)

    def test_similar_texts_closer(self):
        e = HashedNgramEmbedder(dim=256)
        z = e.embed([
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumped over the lazy dogs",
            "completely unrelated lyrics about love and rain",
        ])
        sim_close = z[0] @ z[1]
        sim_far = z[0] @ z[2]
        assert sim_close > sim_far + 0.2

    def test_empty_text(self):
        z = HashedNgramEmbedder(dim=32).embed([""])
        np.testing.assert_array_equal(z, np.zeros((1, 32), np.float32))


class TestExtractTextEmbeddings:
    def test_store_layout(self, tmp_path):
        from wealy_tpu.data.embedding_store import EmbeddingStore

        store = EmbeddingStore(tmp_path, "lyric-covers")
        result = extract_text_embeddings(
            HashedNgramEmbedder(dim=48),
            store,
            {"100": "some lyric text here", "101": None, "102": "more words"},
        )
        assert result["done"] == ["100", "102"]
        assert result["skipped_no_text"] == ["101"]
        out = store.load("100", "hs_sbert.npz")
        assert out["embeddings"].shape == (1, 48)  # sbert-like (1, dim)


class TestFullSongsCollate:
    def test_bucketed_padding(self, rng):
        items = [
            (0, [(1, rng.normal(size=(300, 8)).astype(np.float32)),
                 (2, rng.normal(size=(513, 8)).astype(np.float32))]),
        ]
        b = collate_full_songs(items, length_bucket=256)
        assert b.embeddings.shape == (1, 2, 768, 8)  # 513 -> 768 bucket
        assert b.masks[0, 0].sum() == 300
        assert b.masks[0, 1].sum() == 513

    def test_max_length_cap(self, rng):
        items = [(0, [(1, rng.normal(size=(1000, 4)).astype(np.float32))])]
        b = collate_full_songs(items, length_bucket=256, max_length=512)
        assert b.embeddings.shape == (1, 1, 512, 4)

    def test_factory_dispatch(self, rng):
        from wealy_tpu.data.collate_factory import create_collate_fn
        from wealy_tpu.train.config import Config

        config = Config.from_dict({"data": {"fullsongs": True}, "model": {"name": "whisper"}})
        fn = create_collate_fn(config)
        items = [(0, [(1, rng.normal(size=(100, 4)).astype(np.float32)),
                      (2, rng.normal(size=(50, 4)).astype(np.float32))])]
        b = fn(items)
        assert b.embeddings.shape[2] == 256  # bucketed full length


class TestFullStateCheckpoint:
    def test_save_restore_state(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from wealy_tpu.models.heads import ProjectionHead
        from wealy_tpu.train import create_train_state
        from wealy_tpu.train.checkpoint import CheckpointManager
        from wealy_tpu.train.state import make_optimizer

        model = ProjectionHead(zdim=8, hidden=(8,))
        state = create_train_state(
            model, (jnp.zeros((2, 4, 8)), jnp.ones((2, 4), bool)),
            tx=make_optimizer(lr=1e-2, warmup_steps=1, max_steps=10),
        )
        # take a step so opt_state is non-trivial
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        state = state.apply_gradients(grads)
        mgr = CheckpointManager(tmp_path / "ck")
        mgr.save_state(state)

        fresh = create_train_state(
            model, (jnp.zeros((2, 4, 8)), jnp.ones((2, 4), bool)),
            tx=make_optimizer(lr=1e-2, warmup_steps=1, max_steps=10),
        )
        restored = mgr.restore_state(fresh)
        assert int(restored.step) == 1
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        oa = jax.tree_util.tree_leaves(state.opt_state)[0]
        ob = jax.tree_util.tree_leaves(restored.opt_state)[0]
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob))
