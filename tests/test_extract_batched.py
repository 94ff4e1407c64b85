"""Tests for the batched extraction driver: cross-song chunk batching,
resume-skip, completeness of per-song accumulators."""

import json
import wave

import numpy as np
import pandas as pd
import pytest

from wealy_tpu.cli.extract_batched import extract_split_batched
from wealy_tpu.data.embedding_store import EmbeddingStore
from wealy_tpu.data.metadata import load_lyric_covers
from wealy_tpu.train.config import Config


@pytest.fixture
def setup(tmp_path, monkeypatch):
    lc = tmp_path / "lc"
    lc.mkdir()
    rows = {
        "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A"),
                  (2, 200, False, "o", "B")],
        "val": [], "test": [],
    }
    for split, data in rows.items():
        pd.DataFrame(
            data, columns=["original_id", "id", "is_cover", "song_text_type", "label"]
        ).to_csv(lc / f"{split}_no_dup.csv", index=False)
    md = load_lyric_covers(lc)

    # songs of 1, 2 and 3 chunk lengths (shrink N_SAMPLES via monkeypatch to
    # keep it fast: patch chunking at the driver level)
    import wealy_tpu.cli.extract_batched as EB

    monkeypatch.setattr(EB, "N_SAMPLES", 1000)
    monkeypatch.setattr(
        EB, "chunk_waveform", lambda a: __import__(
            "wealy_tpu.models.whisper.extract", fromlist=["chunk_waveform"]
        ).chunk_waveform(a, 1000)
    )

    durations = {"100": 900, "101": 1800, "200": 2600}

    import wealy_tpu.data.audio_dataset as AD

    def fake_find(ds, root, key):
        return key  # sentinel; load_audio patched below

    monkeypatch.setattr(AD, "find_audio_path", fake_find)
    monkeypatch.setattr(
        AD, "load_audio",
        lambda path, sr=16000: np.full(durations[str(path)], float(str(path)) / 1000, np.float32),
    )

    config = Config.from_dict(
        {
            "path": {
                "lyric_covers_data": str(lc),
                "hidden_states": str(tmp_path / "hs"),
                "cache": str(tmp_path / "cache"),
                "data": str(tmp_path / "data"),
            },
            "data": {"dataset_name": "lyric-covers"},
        }
    )
    return config, md, tmp_path


def _mean_embed(audio):
    # fake embed_fn: per-chunk mean + index so scatter order is checkable
    import jax.numpy as jnp

    return jnp.stack([jnp.mean(audio, axis=1), jnp.max(audio, axis=1)], axis=1)


class TestBatchedExtraction:
    def test_all_songs_complete(self, setup):
        config, md, tmp_path = setup
        result = extract_split_batched(
            config, md, "train", _mean_embed, kind="x_concat", batch_size=4
        )
        assert sorted(result["done"]) == ["100", "101", "200"]
        assert result["incomplete"] == []
        store = EmbeddingStore(config.path.hidden_states, "lyric-covers")
        out = store.load("200", "x_concat.npz")
        assert out["embeddings"].shape == (3, 2)  # 2600 samples -> 3 chunks
        # first chunk full of 0.2 -> mean 0.2; last chunk 600/1000 filled
        np.testing.assert_allclose(out["embeddings"][0, 0], 0.2, atol=1e-3)
        np.testing.assert_allclose(out["embeddings"][2, 0], 0.2 * 0.6, atol=1e-3)

    def test_resume_skips_existing(self, setup):
        config, md, tmp_path = setup
        store = EmbeddingStore(config.path.hidden_states, "lyric-covers")
        store.save("100", "x_concat.npz", embeddings=np.zeros((1, 2), np.float32))
        result = extract_split_batched(
            config, md, "train", _mean_embed, kind="x_concat", batch_size=4
        )
        assert result["skipped"] == 1
        assert sorted(result["done"]) == ["101", "200"]

    def test_throughput_reported(self, setup):
        config, md, _ = setup
        result = extract_split_batched(
            config, md, "train", _mean_embed, kind="x_concat", batch_size=2
        )
        assert result["throughput"]["total_items"] == 6  # 1+2+3 chunks


class TestMultiWorkerDecode:
    def test_parallel_decode_matches_serial(self, setup):
        config, md, tmp_path = setup
        r1 = extract_split_batched(
            config, md, "train", _mean_embed, kind="x_concat",
            batch_size=4, overwrite=True, n_workers=1,
        )
        store = EmbeddingStore(config.path.hidden_states, "lyric-covers")
        serial = {k: store.load(k, "x_concat.npz")["embeddings"] for k in r1["done"]}
        r2 = extract_split_batched(
            config, md, "train", _mean_embed, kind="x_concat",
            batch_size=4, overwrite=True, n_workers=3,
        )
        assert sorted(r2["done"]) == sorted(r1["done"])
        for k, v in serial.items():
            np.testing.assert_allclose(
                store.load(k, "x_concat.npz")["embeddings"], v, atol=1e-6
            )


class TestBatchedDecoderExtraction:
    def _decode_fn(self, audio):
        import jax.numpy as jnp

        # fake decoder: 3 hidden positions per chunk, length = 2 or 3 by parity
        B = audio.shape[0]
        base = jnp.mean(audio, axis=1, keepdims=True)  # (B, 1)
        hidden = jnp.stack([base + i for i in range(3)], axis=1)  # (B, 3, 1)
        hidden = jnp.concatenate([hidden, hidden], axis=-1)  # (B, 3, 2)
        lengths = jnp.where(jnp.arange(B) % 2 == 0, 2, 3)
        return hidden, lengths

    def test_hs_last_all_layout(self, setup):
        from wealy_tpu.cli.extract_batched import extract_split_batched_decoder

        config, md, tmp_path = setup
        result = extract_split_batched_decoder(
            config, md, "train", self._decode_fn, kind="hs_last_all",
            batch_size=4, overwrite=True,
        )
        assert sorted(result["done"]) == ["100", "101", "200"]
        store = EmbeddingStore(config.path.hidden_states, "lyric-covers")
        out = store.load("200", "hs_last_all.npz")
        assert out["embeddings"].shape == (3, 3, 2)  # (n_chunks, max_len, D)
        assert out["lengths"].shape == (3,)

    def test_hs_last_seq_flattened(self, setup):
        from wealy_tpu.cli.extract_batched import extract_split_batched_decoder

        config, md, tmp_path = setup
        result = extract_split_batched_decoder(
            config, md, "train", self._decode_fn, kind="hs_last_seq",
            batch_size=4, overwrite=True,
        )
        store = EmbeddingStore(config.path.hidden_states, "lyric-covers")
        out = store.load("101", "hs_last_seq.npz")
        # 2 chunks, lengths in {2,3} -> flattened total in [4, 6]
        assert out["embeddings"].ndim == 2 and out["embeddings"].shape[1] == 2
        assert 4 <= out["embeddings"].shape[0] <= 6


class TestWealyEmbedFn:
    def test_wealy_chunks_through_head(self, setup, monkeypatch):
        """hs_wealy_concat production path: encoder+head per chunk via the
        batched driver; per-song file shape (n_chunks, zdim)."""
        import jax
        import jax.numpy as jnp

        config, md, tmp_path = setup
        config.model.zdim = 16

        from wealy_tpu.models.whisper import Whisper, WhisperConfig
        import wealy_tpu.cli.extract as EX
        import wealy_tpu.cli.extract_batched as EB

        cfg = WhisperConfig(
            n_mels=80, n_audio_ctx=4, n_audio_state=16, n_audio_head=2,
            n_audio_layer=1, n_vocab=32, n_text_ctx=4, n_text_state=16,
            n_text_head=2, n_text_layer=1,
        )

        def small_loader(config, hf_checkpoint=None):
            model = Whisper(cfg, dtype=jnp.float32)
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 80, 8)), jnp.zeros((1, 2), jnp.int32)
            )["params"]
            return model, params, cfg

        monkeypatch.setattr(EX, "load_whisper_model", small_loader)
        # shrink the mel frontend to the toy chunk length (monkeypatched
        # N_SAMPLES=1000 in the fixture): use a fake mel of 8 frames
        monkeypatch.setattr(
            EB, "make_wealy_embed_fn", EB.make_wealy_embed_fn
        )

        from wealy_tpu.models.heads import ProjectionHead

        head = ProjectionHead(zdim=16, hidden=(16,), dtype=jnp.float32)
        model, params, _ = small_loader(config)
        enc0 = jnp.zeros((1, 4, 16), jnp.float32)
        head_params = head.init(jax.random.PRNGKey(1), enc0, jnp.ones((1, 4), bool))["params"]

        def embed_fn(audio):
            # stand-in for mel+encoder: pool audio into a (B, 4, 16) sequence
            B = audio.shape[0]
            seq = audio[:, : 4 * 16].reshape(B, 4, 16)
            mask = jnp.ones((B, 4), bool)
            return head.apply({"params": head_params}, jnp.asarray(seq), mask)

        result = extract_split_batched(
            config, md, "train", embed_fn, kind="hs_wealy_concat",
            batch_size=4, overwrite=True,
        )
        assert sorted(result["done"]) == ["100", "101", "200"]
        store = EmbeddingStore(config.path.hidden_states, "lyric-covers")
        out = store.load("200", "hs_wealy_concat.npz")
        assert out["embeddings"].shape == (3, 16)  # (n_chunks, zdim)


class TestDirectPackSink:
    """`extract --pack-direct` (round-2 VERDICT item 8): completed songs
    stream straight into a PackWriter — no per-version npz intermediate."""

    def test_sink_produces_identical_pack(self, setup, tmp_path):
        from wealy_tpu.data.packed_store import PackedStore, PackWriter

        config, md, _ = setup
        writer = PackWriter(
            config.path.hidden_states, "x_concat", dataset_name="lyric-covers"
        )
        result = extract_split_batched(
            config, md, "train", _mean_embed, kind="x_concat", batch_size=4,
            sink=lambda v, **a: writer.add(v, a["embeddings"]),
            skip_fn=lambda v: v in writer,
        )
        packed = writer.close()
        assert sorted(result["done"]) == ["100", "101", "200"]
        # NO per-version npz was written
        store = EmbeddingStore(config.path.hidden_states, "lyric-covers")
        assert not store.exists("100", "x_concat.npz")
        # pack content matches what the npz+repack route would produce
        out = packed.load("200")
        assert out.shape == (3, 2)
        np.testing.assert_allclose(out[0, 0], 0.2, atol=1e-3)
        # reader namespacing holds
        assert PackedStore(
            config.path.hidden_states, "x_concat", dataset_name="lyric-covers"
        ).available

    def test_seed_from_carries_old_pack_forward(self, setup):
        from wealy_tpu.data.packed_store import PackedStore, PackWriter

        config, md, _ = setup
        root = config.path.hidden_states
        old = PackedStore.pack(
            root, "x_concat",
            [("100", np.full((1, 2), 7.0, np.float32))],
            dataset_name="lyric-covers",
        )
        writer = PackWriter(root, "x_concat", dataset_name="lyric-covers")
        assert writer.seed_from(old, ["100"]) == 1
        result = extract_split_batched(
            config, md, "train", _mean_embed, kind="x_concat", batch_size=4,
            sink=lambda v, **a: writer.add(v, a["embeddings"]),
            skip_fn=lambda v: v in writer,
        )
        packed = writer.close()
        # 100 resumed from the old pack (not re-extracted), 101/200 fresh
        assert result["skipped"] == 1
        assert sorted(result["done"]) == ["101", "200"]
        np.testing.assert_allclose(packed.load("100"), 7.0)
        assert packed.load("200").shape == (3, 2)

    def test_writer_abort_leaves_no_pack(self, tmp_path):
        from wealy_tpu.data.packed_store import PackedStore, PackWriter

        writer = PackWriter(tmp_path, "k", dataset_name="d")
        writer.add("a", np.ones((2, 4), np.float32))
        writer.abort()
        assert not PackedStore(tmp_path, "k", dataset_name="d").available
        assert not list(tmp_path.glob(".*tmp"))

    def test_old_pack_readable_until_close(self, tmp_path):
        """Atomicity: a reader opened mid-write sees the OLD pack."""
        from wealy_tpu.data.packed_store import PackedStore, PackWriter

        old = PackedStore.pack(
            tmp_path, "k", [("a", np.full((1, 4), 1.0))], dataset_name="d"
        )
        writer = PackWriter(tmp_path, "k", dataset_name="d")
        writer.add("a", np.full((1, 4), 2.0))
        mid = PackedStore(tmp_path, "k", dataset_name="d")
        np.testing.assert_allclose(mid.load("a"), 1.0)  # still the old rows
        writer.close()
        new = PackedStore(tmp_path, "k", dataset_name="d")
        np.testing.assert_allclose(new.load("a"), 2.0)


class TestQuantInt8Extraction:
    def test_quant_embed_close_to_bf16(self, tmp_path):
        """make_encoder_embed_fn(quant_int8=True): the W8A8 encoder's
        mean-pooled clip embeddings stay near-collinear with the bf16
        path's on the dev model (full 30 s mel -> encoder -> pool)."""
        from wealy_tpu.audio.mel import N_SAMPLES
        from wealy_tpu.cli.extract_batched import make_encoder_embed_fn

        config = Config.from_dict({
            "path": {"lyric_covers_data": str(tmp_path),
                     "hidden_states": str(tmp_path / "hs"),
                     "cache": str(tmp_path / "cache")},
            "data": {"dataset_name": "lyric-covers"},
            "model": {"name": "whisper", "whisper_size": "dev"},
        })
        rng = np.random.default_rng(0)
        audio = (rng.normal(size=(2, N_SAMPLES)) * 0.1).astype(np.float32)
        a = np.asarray(make_encoder_embed_fn(config)(audio), np.float32)
        b = np.asarray(
            make_encoder_embed_fn(config, quant_int8=True)(audio), np.float32
        )
        assert a.shape == b.shape
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        )
        assert cos.min() > 0.99, cos

    def test_cli_rejects_quant_for_decoder_kinds(self, tmp_path):
        import json as _json

        from wealy_tpu.cli.main import main

        conf = tmp_path / "c.json"
        conf.write_text(_json.dumps({
            "path": {"lyric_covers_data": str(tmp_path),
                     "hidden_states": str(tmp_path / "hs"),
                     "cache": str(tmp_path / "cache")},
            "data": {"dataset_name": "lyric-covers"},
            "model": {"name": "whisper", "whisper_size": "dev"},
        }))
        assert main(["extract", "--config", str(conf), "--batched",
                     "--kinds", "hs_last_seq", "--quant-int8"]) == 2
        assert main(["extract", "--config", str(conf),
                     "--kinds", "x_concat", "--quant-int8"]) == 2
