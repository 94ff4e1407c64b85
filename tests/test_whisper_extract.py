"""Tests for the extraction taxonomy: chunking, encoder/decoder kinds,
all-layer hiddens, language detection."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wealy_tpu.models.whisper import Whisper, WhisperConfig
from wealy_tpu.models.whisper.extract import (
    chunk_waveform,
    extract_song,
    flatten_decoder_sequence,
)
from wealy_tpu.models.whisper.generate import detect_language


@pytest.fixture(scope="module")
def tiny():
    cfg = WhisperConfig(
        n_mels=80,
        n_audio_ctx=1500,
        n_audio_state=32,
        n_audio_head=2,
        n_audio_layer=1,
        n_vocab=51865,
        n_text_ctx=32,
        n_text_state=32,
        n_text_head=2,
        n_text_layer=2,
    )
    model = Whisper(cfg, dtype=jnp.float32)
    mel0 = jnp.zeros((1, 80, 3000), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), mel0, jnp.zeros((1, 4), jnp.int32)
    )["params"]
    return model, params, cfg


class TestChunking:
    def test_exact_multiple(self):
        x = np.ones(480000 * 2, np.float32)
        assert chunk_waveform(x).shape == (2, 480000)

    def test_short_padded(self):
        x = np.ones(1000, np.float32)
        out = chunk_waveform(x)
        assert out.shape == (1, 480000)
        np.testing.assert_allclose(out[0, 1000:], 0.0)

    def test_flatten_sequence(self, rng):
        h = rng.normal(size=(2, 10, 8)).astype(np.float32)
        flat = flatten_decoder_sequence(h, np.array([3, 5]))
        assert flat.shape == (8, 8)
        np.testing.assert_allclose(flat[:3], h[0, :3])
        np.testing.assert_allclose(flat[3:], h[1, :5])


class TestExtractSong:
    def test_encoder_kinds(self, tiny, rng):
        model, params, cfg = tiny
        audio = rng.normal(size=16000).astype(np.float32) * 0.1
        out = extract_song(model, params, audio, cfg, kinds=("x_concat", "x_all"))
        assert out["x_concat"].shape == (1, 32)
        assert out["x_all"].shape == (1, 1500, 32)

    def test_decoder_kinds_and_hs_all(self, tiny, rng):
        model, params, cfg = tiny
        audio = rng.normal(size=16000).astype(np.float32) * 0.1
        out = extract_song(
            model, params, audio, cfg,
            kinds=("hs_last_seq", "hs_last_all", "hs_all"), max_len=8,
        )
        assert out["hs_last_all"].shape == (1, 8, 32)
        L = int(out["hs_last_all_lengths"][0])
        assert out["hs_last_seq"].shape == (L, 32)
        # embedding output + 2 decoder blocks
        assert out["hs_all"].shape == (3, 1, 8, 32)

    def test_en_variant_runs(self, tiny, rng):
        model, params, cfg = tiny
        audio = rng.normal(size=16000).astype(np.float32) * 0.1
        out = extract_song(model, params, audio, cfg, kinds=("hs_last_seq_en",), max_len=6)
        assert out["hs_last_seq_en"].ndim == 2


class TestDetectLanguage:
    def test_shapes_and_range(self, tiny, rng):
        model, params, cfg = tiny
        enc = model.apply(
            {"params": params},
            jnp.asarray(rng.normal(size=(2, 80, 3000)).astype(np.float32) * 0.1),
            method=Whisper.encode,
        )
        lang, logp = detect_language(model, params, enc, cfg)
        assert lang.shape == (2,) and logp.shape == (2, 99)
        assert (np.asarray(lang) >= 0).all() and (np.asarray(lang) < 99).all()
        np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0, rtol=1e-4)
