"""Tests for the CQT frontend, BPE tokenizer, profiling utils, multihost."""

import json

import numpy as np
import pytest

from wealy_tpu.audio.cqt import cqt_filterbank, cqt_spectrogram
from wealy_tpu.data.tokenizer import ByteLevelBPE
from wealy_tpu.utils.profiling import ThroughputMeter, trace_span


class TestCQT:
    def test_filterbank_shape_and_coverage(self):
        fb = cqt_filterbank(n_bins=84)
        assert fb.shape == (1025, 84)
        assert fb.min() >= 0
        # every bin has some support
        assert (fb.sum(axis=0) > 0).all()

    def test_tone_lands_in_right_bin(self):
        # 440 Hz = A4 = C1 * 2**(45/12) -> bin index 45
        sr = 16000
        t = np.arange(sr * 2) / sr
        x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        cqt = np.asarray(cqt_spectrogram(x))
        assert cqt.shape[0] == 84
        profile = cqt.mean(axis=1)
        assert abs(int(profile.argmax()) - 45) <= 1

    def test_octave_shift_moves_12_bins(self):
        sr = 16000
        t = np.arange(sr) / sr
        a = np.asarray(cqt_spectrogram(np.sin(2 * np.pi * 220.0 * t).astype(np.float32)))
        b = np.asarray(cqt_spectrogram(np.sin(2 * np.pi * 440.0 * t).astype(np.float32)))
        assert abs((b.mean(1).argmax() - a.mean(1).argmax()) - 12) <= 1

    def test_batched(self, rng):
        x = rng.normal(size=(2, 16000)).astype(np.float32)
        out = cqt_spectrogram(x)
        assert out.ndim == 3 and out.shape[0] == 2 and out.shape[1] == 84

    def test_feeds_clews_encoder(self, rng):
        import jax
        from wealy_tpu.models.clews_encoder import ClewsEncoder

        x = rng.normal(size=(1, 16000)).astype(np.float32)
        cqt = np.asarray(cqt_spectrogram(x))[..., None]  # (1, 84, T, 1)
        # crop time to a multiple-friendly size
        cqt = cqt[:, :, :24, :]
        enc = ClewsEncoder(embed_dim=32, stem=8, stages=((8, 2),), blocks_per_stage=1)
        variables = enc.init(jax.random.PRNGKey(0), cqt, train=False)
        z = enc.apply(variables, cqt, train=False)
        assert z.shape == (1, 32)


@pytest.fixture
def bpe(tmp_path):
    # tiny vocab covering 'hello world' byte tokens
    from wealy_tpu.data.tokenizer import _bytes_to_unicode

    b2u = _bytes_to_unicode()
    chars = sorted({b2u[b] for b in "hello world!".encode()})
    vocab = {c: i for i, c in enumerate(chars)}
    # merges: he, ll, llo
    merges = [("h", "e"), ("l", "l"), ("ll", "o")]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    vocab["<|eot|>"] = 99
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version\n" + "\n".join(f"{a} {b}" for a, b in merges))
    (tmp_path / "special_tokens.json").write_text(json.dumps({"<|eot|>": 99}))
    return ByteLevelBPE.from_dir(tmp_path)


class TestBPE:
    def test_roundtrip(self, bpe):
        ids = bpe.encode("hello")
        assert bpe.decode(ids) == "hello"
        # merges applied: 'he' + 'llo'
        assert len(ids) == 2

    def test_space_handling(self, bpe):
        ids = bpe.encode("hello world")
        assert bpe.decode(ids) == "hello world"

    def test_special_tokens_skipped(self, bpe):
        ids = bpe.encode("hello") + [99]
        assert bpe.decode(ids) == "hello"
        assert bpe.decode(ids, skip_special=False).endswith("<|eot|>")

    def test_unknown_ids_ignored(self, bpe):
        assert bpe.decode([12345]) == ""


class TestProfiling:
    def test_throughput_meter(self):
        import time

        m = ThroughputMeter(window=10, n_chips=2)
        for _ in range(5):
            m.tick(8)
            time.sleep(0.01)
        r = m.report()
        assert r["total_items"] == 40
        assert r["items_per_sec"] > 0
        # compare the unrounded properties (report() rounds to 2 decimals)
        assert m.items_per_sec_per_chip == pytest.approx(m.items_per_sec / 2)

    def test_trace_span_noop(self):
        with trace_span("test"):
            x = 1 + 1
        assert x == 2


class TestMultihost:
    def test_single_process_report(self):
        from wealy_tpu.parallel.multihost import initialize_multihost, is_primary_host

        info = initialize_multihost()
        assert info["process_count"] == 1
        assert is_primary_host()


class TestMultirateCQT:
    """True (multirate) CQT vs the direct full-rate per-bin convolution."""

    def test_matches_direct_reference(self):
        from wealy_tpu.audio.cqt import cqt_multirate, direct_cqt_reference

        sr, hop = 16000, 512
        fmin = 32.703194
        t = np.arange(sr) / sr
        f1, f2, f3 = (fmin * 2 ** (k / 12) for k in (6, 42, 78))
        x = (
            0.7 * np.sin(2 * np.pi * f1 * t)
            + 0.5 * np.sin(2 * np.pi * f2 * t)
            + 0.3 * np.sin(2 * np.pi * f3 * t)
        ).astype(np.float32)
        got = np.asarray(cqt_multirate(x, hop=hop))
        want = direct_cqt_reference(x, hop=hop)
        assert got.shape == want.shape == (84, 32)
        g, w = got[:, 4:-4], want[:, 4:-4]  # interior frames
        denom = float(np.max(np.abs(w)))
        # worst case sits on the most-decimated octave (kaiser passband +
        # phase accumulation over 6 halvings); typical octaves are ~2e-4
        assert np.max(np.abs(g - w)) / denom < 0.08
        for o in range(1, 7):
            sl = slice(o * 12, (o + 1) * 12)
            assert np.max(np.abs(g[sl] - w[sl])) / denom < 0.02, o

    def test_unit_gain_at_bin_centers(self):
        from wealy_tpu.audio.cqt import cqt_multirate

        sr, fmin = 16000, 32.703194
        t = np.arange(2 * sr) / sr
        for k, amp in ((3, 1.0), (40, 0.5), (80, 0.25)):
            f = fmin * 2 ** (k / 12)
            x = (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)
            c = np.asarray(cqt_multirate(x))
            interior = c[:, 6:-6]
            peak_bin = int(interior.mean(axis=1).argmax())
            assert peak_bin == k, (peak_bin, k)
            np.testing.assert_allclose(interior[k].mean(), amp, rtol=0.02)

    def test_batched_and_jittable(self):
        import jax
        import jax.numpy as jnp

        from wealy_tpu.audio.cqt import cqt_multirate

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 16000)).astype(np.float32)
        out = np.asarray(jax.jit(cqt_multirate)(jnp.asarray(x)))
        assert out.shape == (2, 84, 32)
        single = np.asarray(cqt_multirate(x[1]))
        np.testing.assert_allclose(out[1], single, rtol=1e-5, atol=1e-6)

    def test_hop_grid_constraint(self):
        from wealy_tpu.audio.cqt import cqt_multirate

        with np.testing.assert_raises(AssertionError):
            cqt_multirate(np.zeros(16000, np.float32), hop=100)

