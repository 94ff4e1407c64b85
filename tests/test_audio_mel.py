"""Golden-parity tests for the audio frontend.

The independent reference is transformers.WhisperFeatureExtractor (pure numpy
implementation of the published Whisper mel pipeline) — BASELINE config 1.
"""

import numpy as np
import pytest

from wealy_tpu.audio import mel as Am


@pytest.fixture(scope="module")
def fe():
    from transformers import WhisperFeatureExtractor

    return WhisperFeatureExtractor()


@pytest.fixture(scope="module")
def clip():
    rng = np.random.default_rng(42)
    t = np.arange(Am.N_SAMPLES) / Am.SAMPLE_RATE
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=Am.N_SAMPLES)
    return x.astype(np.float32)


class TestMelFilterbank:
    def test_matches_transformers(self, fe):
        got = Am.mel_filterbank(80)
        want = fe.mel_filters  # (201, 80)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)

    def test_128_mels_shape(self):
        fb = Am.mel_filterbank(128)
        assert fb.shape == (201, 128)
        # triangles: every filter nonnegative, mostly sparse
        assert fb.min() >= 0

    def test_hann_window(self):
        import torch

        # torch computes the window in float32; ours is float64
        np.testing.assert_allclose(
            Am.hann_window(400), torch.hann_window(400).numpy(), rtol=0, atol=1e-6
        )


class TestLogMel:
    def test_matches_transformers(self, fe, clip):
        got = np.asarray(Am.log_mel_spectrogram(clip))
        want = fe(
            clip, sampling_rate=16000, return_tensors="np", padding="max_length"
        ).input_features[0]
        assert got.shape == want.shape == (80, 3000)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)

    def test_batched(self, clip):
        x = np.stack([clip, np.roll(clip, 1000)])
        got = np.asarray(Am.log_mel_spectrogram(x))
        assert got.shape == (2, 80, 3000)
        single = np.asarray(Am.log_mel_spectrogram(clip))
        np.testing.assert_allclose(got[0], single, rtol=1e-5, atol=1e-5)

    def test_silence(self):
        x = np.zeros(Am.N_SAMPLES, np.float32)
        got = np.asarray(Am.log_mel_spectrogram(x))
        # all-equal spectrogram: clamp makes everything (max-0 .. max); scaled
        assert np.isfinite(got).all()

    def test_pad_or_trim(self):
        short = np.ones(1000, np.float32)
        long = np.ones(Am.N_SAMPLES + 5, np.float32)
        assert Am.pad_or_trim(short).shape == (Am.N_SAMPLES,)
        assert Am.pad_or_trim(long).shape == (Am.N_SAMPLES,)
        out = np.asarray(Am.pad_or_trim(short))
        np.testing.assert_allclose(out[:1000], 1.0)
        np.testing.assert_allclose(out[1000:], 0.0)


class TestPallasMel:
    def test_matches_jnp(self, clip):
        # interpret mode runs the kernel on CPU
        from jax.experimental.pallas import tpu as pltpu

        # call the kernel path directly: the public wrapper falls back to jnp
        # on CPU, which would make this test vacuous
        from wealy_tpu.audio.pallas_mel import _log_mel_pallas_jit

        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(_log_mel_pallas_jit(clip))
        want = np.asarray(Am.log_mel_spectrogram(clip))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
