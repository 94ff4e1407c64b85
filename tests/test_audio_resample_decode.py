"""Tests for the polyphase resampler and the native WAV decoder."""

import wave

import numpy as np
import pytest

from wealy_tpu.audio.decode import load_audio
from wealy_tpu.audio.resample import resample


class TestResample:
    def test_identity(self):
        x = np.random.default_rng(0).normal(size=1000).astype(np.float32)
        out = np.asarray(resample(x, 16000, 16000))
        np.testing.assert_array_equal(out, x)

    def test_length_441_to_160(self):
        x = np.zeros(44100, np.float32)
        out = resample(x, 44100, 16000)
        assert out.shape[-1] == 16000

    def test_sine_preserved(self):
        # 440 Hz sine at 44.1 kHz -> 16 kHz: same frequency, ~unit amplitude
        sr_in, sr_out, f0 = 44100, 16000, 440.0
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = np.asarray(resample(x, sr_in, sr_out))
        t2 = np.arange(len(y)) / sr_out
        want = np.sin(2 * np.pi * f0 * t2)
        # ignore filter edge transients
        core = slice(1000, len(y) - 1000)
        err = np.abs(y[core] - want[core]).max()
        assert err < 5e-3, err

    def test_aliasing_rejected(self):
        # 10 kHz tone is above the 8 kHz target Nyquist: must be attenuated
        sr_in, sr_out = 48000, 16000
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * 10000 * t).astype(np.float32)
        y = np.asarray(resample(x, sr_in, sr_out))
        assert np.abs(y[1000:-1000]).max() < 1e-3

    def test_upsample(self):
        sr_in, sr_out, f0 = 8000, 16000, 440.0
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = np.asarray(resample(x, sr_in, sr_out))
        assert y.shape[-1] == sr_out
        t2 = np.arange(len(y)) / sr_out
        want = np.sin(2 * np.pi * f0 * t2)
        assert np.abs(y[1000:-1000] - want[1000:-1000]).max() < 5e-3

    def test_batched(self):
        # batched == single is a layout property, not a ratio property: use
        # the cheap 3:1 ratio (the 160:441 polyphase at 44.1k costs ~9 s of
        # compile on the 1-core CI box and is covered by the tests above)
        x = np.random.default_rng(0).normal(size=(3, 48000)).astype(np.float32)
        y = np.asarray(resample(x, 48000, 16000))
        assert y.shape == (3, 16000)
        y0 = np.asarray(resample(x[0], 48000, 16000))
        np.testing.assert_allclose(y[0], y0, rtol=1e-5, atol=1e-6)


class TestWavDecode:
    def _write_wav(self, path, x, sr, width=2, n_ch=1):
        with wave.open(str(path), "wb") as w:
            w.setnchannels(n_ch)
            w.setsampwidth(width)
            w.setframerate(sr)
            if width == 2:
                w.writeframes((x * 32767).astype("<i2").tobytes())
            elif width == 4:
                w.writeframes((x * 2147483647).astype("<i4").tobytes())

    def test_pcm16_roundtrip(self, tmp_path):
        sr = 16000
        x = (np.sin(2 * np.pi * 440 * np.arange(sr) / sr) * 0.7).astype(np.float32)
        p = tmp_path / "a.wav"
        self._write_wav(p, x, sr)
        y = load_audio(p)
        assert y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=1e-3)

    def test_pcm32_stereo_downmix(self, tmp_path):
        sr = 16000
        x = np.stack(
            [np.ones(1000, np.float32) * 0.5, np.zeros(1000, np.float32)], axis=1
        ).reshape(-1)
        p = tmp_path / "b.wav"
        self._write_wav(p, x, sr, width=4, n_ch=2)
        y = load_audio(p)
        np.testing.assert_allclose(y, 0.25, atol=1e-5)

    def test_resamples_on_load(self, tmp_path):
        sr = 44100
        x = np.zeros(sr, np.float32)
        p = tmp_path / "c.wav"
        self._write_wav(p, x, sr)
        y = load_audio(p)  # -> 16 kHz
        assert y.shape[-1] == 16000

    def test_non_wav_without_ffmpeg(self, tmp_path, monkeypatch):
        import shutil as _sh

        monkeypatch.setattr(_sh, "which", lambda _: None)
        p = tmp_path / "d.mp3"
        p.write_bytes(b"\x00")
        with pytest.raises(RuntimeError):
            load_audio(p)


class TestHostResample:
    def test_load_audio_resamples_on_host(self, tmp_path, monkeypatch):
        """44.1 kHz files resample via the native host polyphase path (no
        per-song device call from the loader threads) and match the XLA
        resampler's output."""
        from wealy_tpu import native
        from wealy_tpu.audio.decode import _host_resample
        from wealy_tpu.audio.resample import resample

        sr_in = 44100
        t = np.arange(sr_in) / sr_in
        x = (np.sin(2 * np.pi * 440.0 * t) * 0.7).astype(np.float32)
        want = np.asarray(resample(x, sr_in, 16000))
        got = _host_resample(x, sr_in, 16000)
        assert got.shape == want.shape
        if native.available():
            # native path taken: numpy output, close to the XLA reference
            assert isinstance(got, np.ndarray)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_host_resample_falls_back_without_native(self, monkeypatch):
        from wealy_tpu import native
        from wealy_tpu.audio.decode import _host_resample

        monkeypatch.setattr(native, "available", lambda: False)
        x = np.zeros(44100, np.float32)
        y = _host_resample(x, 44100, 16000)
        assert y.shape[-1] == 16000
