"""Tests for the native C++ host data plane (compiled on demand via g++)."""

import math
import wave

import numpy as np
import pytest

from wealy_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ not available to build native library"
)


def _wav_bytes(x, sr=16000, width=2, n_ch=1):
    import io

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(width)
        w.setframerate(sr)
        x = np.clip(x, -1.0, 1.0)
        if width == 2:
            w.writeframes((x * 32767).astype("<i2").tobytes())
        elif width == 4:
            # float64: float32 rounds 1.0 * (2^31 - 1) up to 2^31 (overflow)
            w.writeframes((x.astype(np.float64) * 2147483647).astype("<i4").tobytes())
        elif width == 1:
            w.writeframes(((x * 127) + 128).astype(np.uint8).tobytes())
    return buf.getvalue()


class TestWavDecode:
    def test_pcm16_matches_python(self, rng):
        x = (rng.normal(size=8000) * 0.4).astype(np.float32)
        data = _wav_bytes(x, sr=22050)
        y, sr = native.decode_wav_bytes(data)
        assert sr == 22050
        np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1e-3)

    def test_pcm32(self, rng):
        x = (rng.normal(size=1000) * 0.4).astype(np.float32)
        y, sr = native.decode_wav_bytes(_wav_bytes(x, width=4))
        np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1e-5)

    def test_stereo_downmix(self):
        left = np.full(500, 0.5, np.float32)
        right = np.zeros(500, np.float32)
        inter = np.stack([left, right], 1).reshape(-1)
        y, _ = native.decode_wav_bytes(_wav_bytes(inter, n_ch=2))
        np.testing.assert_allclose(y, 0.25, atol=1e-3)

    def test_float32_wav(self):
        # hand-rolled float WAV (wave module can't write format 3)
        import struct

        x = np.linspace(-0.9, 0.9, 100).astype(np.float32)
        payload = x.tobytes()
        fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
        data = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        y, sr = native.decode_wav_bytes(data)
        np.testing.assert_allclose(y, x, atol=1e-6)

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            native.decode_wav_bytes(b"not a wav file at all")

    def test_load_audio_uses_native(self, tmp_path, rng):
        from wealy_tpu.audio.decode import load_audio

        x = (rng.normal(size=16000) * 0.4).astype(np.float32)
        p = tmp_path / "t.wav"
        p.write_bytes(_wav_bytes(x))
        y = load_audio(p)
        np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1e-3)


class TestResampleNative:
    def test_matches_jax_path(self):
        from wealy_tpu.audio.resample import _design_lowpass, resample

        sr_in, sr_out = 44100, 16000
        g = math.gcd(sr_in, sr_out)
        L, M = sr_out // g, sr_in // g
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        taps = _design_lowpass(L, M)
        got = native.resample_native(x, L, M, taps)
        want = np.asarray(resample(x, sr_in, sr_out))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_identity_ratio(self):
        from wealy_tpu.audio.resample import _design_lowpass

        x = np.random.default_rng(0).normal(size=1000).astype(np.float32)
        taps = _design_lowpass(1, 1)
        y = native.resample_native(x, 1, 1, taps)
        # L=M=1 is lowpass at Nyquist: near-identity away from edges
        np.testing.assert_allclose(y[50:-50], x[50:-50], atol=1e-2)


class TestPackChunks:
    def test_pad_and_split(self):
        x = np.arange(10, dtype=np.float32)
        out = native.pack_chunks_native(x, 4)
        assert out.shape == (3, 4)
        np.testing.assert_array_equal(out[0], [0, 1, 2, 3])
        np.testing.assert_array_equal(out[2], [8, 9, 0, 0])

    def test_matches_python_chunker(self, rng):
        from wealy_tpu.models.whisper.extract import chunk_waveform

        x = rng.normal(size=100_000).astype(np.float32)
        got = native.pack_chunks_native(x, 48000)
        want = chunk_waveform(x, 48000)
        np.testing.assert_array_equal(got, want)
