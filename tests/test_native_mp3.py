"""Native mp3 decode (libmpg123 via the C++ data plane).

The datasets' universal filename convention is .mp3
(lib/embedding_dataset/metadata_loaders.py:203-213); the reference decodes
through ffmpeg (whisper.load_audio, lib/audio_dataset/dataset.py:652-654).
This environment has no ffmpeg binary, so fixtures are ENCODED in-test with
the system libmp3lame (ctypes) and decoded with our native path — closing
the loop against the original signal (mp3 is lossy; a pure tone at 192 kbps
round-trips near-transparently, so correlation/amplitude checks are tight).
"""

import ctypes
import ctypes.util

import numpy as np
import pytest

from wealy_tpu import native


def _lame():
    for name in ("libmp3lame.so.0", "libmp3lame.so", ctypes.util.find_library("mp3lame")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def encode_mp3(x: np.ndarray, sr: int, stereo_r: np.ndarray | None = None) -> bytes:
    """Encode float32 [-1, 1] PCM to mp3 bytes with libmp3lame (fixture
    generation only — the framework itself never encodes)."""
    lame = _lame()
    assert lame is not None
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gfp, ctypes.c_int(sr))
    n_ch = 2 if stereo_r is not None else 1
    lame.lame_set_num_channels(gfp, ctypes.c_int(n_ch))
    lame.lame_set_brate(gfp, ctypes.c_int(192))
    assert lame.lame_init_params(gfp) >= 0

    x = np.ascontiguousarray(x, np.float32)
    r = np.ascontiguousarray(stereo_r if stereo_r is not None else x, np.float32)
    n = len(x)
    buf = ctypes.create_string_buffer(int(1.25 * n) + 7200)
    f32p = ctypes.POINTER(ctypes.c_float)
    m = lame.lame_encode_buffer_ieee_float(
        gfp,
        x.ctypes.data_as(f32p),
        r.ctypes.data_as(f32p),
        ctypes.c_int(n),
        buf,
        ctypes.c_int(len(buf)),
    )
    assert m >= 0, f"lame encode failed: {m}"
    tail = ctypes.create_string_buffer(7200)
    t = lame.lame_encode_flush(gfp, tail, ctypes.c_int(len(tail)))
    lame.lame_close(gfp)
    return buf.raw[:m] + tail.raw[:t]


def _align(decoded: np.ndarray, ref: np.ndarray, max_lag: int = 5000) -> tuple[np.ndarray, np.ndarray]:
    """Trim codec delay: find the lag maximizing cross-correlation, return
    aligned overlapping slices."""
    n = min(len(ref), 3 * 4410)  # correlate on a prefix for speed
    best_lag, best = 0, -np.inf
    for lag in range(0, max_lag):
        seg = decoded[lag : lag + n]
        if len(seg) < n:
            break
        c = float(np.dot(seg, ref[:n]))
        if c > best:
            best, best_lag = c, lag
    m = min(len(decoded) - best_lag, len(ref))
    return decoded[best_lag : best_lag + m], ref[:m]


requires_mp3 = pytest.mark.skipif(
    not native.mp3_available() or _lame() is None,
    reason="libmpg123/libmp3lame not available",
)


@requires_mp3
class TestMp3Decode:
    def test_sine_roundtrip(self):
        sr = 44100
        t = np.arange(3 * sr) / sr
        ref = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        data = encode_mp3(ref, sr)
        x, got_sr = native.decode_mp3_bytes(data)
        assert got_sr == sr
        assert abs(len(x) - len(ref)) < 5000  # codec delay/padding only
        a, b = _align(x, ref)
        assert len(a) > 2 * sr
        r = np.corrcoef(a, b)[0, 1]
        assert r > 0.99, f"correlation {r}"
        amp = float(np.abs(a).max())
        assert 0.36 < amp < 0.44  # amplitude preserved within codec error

    def test_stereo_downmix(self):
        sr = 32000
        t = np.arange(sr) / sr
        left = (0.5 * np.sin(2 * np.pi * 330.0 * t)).astype(np.float32)
        right = (0.1 * np.sin(2 * np.pi * 330.0 * t)).astype(np.float32)
        data = encode_mp3(left, sr, stereo_r=right)
        x, got_sr = native.decode_mp3_bytes(data)
        assert got_sr == sr
        mono_ref = 0.5 * (left + right)
        a, b = _align(x, mono_ref)
        r = np.corrcoef(a, b)[0, 1]
        assert r > 0.99
        amp = float(np.abs(a).max())
        assert 0.25 < amp < 0.35  # (0.5+0.1)/2 = 0.3

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            native.decode_mp3_bytes(b"\x00" * 4096)

    def test_load_audio_mp3_end_to_end(self, tmp_path):
        """The full pipeline entry: .mp3 file -> 16 kHz mono float32 (the
        whisper.load_audio contract, dataset.py:652-654)."""
        from wealy_tpu.audio.decode import load_audio

        sr = 44100
        t = np.arange(2 * sr) / sr
        ref = (0.3 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        p = tmp_path / "song.mp3"
        p.write_bytes(encode_mp3(ref, sr))
        x = load_audio(p, sr=16000)
        assert x.dtype == np.float32
        assert abs(len(x) - 2 * 16000) < 3000
        # dominant frequency survives decode+resample
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        f = np.fft.rfftfreq(len(x), 1 / 16000)
        assert abs(f[int(np.argmax(spec))] - 440.0) < 2.0

    def test_audio_dataset_item_decodes_mp3(self, tmp_path):
        """AudioDataset __getitem__ consumes an .mp3 corpus natively (the
        reference's getitem decode hook, dataset.py:594-675)."""
        import pandas as pd

        from wealy_tpu.data.audio_dataset import AudioDataset
        from wealy_tpu.data.metadata import Metadata

        sr = 22050
        t = np.arange(sr) / sr
        wave = (0.2 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
        audio_root = tmp_path / "audio"
        info, splits = {}, {"train": {}, "val": {}, "test": {}}
        for i, vid in enumerate(["10", "11"]):
            # lyric-covers layout: {root}/LyricCovers/audio/{id}/{id}_audio.mp3
            d = audio_root / "LyricCovers" / "audio" / vid
            d.mkdir(parents=True)
            (d / f"{vid}_audio.mp3").write_bytes(encode_mp3(wave, sr))
            info[vid] = {
                "id": 10 + i, "clique": "c0", "clique_idx": 0,
                "version_idx": i, "filename": vid, "version_key": vid,
            }
        splits["train"]["c0"] = ["10", "11"]
        md = Metadata(info=info, splits=splits, dataset_name="lyric-covers")
        ds = AudioDataset(md, "train", audio_root)
        item = ds[0]
        assert item.waveform.dtype == np.float32
        assert abs(len(item.waveform) - 16000) < 2500  # resampled to 16 kHz
        assert float(np.abs(item.waveform).max()) > 0.1  # not dummy silence


class TestGarbageInput:
    def test_non_mp3_bytes_error_not_hang(self, tmp_path):
        """Renamed non-MP3 garbage must return an error promptly — mpg123 can
        loop on persistent resync errors without consuming input (regression:
        the retry loop is now bounded)."""
        import numpy as np
        import pytest

        from wealy_tpu import native

        if not native.mp3_available():
            pytest.skip("libmpg123 not present")
        data = np.random.default_rng(0).bytes(200_000)
        import time

        t0 = time.time()
        with pytest.raises((RuntimeError, ValueError)):
            native.decode_mp3_bytes(data)
        assert time.time() - t0 < 30
