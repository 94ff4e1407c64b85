"""Host-side audio decode to 16 kHz mono float32.

The reference delegates to ``whisper.load_audio`` (ffmpeg subprocess,
lib/audio_dataset/dataset.py:652-654). This environment has neither ffmpeg nor
soundfile, so the framework ships a native stdlib WAV decoder (PCM 8/16/32-bit
and IEEE float) and falls back to ffmpeg when a binary is present. Resampling
to 16 kHz runs on the host via the native C++ polyphase resampler (XLA
device fallback, :mod:`wealy_tpu.audio.resample` — same filter design).
"""

from __future__ import annotations

import shutil
import subprocess
import wave
from pathlib import Path

import numpy as np

from wealy_tpu.audio.mel import SAMPLE_RATE


def _decode_wav(path: str) -> tuple[np.ndarray, int]:
    """Decode a PCM/float WAV file to (float32 mono waveform, sample_rate)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        # Heuristic: wave doesn't expose the format tag; int32 PCM is the
        # overwhelmingly common 4-byte case.
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width: {width} bytes")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, sr


def _decode_ffmpeg(path: str, sr: int) -> np.ndarray:
    cmd = [
        "ffmpeg",
        "-nostdin",
        "-threads",
        "0",
        "-i",
        path,
        "-f",
        "s16le",
        "-ac",
        "1",
        "-acodec",
        "pcm_s16le",
        "-ar",
        str(sr),
        "-",
    ]
    out = subprocess.run(cmd, capture_output=True, check=True).stdout
    return np.frombuffer(out, dtype="<i2").astype(np.float32) / 32768.0


def _host_resample(x: np.ndarray, file_sr: int, sr: int) -> np.ndarray:
    """Resample on the HOST: native C++ polyphase first (same kaiser-sinc
    taps as the XLA path, parity-tested at 2e-4), jax fallback.

    The host path matters: a device resample here would be one extra device
    call per song from inside the loader worker threads — on the remote-TPU
    tunnel that is a ~32 MB upload + round trip per 180 s 44.1 kHz song,
    serialized against the extraction batches the threads are feeding."""
    import math

    from wealy_tpu.audio.resample import _design_lowpass, resample

    g = math.gcd(file_sr, sr)
    L, M = sr // g, file_sr // g
    try:
        from wealy_tpu import native

        if native.available():
            return native.resample_native(x, L, M, _design_lowpass(L, M))
    except (ValueError, RuntimeError):
        pass
    return np.asarray(resample(x, file_sr, sr))


def load_audio(path: str | Path, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Load any supported audio file as float32 mono at ``sr`` Hz.

    WAV files decode natively; other formats require an ffmpeg binary on PATH.
    Off-rate files resample via the native host polyphase resampler (XLA
    fallback).
    """
    path = str(path)
    try:
        with open(path, "rb") as f:
            head = f.read(12)
    except OSError:
        head = b""
    # dispatch by CONTENT first: real-world corpora carry misnamed files
    # (e.g. RIFF/WAV bytes under .mp3 — the lyric-covers layout hard-codes
    # the .mp3 suffix, paths.py:50), and mpg123 would otherwise grind
    # through 64 KB of "junk" and fail. RIFF alone is not enough (AVI/WebP
    # are RIFF containers too): require the WAVE form type.
    is_wav_bytes = head[:4] == b"RIFF" and head[8:12] == b"WAVE"
    if is_wav_bytes or path.lower().endswith(".wav"):
        x = None
        try:
            # native C++ decoder first (handles 24-bit / float / extensible
            # WAVs the stdlib module rejects, and downmixes in one pass)
            from wealy_tpu import native

            if native.available():
                x, file_sr = native.decode_wav_bytes(Path(path).read_bytes())
        except (ValueError, RuntimeError):
            x = None
        if x is None:
            x, file_sr = _decode_wav(path)
        if file_sr != sr:
            x = _host_resample(x, file_sr, sr)
        return x
    if path.lower().endswith(".mp3"):
        # native libmpg123 decode (the datasets' universal container —
        # metadata_loaders.py:203-213 — without the reference's ffmpeg
        # dependency, dataset.py:652-654)
        try:
            from wealy_tpu import native

            if native.mp3_available():
                x, file_sr = native.decode_mp3_bytes(Path(path).read_bytes())
                if file_sr != sr:
                    x = _host_resample(x, file_sr, sr)
                return x
        except (ValueError, RuntimeError):
            pass  # fall through to ffmpeg if present
    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            f"cannot decode {path!r}: unsupported without native mp3 support "
            "or an ffmpeg binary"
        )
    return _decode_ffmpeg(path, sr)
