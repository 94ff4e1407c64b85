"""Whisper-compatible log-mel spectrogram in pure jnp.

Implements the published Whisper audio pipeline (16 kHz mono, n_fft=400,
hop=160, 80/128 slaney-normalized mel bands, log10 with a global -8 dB-decade
clamp and (x+4)/4 scaling). The reference repo consumes this stage's outputs
but does not contain it (SURVEY.md §0/§3.5); parity is golden-tested against
``transformers.WhisperFeatureExtractor`` (an independent numpy implementation).

TPU-first framing: instead of a gather-based unfold, the waveform is reshaped
into hop-sized rows and frames are assembled from three shifted row-slices
(400 = 2*160 + 80), so the whole frontend is reshape/slice/concat + two
matmul-shaped contractions — ideal for XLA/MXU. The fully fused Pallas variant
lives in :mod:`wealy_tpu.audio.pallas_mel`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000: samples per 30 s chunk
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000: mel frames per 30 s chunk


def hann_window(n: int = N_FFT) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float64)


def _hz_to_mel_slaney(f):
    """Slaney mel scale (librosa htk=False): linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    mel = f * 3.0 / 200.0
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    f = m * 200.0 / 3.0
    above = m >= min_log_mel
    f = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
    return f


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    n_mels: int = 80, n_fft: int = N_FFT, sr: int = SAMPLE_RATE
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_fft//2+1, n_mels).

    Matches librosa.filters.mel(htk=False, norm="slaney") — the filterbank
    Whisper ships precomputed.
    """
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(0.0), _hz_to_mel_slaney(sr / 2.0), n_mels + 2
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)  # (n_mels + 2,)

    fdiff = np.diff(hz_pts)  # (n_mels + 1,)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # (n_mels + 2, n_freqs)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))  # (n_mels, n_freqs)

    # Slaney normalization: each filter integrates to ~constant energy.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb = fb * enorm[:, None]
    return fb.T.astype(np.float32)  # (n_freqs, n_mels)


@functools.lru_cache(maxsize=None)
def _dft_matrices(n_fft: int = N_FFT):
    """Windowed real-DFT basis: (n_fft, n_freqs) cos/sin with the Hann window
    folded in, so STFT = frames @ cos - 1j * frames @ sin."""
    n_freqs = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    f = np.arange(n_freqs)[None, :]
    ang = 2.0 * np.pi * t * f / n_fft
    win = hann_window(n_fft)[:, None]
    wcos = (win * np.cos(ang)).astype(np.float32)
    wsin = (win * np.sin(ang)).astype(np.float32)
    return wcos, wsin


def pad_or_trim(audio, length: int = N_SAMPLES, axis: int = -1):
    """Zero-pad or cut the time axis to exactly ``length`` samples."""
    axis = axis % audio.ndim
    size = audio.shape[axis]
    if size == length:
        return audio
    if size > length:
        return jnp.take(audio, jnp.arange(length), axis=axis)
    pad = [(0, 0)] * audio.ndim
    pad[axis] = (0, length - size)
    return jnp.pad(audio, pad)


def frame_audio(audio):
    """(B, N_SAMPLES) -> (B, N_FRAMES, N_FFT) centered frames with reflect pad.

    Uses the hop-row reshape trick: after reflect-padding by n_fft//2 on both
    sides, frame f spans rows [f, f+1, f+2] of the hop-sized row matrix
    (n_fft = 2*hop + 80), so framing is three slices + a concat — no gather.
    """
    B = audio.shape[0]
    half = N_FFT // 2  # 200
    x = jnp.pad(audio, ((0, 0), (half, half)), mode="reflect")  # (B, 480400)
    n_rows = x.shape[1] // HOP_LENGTH + 1  # ensure room for f+2 shifted slices
    total = n_rows * HOP_LENGTH
    x = jnp.pad(x, ((0, 0), (0, total - x.shape[1])))
    rows = x.reshape(B, n_rows, HOP_LENGTH)
    nf = N_FRAMES
    f0 = rows[:, 0:nf, :]  # samples [160f, 160f+160)
    f1 = rows[:, 1 : nf + 1, :]  # samples [160f+160, 160f+320)
    f2 = rows[:, 2 : nf + 2, : N_FFT - 2 * HOP_LENGTH]  # samples [160f+320, 160f+400)
    return jnp.concatenate([f0, f1, f2], axis=-1)  # (B, 3000, 400)


def log_mel_spectrogram(audio, n_mels: int = 80, dtype=jnp.float32):
    """Whisper log-mel: (B, N_SAMPLES) float32 waveform -> (B, n_mels, N_FRAMES).

    Steps: centered Hann STFT (frames @ windowed-DFT basis, MXU-shaped),
    power spectrum, mel projection, log10 clamp at 1e-10, per-clip max-8
    dynamic-range clamp, (x+4)/4 scaling.
    """
    if audio.ndim == 1:
        audio = audio[None]
        squeeze = True
    else:
        squeeze = False
    assert audio.shape[-1] == N_SAMPLES, (
        f"expected {N_SAMPLES} samples (use pad_or_trim / chunking first), "
        f"got {audio.shape[-1]}"
    )
    frames = frame_audio(audio.astype(jnp.float32))  # (B, 3000, 400)
    wcos, wsin = _dft_matrices()
    re = frames @ jnp.asarray(wcos)  # (B, 3000, 201)
    im = frames @ jnp.asarray(wsin)
    power = re * re + im * im
    mel = power @ jnp.asarray(mel_filterbank(n_mels))  # (B, 3000, n_mels)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # per-clip dynamic-range clamp (global max over freq and time)
    mx = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, mx - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    out = jnp.swapaxes(log_spec, 1, 2).astype(dtype)  # (B, n_mels, 3000)
    return out[0] if squeeze else out
