"""Constant-Q transform frontend for the CLEWS acoustic branch.

The reference consumes precomputed CLEWS embeddings whose model family (CQT ->
CNN, lib/layers.py CQTPrepare/ResNet blocks) implies a CQT frontend the repo
never ships. This is a TPU-native pseudo-CQT: a constant-Q triangular
filterbank applied to STFT magnitudes — the whole transform is framing + one
windowed-DFT matmul + one (n_freqs, n_bins) matmul, all MXU-shaped (same
construction librosa calls "pseudo-CQT"; exact multirate CQT is serial and
hostile to accelerators, and CNN encoders downstream are robust to the
difference).

Defaults follow the cover-song literature (CLEWS/CQTNet): 12 kHz-ish analysis
via 16 kHz input, fmin = C1 (32.70 Hz), 7 octaves x 12 bins = 84 bins.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from wealy_tpu.audio.mel import SAMPLE_RATE, hann_window


@functools.lru_cache(maxsize=None)
def cqt_filterbank(
    n_bins: int = 84,
    bins_per_octave: int = 12,
    fmin: float = 32.703194,  # C1
    sr: int = SAMPLE_RATE,
    n_fft: int = 2048,
) -> np.ndarray:
    """Triangular constant-Q filterbank: (n_fft//2 + 1, n_bins).

    Bin k has center frequency fmin * 2**(k / bins_per_octave); triangles span
    the geometric neighbors, normalized to unit area (slaney-style) so energy
    is comparable across octaves.
    """
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    centers = fmin * 2.0 ** (np.arange(-1, n_bins + 1) / bins_per_octave)
    fb = np.zeros((n_bins, n_freqs), np.float64)
    for b in range(n_bins):
        lo, c, hi = centers[b], centers[b + 1], centers[b + 2]
        rise = (fft_freqs - lo) / max(c - lo, 1e-9)
        fall = (hi - fft_freqs) / max(hi - c, 1e-9)
        tri = np.maximum(0.0, np.minimum(rise, fall))
        if tri.sum() == 0.0:
            # low bins can be narrower than one FFT bin: fall back to the
            # nearest frequency bin so every CQT bin has support
            tri[np.argmin(np.abs(fft_freqs - c))] = 1.0
        fb[b] = tri * (2.0 / max(hi - lo, 1e-9))
    return fb.T.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _cqt_dft(n_fft: int):
    n_freqs = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    f = np.arange(n_freqs)[None, :]
    ang = 2.0 * np.pi * t * f / n_fft
    win = hann_window(n_fft)[:, None]
    return (
        (win * np.cos(ang)).astype(np.float32),
        (win * np.sin(ang)).astype(np.float32),
    )


def cqt_spectrogram(
    audio,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    fmin: float = 32.703194,
    sr: int = SAMPLE_RATE,
    n_fft: int = 2048,
    hop: int = 512,
):
    """(B, T) waveform -> (B, n_bins, n_frames) CQT magnitude.

    Feed through :class:`wealy_tpu.models.layers.CQTPrepare` (power/normalize)
    into the CLEWS encoder as (B, n_bins, n_frames, 1).
    """
    if audio.ndim == 1:
        audio = audio[None]
        squeeze = True
    else:
        squeeze = False
    x = jnp.asarray(audio, jnp.float32)
    half = n_fft // 2
    x = jnp.pad(x, ((0, 0), (half, half)), mode="reflect")
    T = x.shape[1]
    n_frames = 1 + (T - n_fft) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = x[:, idx]  # (B, n_frames, n_fft)

    wcos, wsin = _cqt_dft(n_fft)
    re = frames @ jnp.asarray(wcos)
    im = frames @ jnp.asarray(wsin)
    mag = jnp.sqrt(re * re + im * im + 1e-12)  # (B, n_frames, n_freqs)
    cqt = mag @ jnp.asarray(cqt_filterbank(n_bins, bins_per_octave, fmin, sr, n_fft))
    out = jnp.swapaxes(cqt, 1, 2)  # (B, n_bins, n_frames)
    return out[0] if squeeze else out
