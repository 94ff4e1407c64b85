"""Constant-Q transform frontends for the CLEWS acoustic branch.

The reference consumes precomputed CLEWS embeddings whose model family (CQT ->
CNN, lib/layers.py CQTPrepare/ResNet blocks) implies a CQT frontend the repo
never ships. Two TPU-native constructions:

- :func:`cqt_spectrogram` — pseudo-CQT: a constant-Q triangular filterbank
  applied to STFT magnitudes (framing + one windowed-DFT matmul + one
  (n_freqs, n_bins) matmul; the construction librosa calls "pseudo-CQT").
- :func:`cqt_multirate` — TRUE constant-Q transform, restructured for the
  MXU: complex CQT kernels are built once for the TOP octave only; every
  lower octave halves the sample rate (kaiser polyphase decimation) and
  reuses the SAME (frame_len, 2*bins_per_octave) kernel matrix, because
  f/sr is scale-invariant. Per octave the transform is framing + one real
  matmul pair — 7 small matmuls total instead of the serial per-bin
  convolutions of the textbook algorithm. Golden-tested against a direct
  full-rate per-bin convolution reference.

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


# ---------------------------------------------------------------------------
# True (multirate) CQT
# ---------------------------------------------------------------------------


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.lru_cache(maxsize=None)
def _top_octave_kernels(
    bins_per_octave: int, f_top: float, sr: int
) -> tuple:
    """Complex CQT kernels for ONE octave [f_top, 2*f_top) at rate ``sr``.

    Bin j (j in [0, bpo)) has center f_j = f_top * 2**(j/bpo), window length
    N_j = round(Q * sr / f_j) with Q = 1/(2**(1/bpo) - 1), hann-windowed
    complex exponential centered in a common frame of length L (lane-padded).
    Kernels are L1-of-window normalized so a unit sinusoid at f_j measures
    magnitude ~1 in that bin. Returns (wcos (L, bpo), wsin (L, bpo), L).
    """
    Q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    lengths = [
        max(4, int(round(Q * sr / (f_top * 2.0 ** (j / bins_per_octave)))))
        for j in range(bins_per_octave)
    ]
    L = _round_up(max(lengths), 8)
    wcos = np.zeros((L, bins_per_octave), np.float64)
    wsin = np.zeros((L, bins_per_octave), np.float64)
    for j, N in enumerate(lengths):
        f = f_top * 2.0 ** (j / bins_per_octave)
        n = np.arange(N) - (N - 1) / 2.0
        win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(N) / max(N - 1, 1))
        ang = 2.0 * np.pi * f * n / sr
        start = (L - N) // 2  # center inside the common frame
        norm = 2.0 / win.sum()
        wcos[start : start + N, j] = win * np.cos(ang) * norm
        wsin[start : start + N, j] = win * np.sin(ang) * norm
    return wcos.astype(np.float32), wsin.astype(np.float32), L


def cqt_multirate(
    audio,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    fmin: float = 32.703194,
    sr: int = SAMPLE_RATE,
    hop: int = 512,
):
    """True constant-Q transform: (B, T) waveform -> (B, n_bins, n_frames).

    Octave-by-octave multirate evaluation (Brown & Puckette style): the top
    octave's kernels are applied to the full-rate signal; each lower octave
    halves the rate (kaiser polyphase decimation, wealy_tpu.audio.resample)
    and reuses the SAME kernel matrix, since kernels depend only on f/sr.
    Frames at octave o are taken at stride hop/2**o of the o-times-decimated
    signal, so all octaves share one wall-clock frame grid — ``hop`` must be
    divisible by 2**(n_octaves-1) (512 for the default 7 octaves).

    Accuracy vs the direct full-rate transform is bounded by the decimation
    filter (kaiser) passband/stopband: ~1% on the lowest octaves (tested).
    """
    from wealy_tpu.audio.resample import resample

    assert n_bins % bins_per_octave == 0, (n_bins, bins_per_octave)
    n_oct = n_bins // bins_per_octave
    assert hop % (2 ** (n_oct - 1)) == 0, (
        f"hop {hop} must be divisible by 2**{n_oct - 1} for a shared frame grid"
    )
    if audio.ndim == 1:
        audio = audio[None]
        squeeze = True
    else:
        squeeze = False
    x = jnp.asarray(audio, jnp.float32)
    n_frames = 1 + x.shape[1] // hop

    f_top = fmin * 2.0 ** ((n_oct - 1) * 1.0)  # lowest bin of the TOP octave
    wcos, wsin, L = _top_octave_kernels(bins_per_octave, float(f_top), sr)
    wc = jnp.asarray(wcos)
    ws = jnp.asarray(wsin)

    octaves = []  # top first
    for o in range(n_oct):
        hop_o = hop >> o
        half = L // 2
        if x.shape[1] <= half:
            # deep octaves of short clips: reflect padding needs dim > width;
            # extend with silence (static shapes — resolved at trace time)
            x = jnp.pad(x, ((0, 0), (0, half + 1 - x.shape[1])))
        xp = jnp.pad(x, ((0, 0), (half, half)), mode="reflect")
        starts = jnp.arange(n_frames) * hop_o
        idx = starts[:, None] + jnp.arange(L)[None, :]
        frames = xp[:, idx]  # (B, n_frames, L)
        re = frames @ wc
        im = frames @ ws
        octaves.append(jnp.sqrt(re * re + im * im + 1e-12))  # (B, n_frames, bpo)
        if o != n_oct - 1:
            x = resample(x, 2, 1)  # anti-aliased halving; kernels reused as-is
    # stack: octave o holds bins [n_bins-(o+1)*bpo, n_bins-o*bpo)
    out = jnp.concatenate(list(reversed(octaves)), axis=-1)  # low bins first
    out = jnp.swapaxes(out, 1, 2)  # (B, n_bins, n_frames)
    return out[0] if squeeze else out


def direct_cqt_reference(
    audio: np.ndarray,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    fmin: float = 32.703194,
    sr: int = SAMPLE_RATE,
    hop: int = 512,
) -> np.ndarray:
    """Textbook per-bin full-rate CQT (numpy, O(n_bins * T * N_k)) — the
    numerics ground truth for :func:`cqt_multirate` tests. Same windowing,
    centering, and normalization conventions; no decimation anywhere."""
    x = np.asarray(audio, np.float64)
    assert x.ndim == 1
    n_frames = 1 + len(x) // hop
    Q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    out = np.zeros((n_bins, n_frames), np.float64)
    for k in range(n_bins):
        f = fmin * 2.0 ** (k / bins_per_octave)
        N = max(4, int(round(Q * sr / f)))
        n = np.arange(N) - (N - 1) / 2.0
        win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(N) / max(N - 1, 1))
        norm = 2.0 / win.sum()
        ker = win * np.exp(-2j * np.pi * f * n / sr) * norm
        half = N // 2
        xp = np.pad(x, (half, half + N), mode="reflect")
        for t in range(n_frames):
            s = t * hop  # kernel sample m multiplies x[s - N//2 + m]
            out[k, t] = np.abs(np.dot(xp[s : s + N], ker))
    return out.astype(np.float32)
