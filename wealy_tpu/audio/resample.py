"""Polyphase sample-rate conversion as a dilated convolution (TPU-resident).

Replaces the reference's out-of-repo ``whisper.load_audio`` ffmpeg resampling
(lib/audio_dataset/dataset.py:652-654) with a kaiser-windowed-sinc polyphase
resampler expressed as ``lax.conv_general_dilated`` with lhs_dilation=L and
stride=M — i.e. upsample-filter-downsample in a single XLA convolution that
runs on device.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=None)
def _design_lowpass(L: int, M: int, zeros: int = 24, beta: float = 14.0) -> np.ndarray:
    """Kaiser-windowed sinc lowpass for L/M resampling, gain L.

    Cutoff at min(1/L, 1/M) of the upsampled Nyquist; ``zeros`` controls the
    number of sinc zero-crossings per side (filter length ~ 2*zeros*max(L,M)).
    """
    cutoff = min(1.0 / L, 1.0 / M)
    half = int(zeros * max(L, M))
    n = np.arange(-half, half + 1, dtype=np.float64)
    taps = cutoff * np.sinc(cutoff * n)
    taps *= np.kaiser(2 * half + 1, beta)
    taps *= L  # compensate the zero-insertion energy loss
    return taps.astype(np.float32)


def resample(audio, orig_sr: int, target_sr: int):
    """Resample the last axis from ``orig_sr`` to ``target_sr``.

    audio: (..., T) float array. Returns (..., ceil(T * target_sr / orig_sr)).
    """
    if orig_sr == target_sr:
        return jnp.asarray(audio)
    g = math.gcd(orig_sr, target_sr)
    L, M = target_sr // g, orig_sr // g
    taps = jnp.asarray(_design_lowpass(L, M))
    k = taps.shape[0]
    half = (k - 1) // 2

    x = jnp.asarray(audio, dtype=jnp.float32)
    shape = x.shape
    T = shape[-1]
    x = x.reshape(-1, 1, T)  # (N, C=1, W)
    out_len = -(-T * L // M)  # ceil

    # upsample-by-L (lhs dilation), convolve, downsample-by-M (stride).
    # padding chosen so output sample j corresponds to input time j*M/L.
    y = lax.conv_general_dilated(
        x,
        taps.reshape(1, 1, k),
        window_strides=(M,),
        padding=[(half, half + M)],
        lhs_dilation=(L,),
        dimension_numbers=("NCW", "IOW", "NCW"),
    )
    y = y[..., :out_len]
    return y.reshape(*shape[:-1], y.shape[-1])
