"""Fused Pallas log-mel kernel: windowed DFT + power + mel + log10 in one
VMEM-resident pass.

The jnp path (:mod:`wealy_tpu.audio.mel`) materializes the (B, 3000, 201)
power spectrum and (B, 3000, n_mels) linear-mel in HBM between contractions;
this kernel keeps each 600-frame block entirely in VMEM: two
(600,400)@(400,201) MXU matmuls, the power elementwise, the
(600,201)@(201,n_mels) mel matmul and the log10 all fuse into a single grid
step. Frame assembly (reflect pad + hop-row reshape + concat) stays in XLA —
it is pure data movement that XLA lays out efficiently, and keeping it outside
lets every kernel load be tile-aligned (Mosaic cannot prove alignment for
row-shifted dynamic slices). The per-clip max-8 dynamic-range clamp is a cheap
global reduction done outside the kernel.

Golden parity: tests/test_audio_mel.py checks pallas == jnp == transformers'
WhisperFeatureExtractor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from wealy_tpu.audio.mel import (
    N_FFT,
    N_FRAMES,
    N_SAMPLES,
    _dft_matrices,
    frame_audio,
    mel_filterbank,
)

FRAME_BLOCK = 600  # frames per grid step; 3000 = 5 blocks (600 = 75 sublanes)
N_FREQS = N_FFT // 2 + 1


def _mel_kernel(frames_ref, wcos_ref, wsin_ref, mel_ref, out_ref):
    """One (batch, frame-block) grid step.

    frames_ref: (1, FRAME_BLOCK, N_FFT) windowless frames
    out_ref:    (1, FRAME_BLOCK, n_mels) log10-mel block
    """
    frames = frames_ref[0]
    re = jnp.dot(frames, wcos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, wsin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im  # (FB, 201)
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


def log_mel_spectrogram_pallas(audio, n_mels: int = 80):
    """Whisper log-mel via the fused Pallas kernel (TPU), falling back to the
    jnp path on non-TPU backends where Mosaic kernels cannot compile.

    audio: (B, N_SAMPLES) or (N_SAMPLES,) float32 -> (B, n_mels, N_FRAMES).
    Numerically identical to :func:`wealy_tpu.audio.mel.log_mel_spectrogram`
    up to float-associativity.
    """
    if jax.default_backend() != "tpu":
        from wealy_tpu.audio.mel import log_mel_spectrogram

        return jax.jit(log_mel_spectrogram, static_argnames="n_mels")(
            audio, n_mels=n_mels
        )
    return _log_mel_pallas_jit(audio, n_mels=n_mels)


@functools.partial(jax.jit, static_argnames=("n_mels",))
def _log_mel_pallas_jit(audio, n_mels: int = 80):
    if audio.ndim == 1:
        audio = audio[None]
        squeeze = True
    else:
        squeeze = False
    B = audio.shape[0]
    assert audio.shape[-1] == N_SAMPLES

    frames = frame_audio(audio.astype(jnp.float32))  # (B, 3000, 400)
    wcos, wsin = _dft_matrices()
    melw = mel_filterbank(n_mels)
    n_blocks = N_FRAMES // FRAME_BLOCK

    log_spec = pl.pallas_call(
        _mel_kernel,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, FRAME_BLOCK, N_FFT), lambda i, j: (i, j, 0)),
            # DFT/mel bases are constant across the grid; Mosaic keeps them
            # resident because the index_map ignores (i, j).
            pl.BlockSpec((N_FFT, N_FREQS), lambda i, j: (0, 0)),
            pl.BlockSpec((N_FFT, N_FREQS), lambda i, j: (0, 0)),
            pl.BlockSpec((N_FREQS, n_mels), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, FRAME_BLOCK, n_mels), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N_FRAMES, n_mels), jnp.float32),
    )(frames, jnp.asarray(wcos), jnp.asarray(wsin), jnp.asarray(melw))

    mx = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, mx - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    out = jnp.swapaxes(log_spec, 1, 2)  # (B, n_mels, N_FRAMES)
    return out[0] if squeeze else out
