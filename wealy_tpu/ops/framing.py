"""Length forcing and overlapped framing.

Behavioral parity targets: ``force_length``, ``frames``, ``get_frames`` in
/root/reference/lib/tensor_ops.py:35-107.

All shapes here are static at trace time (JAX requirement), so the pad/cut
decisions are resolved in Python while the data movement itself is traced.
Randomized choices (``pad_mode="crazy"``, ``cut_mode="random"``) take an
explicit PRNG key and use ``lax.switch`` / dynamic slicing so they stay
jit-compatible.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def _random_cut(x, length: int, axis: int, key: jax.Array):
    max_start = x.shape[axis] - length
    start = jax.random.randint(key, (), 0, max_start + 1)
    return lax.dynamic_slice_in_dim(x, start, length, axis=axis)


def force_length(
    x,
    length: int,
    axis: int = -1,
    pad_mode: str = "repeat",
    cut_mode: str = "start",
    allow_longer: bool = False,
    key: Optional[jax.Array] = None,
):
    """Pad (by tiling / zeros / random-side) or cut ``axis`` to exactly ``length``.

    - ``pad_mode``: "repeat" (tile x), "zeros" (append zero blocks), "crazy"
      (each doubling step randomly appends/prepends x or zeros — needs ``key``).
    - ``cut_mode``: "start" (keep head), "end" (keep tail), "random"
      (random window — needs ``key``).
    """
    assert pad_mode in ("repeat", "zeros", "crazy")
    assert cut_mode in ("start", "end", "random")
    axis = axis % x.ndim
    size = x.shape[axis]
    if size == length or (size > length and allow_longer):
        return x

    aux = x
    if pad_mode == "crazy" and aux.shape[axis] < length:
        if key is None:
            raise ValueError("pad_mode='crazy' requires an explicit PRNG key")
        n_steps = 0
        s = size
        while s < length:
            s += size
            n_steps += 1
        keys = jax.random.split(key, n_steps + 1)
        key = keys[0]
        zeros = jnp.zeros_like(x)
        for i in range(n_steps):
            r = jax.random.randint(keys[i + 1], (), 0, 4)
            branches = [
                lambda a, app: jnp.concatenate([a, app[0]], axis=axis),  # append x
                lambda a, app: jnp.concatenate([app[0], a], axis=axis),  # prepend x
                lambda a, app: jnp.concatenate([a, app[1]], axis=axis),  # append 0
                lambda a, app: jnp.concatenate([app[1], a], axis=axis),  # prepend 0
            ]
            aux = lax.switch(r, branches, aux, (x, zeros))
    else:
        while aux.shape[axis] < length:
            block = x if pad_mode == "repeat" else jnp.zeros_like(x)
            aux = jnp.concatenate([aux, block], axis=axis)

    if not allow_longer and aux.shape[axis] > length:
        if cut_mode == "start":
            aux = lax.slice_in_dim(aux, 0, length, axis=axis)
        elif cut_mode == "end":
            aux = lax.slice_in_dim(aux, aux.shape[axis] - length, aux.shape[axis], axis=axis)
        else:
            if key is None:
                raise ValueError("cut_mode='random' requires an explicit PRNG key")
            aux = _random_cut(aux, length, axis, key)
    return aux


def frames(
    signal,
    frame_length: int,
    frame_step: int,
    pad_end: bool = False,
    pad_value: float = 0.0,
    axis: int = -1,
):
    """Overlapped framing (torch.unfold semantics): (..., T, ...) -> frames on a
    new trailing dim of size ``frame_length``, placed right after ``axis``.

    With ``pad_end``, pads so the tail samples are covered (reference
    lib/tensor_ops.py:78-89). Implemented as a gather with a static index
    matrix — XLA lowers this to an efficient strided load.
    """
    axis = axis % signal.ndim
    if pad_end:
        signal_length = signal.shape[axis]
        frames_overlap = frame_length - frame_step
        rest = abs(signal_length - frames_overlap) % abs(frame_step)
        if rest != 0:
            pad_size = int(frame_length - rest)
            pad_width = [(0, 0)] * signal.ndim
            pad_width[axis] = (0, pad_size)
            signal = jnp.pad(signal, pad_width, constant_values=pad_value)
    return _unfold(signal, frame_length, frame_step, axis)


def _unfold(x, size: int, step: int, axis: int):
    """torch.Tensor.unfold: windows along ``axis`` become (n_frames, size),
    with n_frames replacing ``axis`` and ``size`` appended as the last dim."""
    t = x.shape[axis]
    n = (t - size) // step + 1
    starts = jnp.arange(n) * step
    idx = starts[:, None] + jnp.arange(size)[None, :]  # (n, size)
    out = jnp.take(x, idx.reshape(-1), axis=axis)
    # axis now has length n*size; split into (n, size) and move size to the end.
    new_shape = x.shape[:axis] + (n, size) + x.shape[axis + 1 :]
    out = out.reshape(new_shape)
    # torch.unfold appends the window dim at the end.
    return jnp.moveaxis(out, axis + 1, -1)


def get_frames(
    x,
    length: int,
    step: int,
    axis: int = -1,
    pad_end: bool = True,
    pad_mode: str = "zeros",
    cut_mode: str = "start",
    key: Optional[jax.Array] = None,
):
    """Frame ``axis`` into overlapping windows, first force-padding so the last
    window is complete (reference lib/tensor_ops.py:92-107)."""
    axis = axis % x.ndim
    if pad_end:
        newlength = max(int(math.ceil((x.shape[axis] - length) / step)), 0) * step + length
        x = force_length(
            x,
            newlength,
            axis=axis,
            pad_mode=pad_mode,
            cut_mode=cut_mode,
            allow_longer=False,
            key=key,
        )
    return _unfold(x, length, step, axis)
