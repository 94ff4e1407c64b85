"""Masked reductions (mask: True = excluded).

Behavioral parity targets: ``msum``/``mmean``/``mmin``/``mmax``/``mrand``/
``mbest``/``mworst`` in /root/reference/lib/tensor_ops.py:182-282, re-expressed
as pure jnp so XLA can fuse them into surrounding compute. All functions are
jit-safe: shapes are static, reduction axes are Python-level constants.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

Axis = Union[None, int, Sequence[int]]

_EPS = 1e-7


def _axes_tuple(x: jnp.ndarray, axis: Axis) -> tuple:
    if axis is None:
        return tuple(range(x.ndim))
    if isinstance(axis, int):
        return (axis % x.ndim,)
    return tuple(a % x.ndim for a in axis)


def _restore_keepdims(x_reduced: jnp.ndarray, ndim: int, keepdims: bool) -> jnp.ndarray:
    """For axis=None reductions: optionally re-expand to the input rank."""
    if keepdims:
        return x_reduced.reshape((1,) * ndim)
    return x_reduced


def msum(x, mask=None, axis: Axis = None, keepdims: bool = False):
    """Masked sum. ``mask=True`` entries are excluded."""
    if mask is not None:
        x = jnp.where(mask, jnp.zeros_like(x), x)
    if axis is None:
        return _restore_keepdims(jnp.sum(x), x.ndim, keepdims)
    return jnp.sum(x, axis=_axes_tuple(x, axis), keepdims=keepdims)


def mmean(x, mask=None, axis: Axis = None, keepdims: bool = False, eps: float = _EPS):
    """Masked mean with eps-clamped denominator. ``mask=True`` entries excluded."""
    if mask is None:
        included = jnp.ones_like(x)
        xz = x
    else:
        included = jnp.logical_not(mask).astype(x.dtype)
        # where (not multiply) so excluded inf/nan entries cannot poison the sum
        xz = jnp.where(mask, jnp.zeros_like(x), x)
    if axis is None:
        num = jnp.sum(xz)
        den = jnp.sum(included)
        out = num / jnp.clip(den, min=eps)
        return _restore_keepdims(out, x.ndim, keepdims)
    axes = _axes_tuple(x, axis)
    num = jnp.sum(xz, axis=axes, keepdims=keepdims)
    den = jnp.sum(included, axis=axes, keepdims=keepdims)
    return num / jnp.clip(den, min=eps)


def _mextreme(x, mask, axis, keepdims, fill, reduce_fn):
    if mask is not None:
        x = jnp.where(mask, jnp.asarray(fill, dtype=x.dtype), x)
    if axis is None:
        return _restore_keepdims(reduce_fn(x), x.ndim, keepdims)
    return reduce_fn(x, axis=_axes_tuple(x, axis), keepdims=keepdims)


def mmin(x, mask=None, axis: Axis = None, keepdims: bool = False, ctt=jnp.inf):
    """Masked min; excluded entries are filled with ``ctt`` (default +inf)."""
    return _mextreme(x, mask, axis, keepdims, ctt, jnp.min)


def mmax(x, mask=None, axis: Axis = None, keepdims: bool = False, ctt=-jnp.inf):
    """Masked max; excluded entries are filled with ``ctt`` (default -inf)."""
    return _mextreme(x, mask, axis, keepdims, ctt, jnp.max)


def mrand(
    x,
    key: jax.Array,
    mask=None,
    axis: Axis = None,
    keepdims: bool = False,
    ctt=jnp.inf,
    eps: float = _EPS,
):
    """Pick one random unmasked entry (per reduction group) via the rand+min trick.

    Draws uniform noise, masks it to +inf on excluded entries, and averages x
    over the single position attaining the minimum noise (reference
    lib/tensor_ops.py:261-266). Requires an explicit PRNG ``key`` — JAX has no
    global RNG state.
    """
    r = jax.random.uniform(key, x.shape, dtype=jnp.float32)
    if mask is not None:
        r = jnp.where(mask, jnp.asarray(ctt, dtype=r.dtype), r)
    mr = r > mmin(r, mask=mask, axis=axis, keepdims=True, ctt=ctt)
    return mmean(x, mask=mr, axis=axis, keepdims=keepdims, eps=eps)


def _topk_along_axis(x, k: int, axis: int, largest: bool):
    axis = axis % x.ndim
    moved = jnp.moveaxis(x, axis, -1)
    vals = jax.lax.top_k(moved if largest else -moved, k)[0]
    if not largest:
        vals = -vals
    return jnp.moveaxis(vals, -1, axis)


def mbest(
    x,
    k: int,
    mask=None,
    axis: int = -1,
    keepdims: bool = False,
    ctt=jnp.inf,
    eps: float = _EPS,
):
    """Mean of the k smallest unmasked entries along ``axis``.

    Excluded entries are filled with ``ctt`` before top-k; any selected entry
    that still equals/exceeds ``ctt`` (i.e. fewer than k valid entries) is
    dropped from the mean (reference lib/tensor_ops.py:269-274).
    """
    assert isinstance(axis, int), "mbest requires a single int axis"
    if mask is not None:
        x = jnp.where(mask, jnp.asarray(ctt, dtype=x.dtype), x)
    x = _topk_along_axis(x, k, axis, largest=False)
    return mmean(x, mask=x >= ctt, axis=axis, keepdims=keepdims, eps=eps)


def mworst(
    x,
    k: int,
    mask=None,
    axis: int = -1,
    keepdims: bool = False,
    ctt=-jnp.inf,
    eps: float = _EPS,
):
    """Mean of the k largest unmasked entries along ``axis`` (see :func:`mbest`)."""
    assert isinstance(axis, int), "mworst requires a single int axis"
    if mask is not None:
        x = jnp.where(mask, jnp.asarray(ctt, dtype=x.dtype), x)
    x = _topk_along_axis(x, k, axis, largest=True)
    return mmean(x, mask=x <= ctt, axis=axis, keepdims=keepdims, eps=eps)
