"""Small numeric utilities.

Behavioral parity targets: ``tensor_quantile``, ``covariance``,
``roughly_equal``, ``debug_inf_nan`` in /root/reference/lib/tensor_ops.py:8-29,
113-125. The reference's ``debug_inf_nan`` print-and-exit sanitizer becomes
:func:`check_finite`, a jit-safe ``checkify``-style guard (see also
``jax.config.update("jax_debug_nans", True)`` for debug runs).
"""

from __future__ import annotations

import jax.numpy as jnp


def tensor_quantile(x, q, axis: int = -1, keepdims: bool = False):
    """Nearest-rank quantile along ``axis`` via sort-and-gather.

    ``q`` must have the same rank as ``x`` (broadcast along ``axis``), matching
    the reference contract (lib/tensor_ops.py:8-15).
    """
    q = jnp.asarray(q)
    assert x.ndim == q.ndim
    axis = axis % x.ndim
    qn = jnp.round(jnp.clip(q, 0.0, 1.0) * (x.shape[axis] - 1)).astype(jnp.int32)
    sx = jnp.sort(x, axis=axis)
    xq = jnp.take_along_axis(sx, qn, axis=axis)
    if keepdims:
        return xq
    return jnp.squeeze(xq, axis=axis)


def covariance(x, eps: float = 1e-6):
    """Mean squared off-diagonal (upper-tri) covariance — decorrelation
    regularizer (lib/tensor_ops.py:113-118). x: (N, C)."""
    xx = x - jnp.mean(x, axis=0, keepdims=True)
    cov = (xx.T @ xx) / (x.shape[0] - 1)
    weight = jnp.triu(jnp.ones_like(cov), k=1)
    return jnp.sum(weight * cov**2) / (jnp.sum(weight) + eps)


def roughly_equal(x, y, tol: float = 1e-6):
    return jnp.abs(x - y) < tol


def check_finite(x, name: str = "tensor"):
    """Jit-safe NaN/Inf guard: returns (is_finite: bool scalar, x).

    Unlike the reference's ``debug_inf_nan`` (print + sys.exit,
    lib/tensor_ops.py:21-29), this composes under jit. Use
    ``jax.debug.print`` / error handling at the call site, or enable
    ``jax_debug_nans`` for hard failures in debug runs.
    """
    del name
    finite = jnp.all(jnp.isfinite(x))
    return finite, x
