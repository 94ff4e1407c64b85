"""Segment-pair distance tensor reduction — the song-level scoring machinery.

Behavioral parity target: ``distance_tensor_redux`` in
/root/reference/lib/tensor_ops.py:288-373. Reduces a (b1, b2, s1, s2) tensor of
segment-pair distances to (b1, b2) song-pair distances.

TPU-first notes:
  - The reference's ``bpwr`` ("best pairs without replacement") greedy knockout
    is a data-dependent Python loop; here it is a fixed-trip-count
    ``lax.fori_loop`` with masked updates, so it compiles once and runs fully
    on-device.
  - Randomized modes (``randmin``, the tie-breaking jitter in ``bpwr``) take an
    explicit PRNG key; pass ``key=None`` for deterministic behavior (no jitter).
  - The reference's ``worst`` mode computes its validity mask as ``x >= -inf``
    (always true), which zeroes the result whenever a mask is used — an evident
    bug. We implement the symmetric-to-``best`` intent: entries equal to the
    -inf fill are dropped from the mean.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from wealy_tpu.ops.masked import mbest, mmean, mmin, mmax, mrand, mworst


def _bpwr(dist, mask, n: int, eps: float, inf: float, key: Optional[jax.Array]):
    """Greedy best-pairs-without-replacement over the last two dims.

    Each of the ``n`` rounds selects the global minimum of the still-allowed
    entries, then knocks out its row and column. The selected entries are
    averaged at the end. Fixed trip count -> single XLA while loop.
    """
    # Transpose so s1 <= s2 (reference lib/tensor_ops.py:308-311).
    if dist.shape[3] < dist.shape[2]:
        dist = jnp.swapaxes(dist, 2, 3)
        if mask is not None:
            mask = jnp.swapaxes(mask, 2, 3)
    n = max(1, min(n, dist.shape[2]))
    if key is not None:
        dist = dist + eps * jax.random.uniform(key, dist.shape, dtype=dist.dtype)
    if mask is None:
        mask = dist > inf  # all-False unless dist already saturated
    all_sel = jnp.zeros_like(mask)

    def body(i, carry):
        m, sel_acc = carry
        mn = mmin(dist, mask=m, axis=(-1, -2), keepdims=True, ctt=inf)
        sel = (dist <= mn) & jnp.logical_not(m)
        sel_acc = sel_acc | sel
        row_hit = mmin(dist, mask=m, axis=-1, keepdims=True, ctt=inf) <= mn
        col_hit = mmin(dist, mask=m, axis=-2, keepdims=True, ctt=inf) <= mn
        # The final round's knockout is harmless (m is not read again), so we
        # apply it unconditionally instead of branching like the reference.
        m = m | row_hit | col_hit
        return (m, sel_acc)

    _, all_sel = lax.fori_loop(0, n, body, (mask, all_sel))
    return mmean(dist, mask=jnp.logical_not(all_sel), axis=(-1, -2), keepdims=True, eps=eps)


def _flatten_tail(x):
    b1, b2, s1, s2 = x.shape
    return x.reshape(b1, b2, 1, s1 * s2)


def distance_tensor_redux(
    dist,
    redux: str,
    mask=None,
    squeeze: bool = True,
    eps: float = 1e-7,
    inf: float = 1e12,
    key: Optional[jax.Array] = None,
):
    """Reduce (b1, b2, s1, s2) segment distances to (b1, b2) song distances.

    Modes: ``min``, ``max``, ``mean``, ``minmean``, ``meanmin``, ``randmin``,
    ``bpwr[-n]``, ``best[-k]``, ``worst[-k]``, ``bestmin[-k]``, and symmetric
    ``s<mode>`` (average of both orientations). ``mask``: True = excluded.
    """
    if redux.startswith("bestmin"):
        # checked before "best" — reference order puts bestmin last but "best"
        # uses startswith, so "bestmin" must be dispatched first here.
        k = 1 if "-" not in redux else max(1, min(int(redux.split("-")[-1]), dist.shape[2]))
        d = mmin(dist, mask=mask, axis=-1, keepdims=True, ctt=inf)
        m = mask
        if m is not None:
            # after min over s2, the surviving mask is "row fully masked"
            m = jnp.all(m, axis=-1, keepdims=True)
        d = _flatten_tail_2(d)
        m = _flatten_tail_2(m) if m is not None else None
        d = mbest(d, k, mask=m, axis=-1, keepdims=True, ctt=inf, eps=eps)
        d = d[..., None]
    elif redux == "min":
        d = mmin(dist, mask=mask, axis=(-1, -2), keepdims=True, ctt=inf)
    elif redux == "max":
        d = mmax(dist, mask=mask, axis=(-1, -2), keepdims=True, ctt=-inf)
    elif redux == "mean":
        d = mmean(dist, mask=mask, axis=(-1, -2), keepdims=True, eps=eps)
    elif redux == "minmean":
        d = mmean(dist, mask=mask, axis=-1, keepdims=True, eps=eps)
        # Broadcast against the full (s1, s2) mask like the reference does
        # (torch broadcasting in the second-stage reduction,
        # lib/tensor_ops.py:297-299).
        if mask is not None:
            d = jnp.broadcast_to(d, mask.shape)
        d = mmin(d, mask=mask, axis=(-1, -2), keepdims=True, ctt=inf)
    elif redux == "meanmin":
        d = mmin(dist, mask=mask, axis=-1, keepdims=True, ctt=inf)
        # NOTE: with a mask, this is a count-weighted mean over row-minima —
        # rows with more valid s2 entries weigh more (broadcast semantics of
        # lib/tensor_ops.py:300-302, reproduced faithfully).
        if mask is not None:
            d = jnp.broadcast_to(d, mask.shape)
        d = mmean(d, mask=mask, axis=(-1, -2), keepdims=True, eps=eps)
    elif redux == "randmin":
        if key is None:
            raise ValueError("redux='randmin' requires an explicit PRNG key")
        d = mmin(dist, mask=mask, axis=-1, keepdims=True, ctt=inf)
        m = None if mask is None else jnp.all(mask, axis=-1, keepdims=True)
        d = mrand(d, key, mask=m, axis=(-1, -2), keepdims=True, ctt=inf, eps=eps)
    elif redux.startswith("bpwr"):
        n = dist.shape[2] if "-" not in redux else int(redux.split("-")[-1])
        d = _bpwr(dist, mask, n, eps, inf, key)
    elif redux.startswith("best"):
        k = 1 if "-" not in redux else max(
            1, min(int(redux.split("-")[-1]), dist.shape[2] * dist.shape[3])
        )
        d = _flatten_tail(dist)
        m = _flatten_tail(mask) if mask is not None else None
        d = mbest(d, k, mask=m, axis=-1, keepdims=True, ctt=inf, eps=eps)
    elif redux.startswith("worst"):
        k = 1 if "-" not in redux else max(
            1, min(int(redux.split("-")[-1]), dist.shape[2] * dist.shape[3])
        )
        d = _flatten_tail(dist)
        m = _flatten_tail(mask) if mask is not None else None
        d = mworst(d, k, mask=m, axis=-1, keepdims=True, ctt=-inf, eps=eps)
    elif redux.startswith("s"):
        aux1 = distance_tensor_redux(
            dist, redux[1:], mask=mask, squeeze=False, eps=eps, inf=inf, key=key
        )
        dist_t = jnp.swapaxes(dist, 2, 3)
        mask_t = jnp.swapaxes(mask, 2, 3) if mask is not None else None
        aux2 = distance_tensor_redux(
            dist_t, redux[1:], mask=mask_t, squeeze=False, eps=eps, inf=inf, key=key
        )
        aux2 = jnp.swapaxes(aux2, 2, 3)
        d = 0.5 * (aux1 + aux2)
    else:
        raise NotImplementedError(f"unknown redux mode: {redux!r}")
    if squeeze:
        d = d.reshape(d.shape[0], d.shape[1])
    return d


def _flatten_tail_2(x):
    """Flatten the last two dims of a (b1, b2, s1, 1) tensor into the last axis."""
    if x is None:
        return None
    b1, b2, s1, s2 = x.shape
    return x.reshape(b1, b2, s1 * s2)
