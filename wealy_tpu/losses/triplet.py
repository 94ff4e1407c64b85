"""Triplet margin loss with vectorized first-valid mining.

Behavioral parity target: ``TripletLoss`` in /root/reference/lib/losses.py:76-171.
The reference mines triplets with a Python loop over the batch (first valid
positive = same label & different idx; first valid negative = different label).
Here the "first valid" selections are masked argmaxes — a single gather, no
host loop — and anchors without a valid (pos, neg) pair are masked out of the
mean, so the whole loss is one fused XLA computation.

Distance matches ``torch.nn.TripletMarginLoss``: d(a, b) = ||a - b + eps||_p,
loss = mean(relu(d_ap - d_an + margin)) over valid anchors; 0.0 when no valid
triplets exist (reference lib/losses.py:111-121).
"""

from __future__ import annotations

import jax.numpy as jnp

from wealy_tpu.losses.common import pos_neg_masks, stabilize_labels, z_stats


def _pairwise_p_distance(a, b, p: float, eps: float):
    # torch.pairwise_distance adds eps inside the norm for d/dx stability.
    return jnp.sum(jnp.abs(a - b + eps) ** p, axis=-1) ** (1.0 / p)


def triplet_loss(
    z_label,
    z_idx,
    z,
    extra=None,
    margin: float = 0.2,
    p: float = 2,
    eps: float = 1e-6,
    swap: bool = False,
):
    """Triplet margin loss. Returns (loss, logdict)."""
    del extra
    assert z_label.shape[0] == z_idx.shape[0] == z.shape[0]
    z_label = stabilize_labels(z_label)
    pos_mask, neg_mask = pos_neg_masks(z_label, z_idx)

    # First valid positive/negative per anchor: argmax over a boolean mask
    # returns the first True (ties broken by lowest index, like the
    # reference's torch.where(...)[0][0]).
    pos_idx = jnp.argmax(pos_mask, axis=1)
    neg_idx = jnp.argmax(neg_mask, axis=1)
    valid = jnp.any(pos_mask, axis=1) & jnp.any(neg_mask, axis=1)

    anchor = z
    positive = z[pos_idx]
    negative = z[neg_idx]

    d_ap = _pairwise_p_distance(anchor, positive, p, eps)
    d_an = _pairwise_p_distance(anchor, negative, p, eps)
    if swap:
        d_pn = _pairwise_p_distance(positive, negative, p, eps)
        d_an = jnp.minimum(d_an, d_pn)

    per_anchor = jnp.maximum(d_ap - d_an + margin, 0.0)
    n_valid = jnp.sum(valid)
    loss = jnp.sum(jnp.where(valid, per_anchor, 0.0)) / jnp.maximum(n_valid, 1)
    # No valid triplets -> exactly 0.0 (covered by the sum over empty set).

    logdict = {"l_main": loss, "n_triplets": n_valid, **z_stats(z)}
    return loss, logdict


class TripletLoss:
    """Callable wrapper holding the margin config (reference lib/losses.py:81-89)."""

    def __init__(self, margin: float = 0.2, p: float = 2, eps: float = 1e-6, swap: bool = False):
        self.margin = float(margin)
        self.p = float(p)
        self.eps = float(eps)
        self.swap = bool(swap)

    def __call__(self, z_label, z_idx, z, extra=None):
        return triplet_loss(
            z_label,
            z_idx,
            z,
            extra=extra,
            margin=self.margin,
            p=self.p,
            eps=self.eps,
            swap=self.swap,
        )
