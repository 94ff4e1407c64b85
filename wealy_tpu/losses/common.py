"""Shared helpers for the metric-learning losses."""

from __future__ import annotations

import jax.numpy as jnp


def stabilize_labels(z_label):
    """If the batch has a single unique label (no negatives), flip the first
    max(2, 1% of B) labels to -1 for loss stability.

    Jit-safe equivalent of the in-place mutation at reference
    lib/losses.py:34-35, :105-106, :221-222: the condition becomes a
    ``jnp.where`` select over a precomputed flipped copy.
    """
    B = z_label.shape[0]
    all_same = jnp.all(z_label == z_label[0])
    n_flip = max(2, int(0.01 * B))
    flip_pos = jnp.arange(B) < n_flip
    flipped = jnp.where(flip_pos, jnp.full_like(z_label, -1), z_label)
    return jnp.where(all_same, flipped, z_label)


def pos_neg_masks(z_label, z_idx):
    """Positives: same label & different idx. Negatives: different label.

    Returns boolean (B, B) masks with **True = member of the pair set**
    (note: this is the *opposite* of the tensor_ops mask convention; these are
    selection masks, not exclusion masks).
    """
    same_label = z_label[:, None] == z_label[None, :]
    same_idx = z_idx[:, None] == z_idx[None, :]
    pos = same_label & jnp.logical_not(same_idx)
    neg = jnp.logical_not(same_label)
    return pos, neg


def z_stats(z):
    """Embedding statistics shared by every loss logdict."""
    return {
        "v_zmax": jnp.max(jnp.abs(z)),
        "v_zmean": jnp.mean(z),
        "v_zstd": jnp.std(z, ddof=1),
    }
