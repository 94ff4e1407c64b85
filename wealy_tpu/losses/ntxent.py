"""NT-Xent contrastive loss on cosine similarity.

Behavioral parity target: ``NTXentLoss`` in /root/reference/lib/losses.py:10-73.
Formula: logits = cos_sim / tau with the diagonal masked to -1e9, row-max
subtracted, loss = -log(sum(pos_exp) / (sum(all_exp) + eps) + eps) averaged
over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wealy_tpu.losses.common import pos_neg_masks, stabilize_labels, z_stats
from wealy_tpu.ops.distance import pairwise_distance_matrix


def ntxent_loss(z_label, z_idx, z, extra=None, temperature: float = 0.1):
    """NT-Xent loss. Returns (loss, logdict)."""
    del extra
    assert z_label.shape[0] == z_idx.shape[0] == z.shape[0]
    z_label = stabilize_labels(z_label)
    positives, _ = pos_neg_masks(z_label, z_idx)

    sim = pairwise_distance_matrix(z, z, mode="cossim")
    logits = sim / temperature
    B = logits.shape[0]
    diag = jnp.eye(B, dtype=bool)
    logits = jnp.where(diag, -1e9, logits)

    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))
    exp_logits = jnp.exp(logits)
    pos_exp_sum = jnp.sum(exp_logits * positives.astype(exp_logits.dtype), axis=1)
    all_exp_sum = jnp.sum(exp_logits, axis=1)

    eps = 1e-8
    loss = -jnp.mean(jnp.log(pos_exp_sum / (all_exp_sum + eps) + eps))
    logdict = {"l_main": loss, **z_stats(z)}
    return loss, logdict


class NTXentLoss:
    """Callable wrapper holding the temperature (reference lib/losses.py:15-17)."""

    def __init__(self, temperature: float = 0.1):
        self.tau = float(temperature)

    def __call__(self, z_label, z_idx, z, extra=None):
        return ntxent_loss(z_label, z_idx, z, extra=extra, temperature=self.tau)
