"""CLEWS loss (cosine-geometry vector variant) — the paper's main loss.

Behavioral parity target: ``CLEWSLoss`` in /root/reference/lib/losses.py:176-285.

- Alignment: per-anchor mean positive cosine distance, averaged over anchors
  that have at least one positive.
- Uniformity: per-anchor log1p(mean over negatives of exp(b - gamma * d)),
  linearly warmed up from 0 to ``uniformity_weight`` over ``warmup_steps``
  (step read from ``extra["global_step"]``).

The warmup weight is computed with jnp so ``global_step`` may be a traced
scalar inside a jitted train step.

Note on diagnostics: the reference computes ``v_dpos`` as
``tops.mmean(d, mask=pos_mask)`` where tensor_ops' mask convention is
True = excluded — i.e. it actually averages over NON-positive pairs
(lib/losses.py:267-268). We report the evident intent instead: the mean
distance over positive pairs (and negative pairs for ``v_dneg``).
"""

from __future__ import annotations

import jax.numpy as jnp

from wealy_tpu.losses.common import pos_neg_masks, stabilize_labels


def _per_anchor_mean(x, mask, eps: float = 1e-8):
    """Per-anchor mean over dim 1, counting only mask=True entries. (B,B)->(B,)."""
    w = mask.astype(x.dtype)
    num = jnp.sum(x * w, axis=1)
    den = jnp.clip(jnp.sum(w, axis=1), min=eps)
    return num / den


def clews_loss(
    z_label,
    z_idx,
    z,
    extra=None,
    gamma: float = 8.0,
    b: float = 1.0,
    eps: float = 1e-8,
    epsilon: float = 1e-6,
    uniformity_weight: float = 0.5,
    warmup_steps: int = 1000,
    numerically_friendly: bool = True,
):
    """CLEWS loss. Returns (loss, logdict)."""
    if z.ndim == 3:
        assert z.shape[1] == 1, f"CLEWS (vector) expects S=1, got S={z.shape[1]}"
        z = z[:, 0, :]
    assert z.ndim == 2
    B = z.shape[0]
    assert z_label.shape[0] == z_idx.shape[0] == B and B >= 4

    z_label = stabilize_labels(z_label)
    pos_mask, neg_mask = pos_neg_masks(z_label, z_idx)

    # Cosine distance, matching retrieval geometry.
    zn = z / jnp.clip(jnp.linalg.norm(z, axis=-1, keepdims=True), min=1e-12)
    sim = zn @ zn.T
    d = 1.0 - sim  # in [0, 2]

    # Per-anchor alignment over anchors that have positives.
    align_i = _per_anchor_mean(d, pos_mask, eps=eps)
    has_pos = jnp.any(pos_mask, axis=1)
    n_has_pos = jnp.sum(has_pos)
    loss_align = jnp.sum(jnp.where(has_pos, align_i, 0.0)) / jnp.maximum(n_has_pos, 1)

    # Per-anchor uniformity over negatives.
    exp_term = jnp.exp(b - gamma * d)
    uni_i = _per_anchor_mean(exp_term, neg_mask, eps=eps)
    if numerically_friendly:
        loss_uniform = jnp.mean(jnp.log1p(uni_i))
    else:
        loss_uniform = jnp.mean(jnp.log(uni_i + epsilon))

    # Linear warmup of the uniformity weight.
    uw = jnp.asarray(uniformity_weight, dtype=d.dtype)
    if warmup_steps > 0 and isinstance(extra, dict) and "global_step" in extra:
        step = extra["global_step"]
        uw = jnp.minimum(uw, uw * (step + 1) / warmup_steps)

    loss = loss_align + uw * loss_uniform

    n_pos_pairs = jnp.sum(pos_mask.astype(d.dtype))
    n_neg_pairs = jnp.sum(neg_mask.astype(d.dtype))
    v_dpos = jnp.where(
        n_pos_pairs > 0,
        jnp.sum(d * pos_mask) / jnp.clip(n_pos_pairs, min=eps),
        0.0,
    )
    v_dneg = jnp.where(
        n_neg_pairs > 0,
        jnp.sum(d * neg_mask) / jnp.clip(n_neg_pairs, min=eps),
        0.0,
    )
    logdict = {
        "l_main": loss,
        "l_cent": loss_align,
        "l_cont": loss_uniform,
        "cnt_pos_pairs": n_pos_pairs,
        "cnt_neg_pairs": n_neg_pairs,
        "anchors_with_pos": jnp.mean(has_pos.astype(d.dtype)),
        "v_dpos": v_dpos,
        "v_dneg": v_dneg,
        "uniformity_weight": uw,
        "z_max": jnp.max(jnp.abs(zn)),
        "z_mean": jnp.mean(zn),
        "z_std": jnp.std(zn, ddof=1),
    }
    return loss, logdict


class CLEWSLoss:
    """Callable wrapper holding CLEWS hyperparameters (reference lib/losses.py:185-200)."""

    def __init__(
        self,
        gamma: float = 8.0,
        b: float = 1.0,
        eps: float = 1e-8,
        epsilon: float = 1e-6,
        uniformity_weight: float = 0.5,
        warmup_steps: int = 1000,
    ):
        self.gamma = float(gamma)
        self.b = float(b)
        self.eps = float(eps)
        self.epsilon = float(epsilon)
        self.uniformity_weight = float(uniformity_weight)
        self.warmup_steps = int(warmup_steps)

    def __call__(self, z_label, z_idx, z, extra=None, numerically_friendly=True):
        return clews_loss(
            z_label,
            z_idx,
            z,
            extra=extra,
            gamma=self.gamma,
            b=self.b,
            eps=self.eps,
            epsilon=self.epsilon,
            uniformity_weight=self.uniformity_weight,
            warmup_steps=self.warmup_steps,
            numerically_friendly=numerically_friendly,
        )
