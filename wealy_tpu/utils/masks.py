"""Mask-convention converters.

The reference (and this framework) carries two opposite boolean mask
conventions (SURVEY.md §7 "hard parts"):

- **ops convention** (wealy_tpu.ops == lib/tensor_ops.py): True = excluded.
- **layer convention** (wealy_tpu.models.layers == lib/layers.py MeanPool,
  audio collate attention masks): True = valid.

Convert at module boundaries with these helpers so intent is greppable.
"""

import jax.numpy as jnp


def valid_to_excluded(mask):
    """Layer-convention (True=valid) -> ops-convention (True=excluded)."""
    return jnp.logical_not(mask)


def excluded_to_valid(mask):
    """Ops-convention (True=excluded) -> layer-convention (True=valid)."""
    return jnp.logical_not(mask)
