"""Global-batch loss collectives.

CLEWS/NTXent/Triplet need the **global** batch for their B x B distance
matrices (in-batch negatives). Under data parallelism each chip holds a batch
shard; ``global_batch_loss`` wraps a loss so that embeddings/labels/idx are
all_gathered over the ``data`` axis before the loss runs — semantically
identical to the reference's single-device loss over the full batch
(lib/losses.py:40-45, :225-234), with gradients flowing back to each shard
through the all_gather transpose (a reduce-scatter XLA inserts automatically).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def global_batch_loss(loss_fn: Callable, mesh: Mesh, axis: str = "data"):
    """Wrap ``loss_fn(z_label, z_idx, z, extra) -> (loss, logdict)`` so it
    computes over the all_gathered global batch.

    The wrapped function takes per-shard arrays (sharded on dim 0 over
    ``axis``) and returns the (replicated) global loss + logdict. Use inside a
    pjit-ted train step whose batch inputs are sharded over ``axis``.
    """

    def _local(z_label, z_idx, z, extra):
        zl = jax.lax.all_gather(z_label, axis, tiled=True)
        zi = jax.lax.all_gather(z_idx, axis, tiled=True)
        zg = jax.lax.all_gather(z, axis, tiled=True)
        return loss_fn(zl, zi, zg, extra)

    @functools.wraps(loss_fn)
    def wrapped(z_label, z_idx, z, extra=None):
        return shard_map(
            _local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P()),
            out_specs=P(),
            check_vma=False,
        )(z_label, z_idx, z, extra)

    return wrapped
