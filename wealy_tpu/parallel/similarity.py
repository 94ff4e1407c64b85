"""Sharded all-pairs similarity — the corpus-scale retrieval compute.

The reference computes a monolithic (N, N) matrix on one device
(lib/tensor_ops.py:152-176 + the implied eval, SURVEY.md §3.4). Here the
query rows are sharded over the mesh's ``data`` axis: each chip holds a row
slab, candidates are replicated (or streamed in column blocks for very large
corpora), and each chip computes ``q_slab @ cᵀ`` on its MXU — the only
all-to-all pattern the capability set needs (SURVEY.md §2.8 item 4).

``sharded_topk`` never materializes the full matrix on one device: each chip
reduces its row slab to (k) candidates locally; ranks/metrics are computed on
the host from the k-sized result.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wealy_tpu.ops.distance import pairwise_distance_matrix
from wealy_tpu.parallel.mesh import data_sharding, replicated


def _pad_rows(x, multiple: int):
    n = x.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    pad = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad), n


def sharded_pairwise_distance(
    x,
    y,
    mesh: Mesh,
    mode: str = "cossim",
    block_size: Optional[int] = None,
):
    """(Q, C) x (N, C) -> (Q, N) distance/similarity, query rows sharded.

    Queries are padded to a multiple of the data-axis size, sharded over
    chips; candidates are replicated. With ``block_size``, candidate columns
    are processed in blocks under ``lax.map`` to bound per-chip memory
    (Q/d x block instead of Q/d x N).
    """
    n_dev = mesh.shape["data"]
    xp, q_real = _pad_rows(jnp.asarray(x), n_dev)

    in_shardings = (data_sharding(mesh, 2), replicated(mesh))
    out_sharding = data_sharding(mesh, 2)

    if block_size is None:

        @functools.partial(
            jax.jit, in_shardings=in_shardings, out_shardings=out_sharding
        )
        def _dist(xs, ys):
            return pairwise_distance_matrix(xs, ys, mode=mode)

        d = _dist(xp, jnp.asarray(y))
    else:
        y = jnp.asarray(y)
        yb, n_real = _pad_rows(y, block_size)
        n_blocks = yb.shape[0] // block_size
        yblocks = yb.reshape(n_blocks, block_size, yb.shape[-1])

        @functools.partial(
            jax.jit,
            in_shardings=(data_sharding(mesh, 2), replicated(mesh)),
            out_shardings=out_sharding,
        )
        def _dist_blocked(xs, ybl):
            def one(yb_i):
                return pairwise_distance_matrix(xs, yb_i, mode=mode)

            # (n_blocks, Q, block) -> (Q, n_blocks*block)
            blocks = jax.lax.map(one, ybl)
            return jnp.moveaxis(blocks, 0, 1).reshape(xs.shape[0], -1)

        d = _dist_blocked(xp, yblocks)[:, : y.shape[0]]
    return d[:q_real]


def sharded_topk(
    x,
    y,
    mesh: Mesh,
    k: int,
    mode: str = "cossim",
    largest: Optional[bool] = None,
):
    """Top-k candidate indices+scores per query without materializing (Q, N)
    on any single host array.

    For similarity modes (``cossim``/``dotsim``) top-k means largest; for
    distance modes smallest. Returns (values (Q, k), indices (Q, k)).
    """
    if largest is None:
        largest = mode.endswith("sim")
    n_dev = mesh.shape["data"]
    xp, q_real = _pad_rows(jnp.asarray(x), n_dev)

    @functools.partial(
        jax.jit,
        in_shardings=(data_sharding(mesh, 2), replicated(mesh)),
        out_shardings=(data_sharding(mesh, 2), data_sharding(mesh, 2)),
    )
    def _topk(xs, ys):
        d = pairwise_distance_matrix(xs, ys, mode=mode)
        vals, idx = jax.lax.top_k(d if largest else -d, k)
        return (vals if largest else -vals), idx

    vals, idx = _topk(xp, jnp.asarray(y))
    return vals[:q_real], idx[:q_real]
