"""Distributed layer: device mesh setup, sharded all-pairs similarity, and
global-batch loss collectives.

The reference has no distributed code at all (SURVEY.md §0, §2.8); this layer
is the TPU-native equivalent introduced as a first-class component:
- one `jax.sharding.Mesh` with a ``data`` axis (optionally ``model`` for
  Megatron TP/SP — tp.py — or ``stage`` for GPipe pipelining — pp.py),
- batch/query dims sharded over ICI, compute expressed in pjit/shard_map,
- `psum`/`all_gather`/`ppermute` collectives for loss reduction,
  similarity blocks, and pipeline activation hops.
"""

from wealy_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from wealy_tpu.parallel.similarity import (
    sharded_pairwise_distance,
    sharded_topk,
)
from wealy_tpu.parallel.collectives import global_batch_loss
from wealy_tpu.parallel.pp import make_pp_mesh, pp_encode_fn
from wealy_tpu.parallel.tp import make_tp_mesh, shard_params, tp_encode_fn

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "sharded_pairwise_distance",
    "sharded_topk",
    "global_batch_loss",
    "make_pp_mesh",
    "pp_encode_fn",
    "make_tp_mesh",
    "shard_params",
    "tp_encode_fn",
]
