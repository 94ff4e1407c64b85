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

# tp/pp re-export lazily (PEP 562): pp.py imports flax + the whisper model,
# which must not tax every `from wealy_tpu.parallel.mesh import make_mesh`
_LAZY = {
    "make_pp_mesh": "pp", "pp_encode_fn": "pp",
    "make_tp_mesh": "tp", "shard_params": "tp", "tp_encode_fn": "tp",
    "make_cp_mesh": "ring", "ring_attention": "ring",
}


def __getattr__(name):
    mod = _LAZY.get(name)
    if mod is None:
        raise AttributeError(name)
    import importlib

    return getattr(importlib.import_module(f"wealy_tpu.parallel.{mod}"), name)


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
    "make_cp_mesh",
    "ring_attention",
]
