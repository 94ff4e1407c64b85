"""Tensor parallelism for the Whisper family (2-D ``data`` x ``model`` mesh).

Whisper-large (1280-wide, 32 layers) fits one v5e chip for inference, but
sharding the width axis cuts latency and enables larger extraction batches —
SURVEY.md §2.8/§5.8's "optional model axis for Whisper-large TP". The scheme
is the standard Megatron split, expressed purely through parameter shardings
(GSPMD propagates activations and inserts the psums over ICI):

  attn q/k/v kernels   (D, D)  -> P(None, "model")   heads split across chips
  attn out kernel      (D, D)  -> P("model", None)   row-parallel, psum after
  mlp_fc1 kernel       (D, 4D) -> P(None, "model")   column-parallel
  mlp_fc2 kernel       (4D, D) -> P("model", None)   row-parallel, psum after
  biases of column-parallel layers follow their outputs; everything else
  (convs, LayerNorms, embeddings) is replicated.

Use ``use_flash=False`` models under TP: the Pallas attention kernel has no
GSPMD partitioning rule, while the XLA einsum attention partitions cleanly
along the head axis. (The extract --tp CLI path rebuilds its model with
use_flash=False automatically; library callers must pass it themselves.)
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# leaf-name patterns (joined flax param paths) -> PartitionSpec
_RULES = (
    (("attn", "q", "kernel"), P(None, "model")),
    (("attn", "q", "bias"), P("model")),
    (("attn", "k", "kernel"), P(None, "model")),
    (("attn", "v", "kernel"), P(None, "model")),
    (("attn", "v", "bias"), P("model")),
    (("attn", "out", "kernel"), P("model", None)),
    (("cross_attn", "q", "kernel"), P(None, "model")),
    (("cross_attn", "q", "bias"), P("model")),
    (("cross_attn", "k", "kernel"), P(None, "model")),
    (("cross_attn", "v", "kernel"), P(None, "model")),
    (("cross_attn", "v", "bias"), P("model")),
    (("cross_attn", "out", "kernel"), P("model", None)),
    (("mlp_fc1", "kernel"), P(None, "model")),
    (("mlp_fc1", "bias"), P("model")),
    (("mlp_fc2", "kernel"), P("model", None)),
)


def _spec_for(path: tuple, ndim: int) -> P:
    names = tuple(
        p.key if hasattr(p, "key") else str(p) for p in path
    )
    for pattern, spec in _RULES:
        if len(names) >= len(pattern) and tuple(names[-len(pattern):]) == pattern:
            if "blocks" in names and ndim == len(spec) + 1:
                # nn.scan layout: leading layer axis — shift the spec right
                return P(None, *spec)
            return spec
    return P()  # replicated


def whisper_param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a Whisper param tree on a mesh with a
    ``model`` axis (and optionally ``data``). Handles both the unrolled
    (block_i) and nn.scan (blocks/block, leading layer axis) layouts."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf.ndim)), params
    )


def shard_params(params, mesh: Mesh):
    """device_put the param tree with TP shardings."""
    shardings = whisper_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def make_tp_mesh(
    n_model: int, n_data: Optional[int] = None, devices=None
) -> Mesh:
    """(data, model) mesh: model axis innermost (fastest ICI links)."""
    import numpy as np

    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (n_data, n_model, len(devices))
    return Mesh(devices.reshape(n_data, n_model), axis_names=("data", "model"))


def tp_decode_fn(
    model, mesh: Mesh, config, prompt, max_len: int = 224, eot=None,
    cross_kv_dtype=None, self_kv_dtype=None,
):
    """Jitted TP greedy decode (the hs_last_* extraction workload at
    Whisper-large scale): params TP-sharded via :func:`shard_params`, clip
    batch sharded over ``data``, width/heads split over ``model``.

    The same Megatron param shardings cover the decoder (q/k/v + cross_attn
    column-parallel by heads, out/fc2 row-parallel); GSPMD propagates them
    through the prefill and the KV-cached decode while_loop, so the per-chip
    KV caches hold only that chip's head shard and the only cross-chip
    traffic is the out-projection psum per step.

    Returns ``fn(sharded_params, mel) -> {tokens, lengths, hidden, ...}``.
    """
    from wealy_tpu.models.whisper.generate import greedy_decode
    from wealy_tpu.models.whisper.model import Whisper

    mel_sharding = NamedSharding(mesh, P("data", None, None))

    @jax.jit
    def decode(params, mel):
        mel = jax.lax.with_sharding_constraint(mel, mel_sharding)
        states = model.apply({"params": params}, mel, method=Whisper.encode)
        out = greedy_decode(
            model, params, states, config, prompt=prompt, max_len=max_len,
            eot=eot, cross_kv_dtype=cross_kv_dtype,
            self_kv_dtype=self_kv_dtype,
        )
        return {
            k: jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
            )
            for k, v in out.items()
        }

    return decode


def tp_encode_fn(model, mesh: Mesh, sequence_parallel: bool = False):
    """Jitted TP encoder: mel batch sharded over ``data``, params TP-sharded.

    Returns ``fn(sharded_params, mel) -> (B, T, D) states`` (output sharded
    over ``data`` on the batch dim). Pass params through :func:`shard_params`
    first so GSPMD sees the TP layout.

    ``sequence_parallel``: Megatron-style SP on top of TP — the residual
    stream between blocks carries a ``P("data", "model", None)`` constraint,
    i.e. the TIME axis is sharded over the same chips that split the width.
    GSPMD then computes the LayerNorms and residual adds on T/n_model
    sequence slices per chip and materializes the full sequence only inside
    the Megatron regions (all_gather going in, reduce_scatter coming out
    replace the plain psum) — cutting inter-block activation residency and
    LN/elementwise work per chip by the model-axis factor. Implemented as a
    flax method interceptor on each block's output, so the parity-critical
    model code stays untouched and un-forked.
    """
    from flax import linen as nn

    from wealy_tpu.models.whisper.model import ResidualAttentionBlock, Whisper

    mel_sharding = NamedSharding(mesh, P("data", None, None))
    out_sharding = NamedSharding(mesh, P("data", None, None))
    is_full_model = isinstance(model, Whisper)

    seq_sharding = NamedSharding(mesh, P("data", "model", None))

    def _sp_interceptor(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        if (
            isinstance(context.module, ResidualAttentionBlock)
            and context.method_name == "__call__"
            and isinstance(out, tuple)
            and len(out) == 2
        ):
            y, cache = out
            return jax.lax.with_sharding_constraint(y, seq_sharding), cache
        return out

    @jax.jit
    def encode(params, mel):
        mel = jax.lax.with_sharding_constraint(mel, mel_sharding)
        from contextlib import nullcontext

        ctx = (
            nn.intercept_methods(_sp_interceptor)
            if sequence_parallel
            else nullcontext()
        )
        with ctx:
            if is_full_model:
                states = model.apply(
                    {"params": params}, mel, method=Whisper.encode
                )
            else:  # bare WhisperEncoder
                states = model.apply({"params": params}, mel)
        return jax.lax.with_sharding_constraint(states, out_sharding)

    return encode
