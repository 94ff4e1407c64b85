"""Jitted train / eval steps with data-parallel sharding.

One train step = model forward on the local batch shard -> all_gather
embeddings over the ``data`` axis -> global-batch metric loss -> grads ->
optimizer update. Batch inputs are sharded on dim 0; params/opt state are
replicated. The ``(loss, logdict)`` channel is preserved end-to-end
(SURVEY.md §5.5).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from wealy_tpu.parallel.collectives import global_batch_loss
from wealy_tpu.parallel.mesh import data_sharding, replicated
from wealy_tpu.train.state import TrainState


def upcast_batch(batch: dict) -> dict:
    """float16/bfloat16 leaves -> float32 at the jit boundary.

    The input pipeline ships ``emb`` in the embedding store's fp16 disk dtype
    (``loop.batch_to_device``) to halve host->device bytes; model math stays
    f32, so widen on device (free: fuses into the first consumer)."""

    def up(x):
        x = jnp.asarray(x)
        if x.dtype in (jnp.float16, jnp.bfloat16):
            return x.astype(jnp.float32)
        return x

    return jax.tree_util.tree_map(up, batch)


def make_train_step(
    model,
    loss_fn: Callable,
    mesh: Optional[Mesh] = None,
    model_call: Optional[Callable] = None,
    with_batch_stats: bool = False,
    grad_accum: int = 1,
):
    """Build the jitted train step.

    ``model_call(params, batch) -> z (B, zdim)`` adapts the model signature to
    the batch dict; default assumes ``batch = {"emb": (B, T, C), "mask":
    (B, T), "labels": (B,), "ids": (B,)}`` and a single-input head.

    ``with_batch_stats``: for BatchNorm models (e.g. the CLEWS acoustic
    encoder) — ``model_call(params, batch_stats, batch) -> (z, new_stats)``
    and the state's ``batch_stats`` collection is threaded/updated.

    With a mesh, the loss consumes the all_gathered global batch; without, it
    runs single-device (tests / 1-chip).

    ``grad_accum > 1``: GradCache-style two-pass chunked step (Gao et al.,
    "Scaling Deep Contrastive Learning Batch Size under Memory Limited
    Setup") — naive microbatch accumulation would SHRINK the in-batch
    negative set (metric losses are batch-size sensitive, SURVEY.md §2.5),
    so instead: (1) embed the full batch in ``grad_accum`` activation-free
    chunks via ``lax.map``; (2) take the loss and its gradient wrt the
    FULL (B, zdim) embedding matrix — exact global-batch semantics, the
    B x B distance matrix is tiny; (3) re-forward each chunk under
    ``jax.vjp`` against its slice of dz and accumulate param grads in a
    ``lax.scan``. Peak activation memory is one chunk's; grads equal the
    single-pass step's exactly (asserted in tests) at ~1.33x the FLOPs
    (one extra forward). Requires B % grad_accum == 0; incompatible with
    ``with_batch_stats`` (BatchNorm batch semantics would change).
    """
    if grad_accum > 1 and with_batch_stats:
        raise ValueError(
            "grad_accum is incompatible with batch_stats (BatchNorm) models"
        )
    if model_call is None:
        if with_batch_stats:

            def model_call(params, batch_stats, batch):
                z, updates = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch["emb"],
                    train=True,
                    mutable=["batch_stats"],
                )
                return z, updates["batch_stats"]

        else:

            def model_call(params, batch):
                return model.apply({"params": params}, batch["emb"], batch["mask"])

    wrapped_loss = (
        global_batch_loss(loss_fn, mesh) if mesh is not None else loss_fn
    )

    if grad_accum > 1:
        n_micro = int(grad_accum)

        def _constrain(x, lead):
            # keep the per-chunk batch dim on the data axis through the
            # (B, ...) -> (n_micro, B/n_micro, ...) reshape under a mesh
            if mesh is None:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P(*([None] * lead + ["data"] + [None] * (x.ndim - lead - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec)
            )

        def _step_accum(state: TrainState, batch: dict):
            batch = upcast_batch(batch)
            B = batch["labels"].shape[0]
            if B % n_micro:
                raise ValueError(
                    f"batch size {B} not divisible by grad_accum {n_micro}"
                )
            m = B // n_micro
            chunks = {
                k: _constrain(
                    jnp.reshape(jnp.asarray(v), (n_micro, m) + v.shape[1:]), 1
                )
                for k, v in batch.items()
            }

            # (1) activation-free embedding pass, one chunk resident at a time
            z = lax.map(
                lambda mb: model_call(state.params, mb), chunks
            )  # (n_micro, m, zdim)
            z = _constrain(jnp.reshape(z, (B, -1)), 0)

            # (2) loss + dL/dz on the full embedding matrix (exact in-batch
            # negatives; the B x B geometry never touches the encoder)
            def loss_of_z(z):
                return wrapped_loss(
                    batch["labels"], batch["ids"], z,
                    {"global_step": state.step},
                )

            (loss, logdict), dz = jax.value_and_grad(
                loss_of_z, has_aux=True
            )(z)
            dz = _constrain(jnp.reshape(dz, (n_micro, m, dz.shape[-1])), 1)

            # (3) recompute each chunk under vjp, accumulate param grads
            def body(acc, xs):
                mb, dz_mb = xs
                _, pullback = jax.vjp(
                    lambda p: model_call(p, mb), state.params
                )
                (g,) = pullback(dz_mb)
                return jax.tree_util.tree_map(jnp.add, acc, g), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.result_type(p)),
                state.params,
            )
            grads, _ = lax.scan(body, zeros, (chunks, dz))

            new_state = state.apply_gradients(grads)
            logdict = dict(logdict)
            logdict["loss"] = loss
            return new_state, logdict

        return jax.jit(_step_accum, donate_argnums=(0,))

    def _step(state: TrainState, batch: dict):
        batch = upcast_batch(batch)

        def compute(params):
            if with_batch_stats:
                z, new_stats = model_call(params, state.batch_stats, batch)
            else:
                z = model_call(params, batch)
                new_stats = None
            loss, logdict = wrapped_loss(
                batch["labels"], batch["ids"], z, {"global_step": state.step}
            )
            return loss, (logdict, new_stats)

        (loss, (logdict, new_stats)), grads = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        logdict = dict(logdict)
        logdict["loss"] = loss
        return new_state, logdict

    # Sharding is carried by the inputs: put the batch on device with
    # :func:`shard_batch` (dim 0 over the data axis) and jit propagates it.
    # This keeps the step generic over batch layouts (single-modal dicts,
    # multimodal dicts, extra keys).
    return jax.jit(_step, donate_argnums=(0,))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put every array leaf of a batch dict sharded on dim 0 over the
    mesh's ``data`` axis. Leaves whose batch dim does not divide the data
    axis (tiny test corpora, trailing odd batches) are placed unsharded —
    GSPMD reshards them at the jit boundary, trading input-path parallelism
    for correctness on that batch only."""
    n_data = mesh.shape["data"]

    def put(x):
        x = jnp.asarray(x)
        if x.ndim == 0 or x.shape[0] % n_data:
            return jax.device_put(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return {k: put(v) for k, v in batch.items()}


def make_eval_embed_step(model, mesh: Optional[Mesh] = None, model_call=None):
    """Jitted embedding pass for evaluation: batch -> z, batch-sharded."""
    if model_call is None:

        def model_call(params, emb, mask):
            return model.apply({"params": params}, emb, mask)

    if mesh is None:
        return jax.jit(model_call)
    return jax.jit(
        model_call,
        in_shardings=(None, data_sharding(mesh, 3), data_sharding(mesh, 2)),
        out_shardings=data_sharding(mesh, 2),
    )
