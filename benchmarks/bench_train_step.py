"""Metric-learning train-step throughput on the real TPU (BASELINE config 5:
contrastive training with in-batch negatives).

Workload: ProjectionHead (1280 -> 512, one hidden layer) over (B, 1000, 1280)
whisper-embedding chunks — the reference's Phase-B training geometry
(chunk_size 1000, hs_last_seq dim 1280) — CLEWS loss, AdamW.

Timing: steps are chained ON DEVICE with lax.scan (state threaded through the
carry — the true training dependence) and read back once. Per-step Python
dispatch through the remote-TPU tunnel costs ~300 ms/step of pure RTT at
B=64 vs 4.3 ms of device time, so host-loop timing measures the tunnel, not
the TPU (BENCH_NOTES methodology).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from wealy_tpu.losses import clews_loss
from wealy_tpu.models.heads import ProjectionHead
from wealy_tpu.train import create_train_state
from wealy_tpu.train.state import make_optimizer


def run(B, L=1000, C=1280, iters=20):
    model = ProjectionHead(zdim=512, hidden=(512,), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    state = create_train_state(
        model,
        (jnp.zeros((B, L, C), jnp.bfloat16), jnp.ones((B, L), bool)),
        tx=make_optimizer(lr=1e-3, warmup_steps=10, max_steps=10_000),
    )
    emb = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32)).astype(jnp.bfloat16)
    mask = jnp.ones((B, L), bool)
    labels = jnp.asarray(np.repeat(np.arange(B // 2, dtype=np.int32), 2))
    ids = jnp.arange(B, dtype=jnp.int32)
    tx = state.tx

    def one_step(carry, _):
        params, opt_state, step_i = carry

        def compute(p):
            z = model.apply({"params": p}, emb, mask)
            loss, _ld = clews_loss(labels, ids, z, {"global_step": step_i})
            return loss

        loss, grads = jax.value_and_grad(compute)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, step_i + 1), loss

    @jax.jit
    def train_n(params, opt_state, n_arr):
        (params, opt_state, _), losses = jax.lax.scan(
            one_step, (params, opt_state, jnp.int32(0)), n_arr
        )
        return losses

    n_arr = jnp.zeros((iters,), jnp.float32)
    np.asarray(train_n(state.params, state.opt_state, n_arr))  # compile
    t0 = time.perf_counter()
    losses = np.asarray(train_n(state.params, state.opt_state, n_arr))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(losses).all()
    print(json.dumps({
        "B": B, "ms_per_step": round(dt * 1e3, 2),
        "steps_per_s": round(1 / dt, 1),
        "chunks_per_s": round(B / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    for B in (32, 64):
        run(B)
