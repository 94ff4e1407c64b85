"""GradCache-style grad-accumulation (train.grad_accum): measured memory /
throughput trade on the real chip.

The production train batch is (B, 1000, 1280) hs_last_seq windows through
the WEALY ProjectionHead (SURVEY.md §3.3); a single-pass step stores the
ConvBlock activation stack for the whole batch, so B is HBM-bounded. The
two-pass step (train/step.py grad_accum) keeps the EXACT global-batch
metric-loss semantics while holding activations for one B/grad_accum chunk
— this bench reports step time + device peak_bytes_in_use per (B,
grad_accum), and whether the single-pass arm OOMs where the chunked one
fits.

    python benchmarks/bench_grad_accum.py [B,B,...] [accum,accum,...] [T] [hidden,...]

``T`` (chunk length, default 1000) and ``hidden`` (head widths, default
512,512) parameterize the CAPACITY probe (round-4 VERDICT #6): longer
chunk windows / deeper heads push activation residency past what XLA's
own rematerialization absorbs, so the reachable-B boundary of the
single-pass arm vs the accum arm becomes measurable on one chip.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wealy_tpu.losses import clews_loss
from wealy_tpu.models.heads import ProjectionHead
from wealy_tpu.train import create_train_state, make_train_step
from wealy_tpu.train.state import make_optimizer

C = 1280  # whisper hs_last_seq dim


def peak_mb() -> float:
    stats = jax.local_devices()[0].memory_stats() or {}
    return stats.get("peak_bytes_in_use", 0) / 1e6


def run(B: int, accum: int, iters: int = 6, T: int = 1000,
        hidden=(512, 512)) -> dict:
    model = ProjectionHead(zdim=512, hidden=tuple(hidden), dtype=jnp.bfloat16)
    state = create_train_state(
        model,
        (jnp.zeros((2, T, C), jnp.bfloat16), jnp.ones((2, T), bool)),
        tx=make_optimizer(lr=1e-4, warmup_steps=10, max_steps=1000),
    )
    step = make_train_step(model, clews_loss, grad_accum=accum)
    rng = np.random.default_rng(0)
    # build the (B, T, C) batch on DEVICE from a small host slab (a host-f32
    # staging array would cost 4x the device bytes and OOMs the host first)
    slab = jnp.asarray(
        rng.normal(size=(min(B, 64), T, C)).astype(np.float32), jnp.bfloat16
    )
    emb = jnp.tile(slab, (B // slab.shape[0] + 1, 1, 1))[:B]
    emb = emb + (
        jnp.arange(B, dtype=jnp.bfloat16)[:, None, None] * 1e-3
    )  # de-duplicate rows so the loss geometry is non-degenerate
    batch = {
        "labels": jnp.asarray(
            np.repeat(np.arange(B // 2, dtype=np.int32), 2)
        ),
        "ids": jnp.asarray(np.arange(B, dtype=np.int32)),
        "emb": emb,
        "mask": jnp.ones((B, T), bool),
    }
    state, ld = step(state, batch)  # compile + warm
    float(ld["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, ld = step(state, batch)
    float(ld["loss"])  # sync
    dt = (time.perf_counter() - t0) / iters
    return {
        "B": B,
        "T": T,
        "hidden": list(hidden),
        "grad_accum": accum,
        "ms_per_step": round(dt * 1e3, 1),
        "songs_per_s": round(B / dt, 1),
        "peak_mb": round(peak_mb(), 0),
    }


def main(batches, accums, T=1000, hidden=(512, 512)):
    for B in batches:
        for accum in accums:
            if B % accum:
                continue
            try:
                print(json.dumps(run(B, accum, T=T, hidden=hidden)),
                      flush=True)
            except Exception as e:  # XlaRuntimeError: RESOURCE_EXHAUSTED
                msg = str(e).splitlines()[0][:140]
                print(json.dumps({
                    "B": B, "T": T, "hidden": list(hidden),
                    "grad_accum": accum, "oom_or_error": msg,
                }), flush=True)


if __name__ == "__main__":
    bs = (
        tuple(int(b) for b in sys.argv[1].split(","))
        if len(sys.argv) > 1 else (256, 1024)
    )
    acc = (
        tuple(int(a) for a in sys.argv[2].split(","))
        if len(sys.argv) > 2 else (1, 8)
    )
    T_ = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    hid = (
        tuple(int(h) for h in sys.argv[4].split(","))
        if len(sys.argv) > 4 else (512, 512)
    )
    main(bs, acc, T=T_, hidden=hid)
