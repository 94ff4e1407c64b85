"""Tiny-encoder roofline decomposition (round-3 VERDICT item 4).

Question: is whisper-tiny's ~29% encoder MFU an inter-op overhead problem (a
whole-block megakernel would help) or the sum-of-parts shape ceiling of its
own matmuls (it would not)?

Method: time each compute unit of one encoder block IN ISOLATION on the real
chip (chained on-device per BENCH_NOTES methodology — scan with a carried
perturbation, params as jit args, one readback), derive each unit's achieved
TFLOP/s at tiny shapes, compose the full encoder analytically from unit
times x counts, and compare against the measured end-to-end encoder time.

  predicted ~= measured  -> the encoder already runs at the speed of its
                            parts; a megakernel must beat XLA's individual
                            matmuls at these shapes to win anything.
  predicted << measured  -> inter-op overhead exists; fusion has headroom.

Usage: python benchmarks/bench_tiny_roofline.py [B] [iters]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

PEAK_TFLOPS = 197.0  # v5e bf16


def _chain_time(fn, args, iters):
    """Chained on-device timing: fn(*args, carry)->scalar-ish; returns s/iter."""

    @jax.jit
    def chained(args, n_arr):
        def body(carry, _):
            out = fn(*args, carry)
            return out, out

        _, outs = jax.lax.scan(body, jnp.bfloat16(0.0), n_arr)
        return outs

    n_arr = jnp.zeros((iters,), jnp.float32)
    np.asarray(chained(args, n_arr))  # compile
    t0 = time.perf_counter()
    sink = np.asarray(chained(args, n_arr))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(sink).all()
    return dt


def main(B=128, iters=16):
    D, T, H, Dh, FF, L = 384, 1500, 6, 64, 1536, 4
    rng = np.random.default_rng(0)
    bt = B * T

    x = jnp.asarray(rng.normal(size=(bt, D)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.05, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(D, FF)).astype(np.float32) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(FF, D)).astype(np.float32) * 0.05, jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32), jnp.bfloat16)

    units = {}

    # 1. dense projection (q/k/v/out shapes): (B*T, D) @ (D, D)
    t = _chain_time(lambda x, w, c: ((x + c) @ w)[0, 0], (x, w), iters)
    units["proj_384x384"] = {
        "s": t, "flops": 2 * bt * D * D, "count_per_layer": 4,
    }

    # 2. MLP pair with gelu between (what fused_mlp replaces)
    def mlp(x, w1, w2, c):
        h = (x + c) @ w1
        h = jax.nn.gelu(h, approximate=False)
        return (h @ w2)[0, 0]

    t = _chain_time(mlp, (x, w1, w2), iters)
    units["mlp_384_1536"] = {
        "s": t, "flops": 2 * bt * D * FF * 2, "count_per_layer": 1,
    }

    # 3. the flash attention unit itself (scores + softmax + AV)
    from wealy_tpu.ops.flash_attention import flash_mha

    def attn(q, c):
        return flash_mha(q + c, q, q, Dh**-0.5)[0, 0, 0, 0].astype(jnp.bfloat16)

    t = _chain_time(attn, (q,), iters)
    units["flash_attention"] = {
        "s": t, "flops": 2 * 2 * B * H * T * T * Dh, "count_per_layer": 1,
    }

    # 4. LayerNorm in f32 (bandwidth unit, 2 per layer + ln_post)
    def ln(x, c):
        xf = (x + c).astype(jnp.float32)
        m = xf.mean(-1, keepdims=True)
        v = ((xf - m) ** 2).mean(-1, keepdims=True)
        return ((xf - m) * jax.lax.rsqrt(v + 1e-5)).astype(jnp.bfloat16)

    t = _chain_time(lambda x, c: ln(x, c)[0, 0], (x,), iters)
    units["layernorm_f32"] = {
        "s": t, "flops": 0, "count_per_layer": 2,
        "gbps": 2 * bt * D * 2 / t / 1e9,  # bf16 in + out
    }

    # 5. conv stem (2 convs, once per clip): measured as one unit
    mel = jnp.asarray(rng.normal(size=(B, 3000, 80)).astype(np.float32), jnp.bfloat16)
    import flax.linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, m):
            h = nn.Conv(D, (3,), padding=1, dtype=jnp.bfloat16)(m)
            h = nn.gelu(h, approximate=False)
            h = nn.Conv(D, (3,), strides=(2,), padding=1, dtype=jnp.bfloat16)(h)
            return nn.gelu(h, approximate=False)

    stem = Stem()
    sp = stem.init(jax.random.PRNGKey(0), mel)["params"]
    t = _chain_time(
        lambda p, m, c: stem.apply({"params": p}, m + c)[0, 0, 0], (sp, mel), iters
    )
    units["conv_stem"] = {
        "s": t,
        "flops": 2 * B * (3000 * 3 * 80 * D + 1500 * 3 * D * D),
        "count_per_layer": 0,
    }

    report = {}
    per_layer_s = 0.0
    per_layer_flops = 0
    for name, u in units.items():
        tf = u["flops"] / u["s"] / 1e12 if u["flops"] else None
        report[name] = {
            "ms": round(u["s"] * 1e3, 3),
            "tflops": round(tf, 1) if tf else None,
            "mfu_pct": round(100 * tf / PEAK_TFLOPS, 1) if tf else None,
        }
        if "gbps" in u:
            report[name]["gbps"] = round(u["gbps"], 0)
        per_layer_s += u["s"] * u["count_per_layer"]
        per_layer_flops += u["flops"] * u["count_per_layer"]

    total_s = per_layer_s * L + units["conv_stem"]["s"] + units["layernorm_f32"]["s"]
    total_flops = per_layer_flops * L + units["conv_stem"]["flops"]
    ceiling_mfu = 100 * total_flops / total_s / 1e12 / PEAK_TFLOPS

    # measured end-to-end encoder (same harness as bench.py, encoder only)
    from wealy_tpu.models.whisper import Whisper, WHISPER_CONFIGS

    cfg = WHISPER_CONFIGS["tiny"]
    model = Whisper(cfg, dtype=jnp.bfloat16)
    mel0 = jnp.asarray(rng.normal(size=(B, cfg.n_mels, 3000)).astype(np.float32))
    params = model.init(
        jax.random.PRNGKey(0), mel0[:1], jnp.zeros((1, 4), jnp.int32)
    )["params"]

    def enc(p, m, c):
        return model.apply({"params": p}, m + c, method=Whisper.encode)[0, 0, 0]

    t_enc = _chain_time(enc, (params, mel0.astype(jnp.bfloat16)), iters)
    measured_mfu = 100 * total_flops / t_enc / 1e12 / PEAK_TFLOPS

    print(json.dumps({
        "B": B,
        "units": report,
        "sum_of_parts_ms": round(total_s * 1e3, 2),
        "sum_of_parts_mfu_pct": round(ceiling_mfu, 1),
        "measured_encoder_ms": round(t_enc * 1e3, 2),
        "measured_mfu_pct": round(measured_mfu, 1),
        "interop_overhead_pct": round(100 * (t_enc - total_s) / t_enc, 1),
    }, indent=1), flush=True)


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    main(B=B, iters=iters)
