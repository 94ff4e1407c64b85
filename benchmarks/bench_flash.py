"""flash_mha micro-benchmark at the Whisper-tiny encoder shape, chained
timing; compares against the XLA einsum reference."""
import json, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from wealy_tpu.ops.flash_attention import flash_mha, _reference_mha

def run(fn, q, k, v, scale, iters=30):
    @jax.jit
    def chained(q, k, v, n_arr):
        def body(carry, _):
            o = fn(q + carry, k, v, scale)
            return o[0, 0, 0, 0] * 0, o[0, 0, 0, 0]
        _, outs = jax.lax.scan(body, jnp.bfloat16(0.0), n_arr)
        return outs
    n_arr = jnp.zeros((iters,), jnp.float32)
    np.asarray(chained(q, k, v, n_arr))
    t0 = time.perf_counter(); np.asarray(chained(q, k, v, n_arr))
    return (time.perf_counter() - t0) / iters

B, T, H, D = 64, 1500, 6, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
scale = D ** -0.5
flops = 2 * B * H * T * T * D * 2
dt_f = run(flash_mha, q, k, v, scale)
print(json.dumps({"kernel": "flash", "ms": round(dt_f*1e3, 2), "tflops": round(flops/dt_f/1e12, 1)}), flush=True)
if "--ref" in sys.argv:
    dt_r = run(_reference_mha, q, k, v, scale)
    print(json.dumps({"kernel": "xla", "ms": round(dt_r*1e3, 2), "tflops": round(flops/dt_r/1e12, 1)}), flush=True)
