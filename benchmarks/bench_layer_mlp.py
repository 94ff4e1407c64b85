"""Full-encoder-LAYER A/B with the round-2 natural-layout attention: MLP as
the XLA fc1+gelu+fc2 pair vs the fused Pallas MLP kernel. Round-1 measured
the fused kernel 21% faster standalone but e2e-neutral when wired — retest
now that the attention section is 36% faster (different overlap windows)."""
import json, time
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from wealy_tpu.ops.fused_mlp import fused_mlp, _reference_mlp
from wealy_tpu.ops.flash_attention import flash_mha

B, T, H, Dh = 64, 1500, 6, 64
D = H * Dh
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(jnp.bfloat16)
Wq = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.03)
Wk = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.03)
Wv = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.03)
Wo = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.03)
W1 = jnp.asarray(rng.normal(size=(D, 4 * D)).astype(np.float32) * 0.03)
b1 = jnp.asarray(rng.normal(size=(4 * D,)).astype(np.float32) * 0.03)
W2 = jnp.asarray(rng.normal(size=(4 * D, D)).astype(np.float32) * 0.03)
b2 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.03)
scale = Dh**-0.5


def ln(z):
    zf = z.astype(jnp.float32)
    mu = zf.mean(-1, keepdims=True)
    var = ((zf - mu) ** 2).mean(-1, keepdims=True)
    return ((zf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(jnp.bfloat16)


def attn_section(z):
    h = ln(z)
    q = jnp.einsum("btd,de->bte", h, Wq.astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    k = jnp.einsum("btd,de->bte", h, Wk.astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    v = jnp.einsum("btd,de->bte", h, Wv.astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    o = flash_mha(q.reshape(B, T, H, Dh), k.reshape(B, T, H, Dh), v.reshape(B, T, H, Dh), scale)
    o = jnp.einsum("btd,de->bte", o.reshape(B, T, D), Wo.astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return z + o


def layer(z, fused):
    z = attn_section(z)
    h = ln(z)
    if fused:
        m = fused_mlp(h, W1.astype(jnp.bfloat16), b1, W2.astype(jnp.bfloat16), b2)
    else:
        m = _reference_mlp(h, W1.astype(jnp.bfloat16), b1, W2.astype(jnp.bfloat16), b2)
    return z + m


ref = np.asarray(layer(x, False).astype(jnp.float32))
got = np.asarray(layer(x, True).astype(jnp.float32))
print(json.dumps({"fused_mlp_max_abs_diff": float(np.max(np.abs(got - ref)))}), flush=True)

attn_flops = 2 * B * H * T * T * Dh * 2 + 2 * B * T * D * D * 4
mlp_flops = 2 * 2 * B * T * D * 4 * D
flops = attn_flops + mlp_flops
for trial in range(2):
    for fused in (False, True):
        @jax.jit
        def chained(x, n_arr, fused=fused):
            def body(carry, _):
                o = layer(x + carry, fused)
                return o[0, 0, 0] * 0, o[0, 0, 0]
            _, outs = jax.lax.scan(body, jnp.bfloat16(0.0), n_arr)
            return outs
        n_arr = jnp.zeros((30,), jnp.float32)
        np.asarray(chained(x, n_arr))
        t0 = time.perf_counter(); np.asarray(chained(x, n_arr))
        dt = (time.perf_counter() - t0) / 30
        print(json.dumps({"trial": trial, "fused_mlp": fused, "layer_ms": round(dt * 1e3, 2), "tflops": round(flops / dt / 1e12, 1)}), flush=True)
