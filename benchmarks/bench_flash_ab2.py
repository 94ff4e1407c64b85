"""A/B: store softmax numerator in bf16 straight out of exp (sum in f32
accum), vs current f32-p + cast-before-matmul."""
import functools, json, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from wealy_tpu.ops.flash_attention import _NEG_INF, _SHIFT, _SCORE_CLAMP, _round_up

def make_kernel(variant):
    def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len):
        q = q_ref[0]; k = k_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < seq_len, jnp.minimum(s, _SCORE_CLAMP), _NEG_INF)
        if variant == "current":
            p = jnp.exp(s - _SHIFT)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
        else:  # p_bf16: exp -> bf16 store; sum the SAME rounded values (f32 accum)
            p = jnp.exp(s - _SHIFT).astype(v_ref.dtype)
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            o = jax.lax.dot(p, v_ref[0], preferred_element_type=jnp.float32)
        o_ref[0] = (o / l).astype(o_ref.dtype)
    return _mha_kernel

def flash(q, k, v, scale, variant, block_q=512):
    B, T, H, D = q.shape
    Tk = k.shape[1]
    bq = min(block_q, _round_up(T, 128)); Tq_pad = _round_up(T, bq); Tk_pad = _round_up(Tk, 128)
    def to_bh(x, t_pad):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        if x.shape[1] != t_pad:
            x = jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))
        return x
    out = pl.pallas_call(
        functools.partial(make_kernel(variant), scale=scale, seq_len=Tk),
        grid=(B * H, Tq_pad // bq),
        in_specs=[pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
                  pl.BlockSpec((1, Tk_pad, D), lambda i, j: (i, 0, 0)),
                  pl.BlockSpec((1, Tk_pad, D), lambda i, j: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tq_pad, D), q.dtype),
    )(to_bh(q, Tq_pad), to_bh(k, Tk_pad), to_bh(v, Tk_pad))
    return jnp.swapaxes(out[:, :T].reshape(B, H, T, D), 1, 2)

B, T, H, D = 64, 1500, 6, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
scale = D ** -0.5
flops = 2 * B * H * T * T * D * 2
# numerics first
a = np.asarray(flash(q, k, v, scale, "current")).astype(np.float32)
b = np.asarray(flash(q, k, v, scale, "p_bf16")).astype(np.float32)
print(json.dumps({"max_abs_diff": float(np.abs(a - b).max()), "out_mag": float(np.abs(a).max())}), flush=True)
for trial in range(2):
    for variant in ("current", "p_bf16"):
        @jax.jit
        def chained(q, k, v, n_arr, vr=variant):
            def body(carry, _):
                o = flash(q + carry, k, v, scale, vr)
                return o[0, 0, 0, 0] * 0, o[0, 0, 0, 0]
            _, outs = jax.lax.scan(body, jnp.bfloat16(0.0), n_arr)
            return outs
        n_arr = jnp.zeros((30,), jnp.float32)
        np.asarray(chained(q, k, v, n_arr))
        t0 = time.perf_counter(); np.asarray(chained(q, k, v, n_arr))
        dt = (time.perf_counter() - t0) / 30
        print(json.dumps({"trial": trial, "variant": variant, "ms": round(dt*1e3, 2), "tflops": round(flops/dt/1e12, 1)}), flush=True)
