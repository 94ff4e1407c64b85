"""Diagnostic probes on the flash kernel: where does the time go?
- matmul_only: both MXU matmuls, softmax replaced by a cast (WRONG numerics,
  timing floor only)
- maskrow: the shipped candidate (min+add+exp+sum+div)
- expbf16: exp computed on a bf16 tile (numerics probe + timing)
- block_q sweep on maskrow
"""
import functools, json, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from wealy_tpu.ops.flash_attention import _NEG_INF, _SHIFT, _SCORE_CLAMP, _round_up


def make_kernel(mode):
    def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
        q = q_ref[0]; k = k_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if mode == "matmul_only":
            p = s.astype(v_ref.dtype)
            o = jax.lax.dot(p, v_ref[0], preferred_element_type=jnp.float32)
            o_ref[0] = o.astype(o_ref.dtype)
            return
        if mode == "expbf16":
            s16 = (jnp.minimum(s, _SCORE_CLAMP) + m_ref[...]).astype(jnp.bfloat16)
            p = jnp.exp(s16)
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            o = jax.lax.dot(p, v_ref[0], preferred_element_type=jnp.float32)
            o_ref[0] = (o / l).astype(o_ref.dtype)
            return
        p = jnp.exp(jnp.minimum(s, _SCORE_CLAMP) + m_ref[...])
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
        o_ref[0] = (o / l).astype(o_ref.dtype)
    return _kernel


def flash(q, k, v, scale, mode, block_q=512):
    B, T, H, D = q.shape
    Tk = k.shape[1]
    bq = min(block_q, _round_up(T, 128)); Tq_pad = _round_up(T, bq); Tk_pad = _round_up(Tk, 128)
    def to_bh(x, t_pad):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        if x.shape[1] != t_pad:
            x = jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))
        return x
    mask_row = jnp.where(jnp.arange(Tk_pad)[None, :] < Tk, -_SHIFT, _NEG_INF).astype(jnp.float32)
    out = pl.pallas_call(
        make_kernel(mode),
        grid=(B * H, Tq_pad // bq),
        in_specs=[pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
                  pl.BlockSpec((1, Tk_pad, D), lambda i, j: (i, 0, 0)),
                  pl.BlockSpec((1, Tk_pad, D), lambda i, j: (i, 0, 0)),
                  pl.BlockSpec((1, Tk_pad), lambda i, j: (0, 0))],
        out_specs=pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tq_pad, D), q.dtype),
    )(to_bh(q * scale, Tq_pad), to_bh(k, Tk_pad), to_bh(v, Tk_pad), mask_row)
    return jnp.swapaxes(out[:, :T].reshape(B, H, T, D), 1, 2)


B, T, H, D = 64, 1500, 6, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
scale = D ** -0.5

ref = np.asarray(flash(q, k, v, scale, "maskrow").astype(jnp.float32))
e16 = np.asarray(flash(q, k, v, scale, "expbf16").astype(jnp.float32))
rel = float(np.max(np.abs(e16 - ref)) / np.max(np.abs(ref)))
print(json.dumps({"expbf16_max_rel_vs_f32": rel}), flush=True)

flops = 2 * B * H * T * T * D * 2
runs = [("matmul_only", 512), ("maskrow", 256), ("maskrow", 512), ("maskrow", 1024), ("expbf16", 512)]
for trial in range(2):
    for mode, bq in runs:
        @jax.jit
        def chained(q, k, v, n_arr, mode=mode, bq=bq):
            def body(carry, _):
                o = flash(q + carry, k, v, scale, mode, bq)
                return o[0, 0, 0, 0] * 0, o[0, 0, 0, 0]
            _, outs = jax.lax.scan(body, jnp.bfloat16(0.0), n_arr)
            return outs
        n_arr = jnp.zeros((30,), jnp.float32)
        np.asarray(chained(q, k, v, n_arr))
        t0 = time.perf_counter(); np.asarray(chained(q, k, v, n_arr))
        dt = (time.perf_counter() - t0) / 30
        print(json.dumps({"trial": trial, "mode": mode, "block_q": bq, "ms": round(dt*1e3, 2), "tflops": round(flops/dt/1e12, 1)}), flush=True)
