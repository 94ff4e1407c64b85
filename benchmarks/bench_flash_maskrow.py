"""In-process A/B: current flash kernel (in-kernel scale + iota mask + shift)
vs a mask-row variant: q pre-scaled outside, and ONE additive (1, Tk_pad) row
carrying both the constant softmax shift (-24 on valid columns) and the pad
mask (-1e9 on pad columns). Per score element: min + add + exp, vs
mul + cmp + where/min + sub + exp today."""
import functools, json, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from wealy_tpu.ops.flash_attention import _NEG_INF, _SHIFT, _SCORE_CLAMP, _round_up


def _kernel_current(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len):
    q = q_ref[0]; k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_len, jnp.minimum(s, _SCORE_CLAMP), _NEG_INF)
    p = jnp.exp(s - _SHIFT)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _kernel_maskrow(q_ref, k_ref, v_ref, m_ref, o_ref):
    q = q_ref[0]; k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    p = jnp.exp(jnp.minimum(s, _SCORE_CLAMP) + m_ref[...])
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def flash(q, k, v, scale, variant, block_q=512):
    B, T, H, D = q.shape
    Tk = k.shape[1]
    bq = min(block_q, _round_up(T, 128)); Tq_pad = _round_up(T, bq); Tk_pad = _round_up(Tk, 128)
    def to_bh(x, t_pad):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, x.shape[1], D)
        if x.shape[1] != t_pad:
            x = jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))
        return x
    if variant == "current":
        out = pl.pallas_call(
            functools.partial(_kernel_current, scale=scale, seq_len=Tk),
            grid=(B * H, Tq_pad // bq),
            in_specs=[pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
                      pl.BlockSpec((1, Tk_pad, D), lambda i, j: (i, 0, 0)),
                      pl.BlockSpec((1, Tk_pad, D), lambda i, j: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((B * H, Tq_pad, D), q.dtype),
        )(to_bh(q, Tq_pad), to_bh(k, Tk_pad), to_bh(v, Tk_pad))
    else:
        mask_row = jnp.where(
            jnp.arange(Tk_pad)[None, :] < Tk, -_SHIFT, _NEG_INF
        ).astype(jnp.float32)
        out = pl.pallas_call(
            _kernel_maskrow,
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

# numerics check
a = np.asarray(flash(q, k, v, scale, "current").astype(jnp.float32))
b = np.asarray(flash(q, k, v, scale, "maskrow").astype(jnp.float32))
print(json.dumps({"max_abs_diff": float(np.max(np.abs(a - b)))}), flush=True)

flops = 2 * B * H * T * T * D * 2
for trial in range(2):
    for variant in ("current", "maskrow"):
        @jax.jit
        def chained(q, k, v, n_arr, variant=variant):
            def body(carry, _):
                o = flash(q + carry, k, v, scale, variant)
                return o[0, 0, 0, 0] * 0, o[0, 0, 0, 0]
            _, outs = jax.lax.scan(body, jnp.bfloat16(0.0), n_arr)
            return outs
        n_arr = jnp.zeros((30,), jnp.float32)
        np.asarray(chained(q, k, v, n_arr))
        t0 = time.perf_counter(); np.asarray(chained(q, k, v, n_arr))
        dt = (time.perf_counter() - t0) / 30
        print(json.dumps({"trial": trial, "variant": variant, "ms": round(dt*1e3, 2), "tflops": round(flops/dt/1e12, 1)}), flush=True)
