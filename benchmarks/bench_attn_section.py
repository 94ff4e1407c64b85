"""A/B the FULL encoder attention section (LN + QKV + attention + out proj +
residual) at tiny shapes. The pallas_call boundary forces XLA to materialize
its operands, so the (B,T,H,D)->(B*H,T,D) transposes are real HBM traffic.

Variants:
  current  — Dense q/k/v, swapaxes to (B*H,T,Dh) outside the kernel (shipped)
  fusedqkv — ONE (D, 3D) matmul then split + swapaxes
  flash4d  — kernel reads q/k/v straight from (B, T, H, Dh) via 4-D BlockSpecs
             (index map (b,h,j) -> (b, j, h, 0)); no transposes anywhere
"""
import functools, json, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from wealy_tpu.ops.flash_attention import _NEG_INF, _SHIFT, _SCORE_CLAMP, _round_up

B, T, H, Dh = 64, 1500, 6, 64
D = H * Dh
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(jnp.bfloat16)
Wq = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.03)
Wk = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.03)
Wv = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.03)
Wo = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.03)
bq_ = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.03)
bv_ = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.03)
bo_ = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.03)
scale = Dh**-0.5

bqz = 512
Tk_pad = _round_up(T, 128)
Tq_pad = _round_up(T, bqz)


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    p = jnp.exp(jnp.minimum(s, _SCORE_CLAMP) + m_ref[...])
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _kernel_fulld(q_ref, k_ref, v_ref, m_ref, o_ref):
    # q (1, bq, D), k/v (1, Tk_pad, D) with D = H*Dh; per-head static lane
    # slices, scores computed head-by-head (score tile reused)
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        p = jnp.exp(jnp.minimum(s, _SCORE_CLAMP) + m_ref[...])
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0, :, sl], preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


MASK_ROW = jnp.where(jnp.arange(Tk_pad)[None, :] < T, -_SHIFT, _NEG_INF).astype(jnp.float32)


def flash_bh(qb, kb, vb):
    return pl.pallas_call(
        _kernel,
        grid=(B * H, Tq_pad // bqz),
        in_specs=[pl.BlockSpec((1, bqz, Dh), lambda i, j: (i, j, 0)),
                  pl.BlockSpec((1, Tk_pad, Dh), lambda i, j: (i, 0, 0)),
                  pl.BlockSpec((1, Tk_pad, Dh), lambda i, j: (i, 0, 0)),
                  pl.BlockSpec((1, Tk_pad), lambda i, j: (0, 0))],
        out_specs=pl.BlockSpec((1, bqz, Dh), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tq_pad, Dh), qb.dtype),
    )(qb, kb, vb, MASK_ROW)


def to_bh(z, t_pad):
    z = jnp.swapaxes(z.reshape(B, -1, H, Dh), 1, 2).reshape(B * H, -1, Dh)
    if z.shape[1] != t_pad:
        z = jnp.pad(z, ((0, 0), (0, t_pad - z.shape[1]), (0, 0)))
    return z


def ln(x):
    h = nn_ln(x)
    return h


def nn_ln(x):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(jnp.bfloat16)


def section_current(x):
    h = ln(x)
    q = (jnp.einsum("btd,de->bte", h, Wq.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + bq_).astype(jnp.bfloat16) * scale
    k = jnp.einsum("btd,de->bte", h, Wk.astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    v = (jnp.einsum("btd,de->bte", h, Wv.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + bv_).astype(jnp.bfloat16)
    o = flash_bh(to_bh(q, Tq_pad), to_bh(k, Tk_pad), to_bh(v, Tk_pad))
    o = jnp.swapaxes(o[:, :T].reshape(B, H, T, Dh), 1, 2).reshape(B, T, D)
    o = (jnp.einsum("btd,de->bte", o, Wo.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + bo_).astype(jnp.bfloat16)
    return x + o


def section_fusedqkv(x):
    h = ln(x)
    Wqkv = jnp.concatenate([Wq, Wk, Wv], axis=1).astype(jnp.bfloat16)
    bqkv = jnp.concatenate([bq_, jnp.zeros((D,), jnp.float32), bv_])
    qkv = (jnp.einsum("btd,de->bte", h, Wqkv, preferred_element_type=jnp.float32) + bqkv).astype(jnp.bfloat16)
    q = qkv[..., :D] * scale
    k = qkv[..., D : 2 * D]
    v = qkv[..., 2 * D :]
    o = flash_bh(to_bh(q, Tq_pad), to_bh(k, Tk_pad), to_bh(v, Tk_pad))
    o = jnp.swapaxes(o[:, :T].reshape(B, H, T, Dh), 1, 2).reshape(B, T, D)
    o = (jnp.einsum("btd,de->bte", o, Wo.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + bo_).astype(jnp.bfloat16)
    return x + o


def flash_fulld(q, k, v):
    # q/k/v: (B, Tpad, D) in the NATURAL layout — no transposes
    return pl.pallas_call(
        _kernel_fulld,
        grid=(B, Tq_pad // bqz),
        in_specs=[pl.BlockSpec((1, bqz, D), lambda b, j: (b, j, 0)),
                  pl.BlockSpec((1, Tk_pad, D), lambda b, j: (b, 0, 0)),
                  pl.BlockSpec((1, Tk_pad, D), lambda b, j: (b, 0, 0)),
                  pl.BlockSpec((1, Tk_pad), lambda b, j: (0, 0))],
        out_specs=pl.BlockSpec((1, bqz, D), lambda b, j: (b, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tq_pad, D), q.dtype),
    )(q, k, v, MASK_ROW)


def section_fulld(x):
    h = ln(x)
    q = (jnp.einsum("btd,de->bte", h, Wq.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + bq_).astype(jnp.bfloat16) * scale
    k = jnp.einsum("btd,de->bte", h, Wk.astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    v = (jnp.einsum("btd,de->bte", h, Wv.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + bv_).astype(jnp.bfloat16)
    q = jnp.pad(q, ((0, 0), (0, Tq_pad - T), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, Tk_pad - T), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, Tk_pad - T), (0, 0)))
    o = flash_fulld(q, k, v)[:, :T]
    o = (jnp.einsum("btd,de->bte", o, Wo.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + bo_).astype(jnp.bfloat16)
    return x + o


def _kernel_fulld_oproj(x_ref, q_ref, k_ref, v_ref, m_ref, wo_ref, bo_ref, o_ref, acc_ref):
    # like _kernel_fulld, but the out projection + bias + residual happen
    # in-kernel: o_ref = x + attn @ Wo + bo
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        p = jnp.exp(jnp.minimum(s, _SCORE_CLAMP) + m_ref[...])
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0, :, sl], preferred_element_type=jnp.float32)
        acc_ref[:, sl] = (o / l).astype(acc_ref.dtype)
    proj = jax.lax.dot(acc_ref[...], wo_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = (x_ref[0].astype(jnp.float32) + proj + bo_ref[...]).astype(o_ref.dtype)


def flash_fulld_oproj(x, q, k, v, wo, bo):
    from jax.experimental.pallas import tpu as pltpu
    return pl.pallas_call(
        _kernel_fulld_oproj,
        grid=(B, Tq_pad // bqz),
        in_specs=[pl.BlockSpec((1, bqz, D), lambda b, j: (b, j, 0)),
                  pl.BlockSpec((1, bqz, D), lambda b, j: (b, j, 0)),
                  pl.BlockSpec((1, Tk_pad, D), lambda b, j: (b, 0, 0)),
                  pl.BlockSpec((1, Tk_pad, D), lambda b, j: (b, 0, 0)),
                  pl.BlockSpec((1, Tk_pad), lambda b, j: (0, 0)),
                  pl.BlockSpec((D, D), lambda b, j: (0, 0)),
                  pl.BlockSpec((1, D), lambda b, j: (0, 0))],
        out_specs=pl.BlockSpec((1, bqz, D), lambda b, j: (b, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tq_pad, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bqz, D), q.dtype)],
    )(x, q, k, v, MASK_ROW, wo, bo)


def section_fulld_oproj(x):
    h = ln(x)
    q = (jnp.einsum("btd,de->bte", h, Wq.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + bq_).astype(jnp.bfloat16) * scale
    k = jnp.einsum("btd,de->bte", h, Wk.astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    v = (jnp.einsum("btd,de->bte", h, Wv.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + bv_).astype(jnp.bfloat16)
    qp = jnp.pad(q, ((0, 0), (0, Tq_pad - T), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Tk_pad - T), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Tk_pad - T), (0, 0)))
    xp = jnp.pad(x, ((0, 0), (0, Tq_pad - T), (0, 0)))
    o = flash_fulld_oproj(
        xp, qp, kp, vp, Wo.astype(jnp.bfloat16), bo_.reshape(1, D).astype(jnp.float32)
    )
    return o[:, :T]


variants = {
    "current": section_current,
    "fusedqkv": section_fusedqkv,
    "fulld": section_fulld,
    "fulld_oproj": section_fulld_oproj,
}
ref = np.asarray(section_current(x).astype(jnp.float32))
for name, fn in variants.items():
    got = np.asarray(fn(x).astype(jnp.float32))
    print(json.dumps({"variant": name, "max_abs_diff": float(np.max(np.abs(got - ref)))}), flush=True)

attn_flops = 2 * B * H * T * T * Dh * 2
proj_flops = 2 * B * T * D * D * 4
flops = attn_flops + proj_flops
for trial in range(2):
    for name, fn in variants.items():
        @jax.jit
        def chained(x, n_arr, fn=fn):
            def body(carry, _):
                o = fn(x + carry)
                return o[0, 0, 0] * 0, o[0, 0, 0]
            _, outs = jax.lax.scan(body, jnp.bfloat16(0.0), n_arr)
            return outs
        n_arr = jnp.zeros((30,), jnp.float32)
        np.asarray(chained(x, n_arr))
        t0 = time.perf_counter(); np.asarray(chained(x, n_arr))
        dt = (time.perf_counter() - t0) / 30
        print(json.dumps({"trial": trial, "variant": name, "ms": round(dt * 1e3, 2), "tflops": round(flops / dt / 1e12, 1)}), flush=True)
