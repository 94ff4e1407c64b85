"""Probe: K-chunked accumulation inside the natural-layout kernel.

The constant-shift softmax needs no online max-rescaling, so splitting the
K/V axis into chunks only adds o/l accumulators. Hypothesis: smaller score
tiles (block_q, Tk/c) reduce MXU stall on the f32 accumulate and pipeline
the two matmul phases better.
"""
import sys; sys.path.insert(0, ".")
import functools, json, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from wealy_tpu.ops.flash_attention import (
    _NEG_INF, _SHIFT, _SCORE_CLAMP, _round_up, _head_group, flash_mha,
)


def make_kernel(n_heads, head_dim, n_chunks):
    def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
        m = m_ref[...]  # (n_chunks, C)
        Tk = k_ref.shape[1]
        C = Tk // n_chunks
        for h in range(n_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = q_ref[0, :, sl]
            o_acc = None
            l_acc = None
            for c in range(n_chunks):
                ks = k_ref[0, c * C:(c + 1) * C, sl]
                s = jax.lax.dot_general(
                    q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                p = jnp.exp(jnp.minimum(s, _SCORE_CLAMP) + m[c, :][None, :])
                l = jnp.sum(p, axis=1, keepdims=True)
                o = jax.lax.dot(
                    p.astype(v_ref.dtype), v_ref[0, c * C:(c + 1) * C, sl],
                    preferred_element_type=jnp.float32,
                )
                o_acc = o if o_acc is None else o_acc + o
                l_acc = l if l_acc is None else l_acc + l
            o_ref[0, :, sl] = (o_acc / l_acc).astype(o_ref.dtype)
    return _kernel


def flash_chunked(q, k, v, scale, n_chunks, block_q=512):
    B, T, H, D = q.shape
    Tk = k.shape[1]
    bq = min(block_q, _round_up(T, 128))
    Tq_pad = _round_up(T, bq)
    Tk_pad = _round_up(Tk, 128 * n_chunks)
    g = _head_group(H, D)
    G = H // g
    gD = g * D

    def to_btd(x, t_pad):
        x = x.reshape(B, x.shape[1], H * D)
        if x.shape[1] != t_pad:
            x = jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))
        return x

    mask_row = jnp.where(jnp.arange(Tk_pad) < Tk, -_SHIFT, _NEG_INF).astype(
        jnp.float32
    ).reshape(n_chunks, Tk_pad // n_chunks)
    out = pl.pallas_call(
        make_kernel(g, D, n_chunks),
        grid=(B, G, Tq_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, gD), lambda b, hg, j: (b, j, hg)),
            pl.BlockSpec((1, Tk_pad, gD), lambda b, hg, j: (b, 0, hg)),
            pl.BlockSpec((1, Tk_pad, gD), lambda b, hg, j: (b, 0, hg)),
            pl.BlockSpec((n_chunks, Tk_pad // n_chunks), lambda b, hg, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, gD), lambda b, hg, j: (b, j, hg)),
        out_shape=jax.ShapeDtypeStruct((B, Tq_pad, H * D), q.dtype),
    )(to_btd(q * scale, Tq_pad), to_btd(k, Tk_pad), to_btd(v, Tk_pad), mask_row)
    return out[:, :T].reshape(B, T, H, D)


B, T, H, D = 64, 1500, 6, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
scale = D ** -0.5

ref = np.asarray(flash_mha(q, k, v, scale).astype(jnp.float32))
for c in (2, 3):
    got = np.asarray(flash_chunked(q, k, v, scale, c).astype(jnp.float32))
    rel = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
    print(json.dumps({"n_chunks": c, "max_rel_vs_shipped": rel}), flush=True)

flops = 2 * B * H * T * T * D * 2
runs = [("shipped", None, 512), ("chunk", 3, 512), ("chunk", 4, 512), ("chunk", 6, 512), ("chunk", 3, 256)]
for trial in range(2):
    for mode, c, bq in runs:
        @jax.jit
        def chained(q, k, v, n_arr, mode=mode, c=c, bq=bq):
            def body(carry, _):
                if mode == "shipped":
                    o = flash_mha(q + carry, k, v, scale, bq)
                else:
                    o = flash_chunked(q + carry, k, v, scale, c, bq)
                return o[0, 0, 0, 0] * 0, o[0, 0, 0, 0]
            _, outs = jax.lax.scan(body, jnp.bfloat16(0.0), n_arr)
            return outs
        n_arr = jnp.zeros((30,), jnp.float32)
        np.asarray(chained(q, k, v, n_arr))
        t0 = time.perf_counter(); np.asarray(chained(q, k, v, n_arr))
        dt = (time.perf_counter() - t0) / 30
        print(json.dumps({"trial": trial, "mode": mode, "chunks": c, "block_q": bq,
                          "ms": round(dt * 1e3, 2), "tflops": round(flops / dt / 1e12, 1)}), flush=True)
