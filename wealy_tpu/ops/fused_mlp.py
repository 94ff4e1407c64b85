"""Fused transformer-MLP kernel: x @ W1 -> gelu -> @ W2, VMEM-resident.

Why: XLA runs fc1 and fc2 as separate matmuls with the (B*T, 4D) gelu
intermediate materialized in HBM — for the Whisper encoder at B=64 that is
~294 MB written + read per layer. This kernel keeps both weight matrices
resident in VMEM (W1+W2 ≈ 2.4 MB for D=384) and the intermediate in a
(block_rows, 4D) scratch, so HBM traffic is just x in / out once.

Backward: recompute-based custom VJP (XLA reference), consistent with
ops.flash_attention / ops.layer_norm policy.

STATUS: WIRED since round 2 — ResidualAttentionBlock routes all bf16
seq>=256 MLPs through this kernel (+2% end-to-end with the round-2 natural
-layout attention; see the note in models/whisper/model.py). Gated on the
block's ``use_flash`` flag: like flash_mha, pallas_call has no GSPMD
partitioning rule, so TP meshes (Megatron-sharded mlp_fc1/mlp_fc2) rebuild
with use_flash=False and take the XLA einsum path instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ROW_BLOCK = 512


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7 — far below
    bf16 resolution). Mosaic has no erf/erfc lowering; exp it has."""
    sign = jnp.sign(x)
    x = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-x * x))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    # exact-gelu formula with the in-kernel erf approximation
    h = 0.5 * h * (1.0 + _erf_approx(h * (2.0**-0.5)))
    h = h.astype(x.dtype)
    o = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _reference_mlp(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    return (jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2).astype(x.dtype)


def _mlp_fwd_impl(x, w1, b1, w2, b2):
    shape = x.shape
    D = shape[-1]
    Dh = w1.shape[-1]
    xr = x.reshape(-1, D)
    N = xr.shape[0]
    rows = min(ROW_BLOCK, max(8, N))
    n_pad = -(-N // rows) * rows
    if n_pad != N:
        xr = jnp.pad(xr, ((0, n_pad - N), (0, 0)))
    out = pl.pallas_call(
        _mlp_kernel,
        grid=(n_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, D), lambda i: (i, 0)),
            pl.BlockSpec((D, Dh), lambda i: (0, 0)),
            pl.BlockSpec((1, Dh), lambda i: (0, 0)),
            pl.BlockSpec((Dh, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, D), x.dtype),
    )(xr, w1, b1.reshape(1, Dh), w2, b2.reshape(1, D))
    return out[:N].reshape(shape)


@jax.custom_vjp
def fused_mlp(x, w1, b1, w2, b2):
    """gelu MLP: (..., D) @ (D, Dh) -> gelu -> @ (Dh, D), biases included.

    Falls back to the XLA reference on non-TPU backends.
    """
    if jax.default_backend() != "tpu":
        return _reference_mlp(x, w1, b1, w2, b2)
    return _mlp_fwd_impl(x, w1, b1, w2, b2)


def _fwd(x, w1, b1, w2, b2):
    return fused_mlp(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _bwd(residuals, g):
    x, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(_reference_mlp, x, w1, b1, w2, b2)
    return vjp(g)


fused_mlp.defvjp(_fwd, _bwd)
