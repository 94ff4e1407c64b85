"""int8 W8A8 Whisper encoder for extraction serving (inference-only).

The extraction workload (SURVEY.md §3.5 — the implied offline job that
produced the reference's embedding trees, here the flagship on-chip path) is
forward-only, so it can trade a quantified sliver of precision for MXU rate:
TPU v5e multiplies int8 at 2x the bf16 peak, and the dense projections
(q/k/v/out + MLP) carry ~2/3 of encoder FLOPs at 30 s context. This module
quantizes exactly those matmuls:

- weights: per-(layer, output-channel) absmax int8, computed offline from
  the standard f32 param tree (``quantize_encoder_params`` — the tree
  itself is untouched; checkpoints stay format-stable);
- activations: dynamic per-token absmax int8, quantized on the fly in f32
  and consumed by an int8 x int8 -> int32 ``dot_general`` (one MXU pass),
  then rescaled by (token_scale x channel_scale);
- everything precision-critical stays exactly as in model.py: LayerNorms,
  softmax and attention logits in f32, attention einsums bf16 with f32
  accumulation, exact (non-tanh) gelu, conv stem + positions untouched.

The result is a standalone pure-jnp forward (no flax state) that consumes
the SAME parameter tree as WhisperEncoder (scan or unrolled layout), so any
loaded checkpoint can serve quantized with one call. Perturbation vs the
bf16 encoder and measured throughput live in BENCH_NOTES.md; the path is
opt-in (``extract --quant-int8``-style wiring) like the f8 KV modes.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from wealy_tpu.models.whisper.config import WhisperConfig


def _quant_kernel(w: np.ndarray):
    """(in, out) or (L, in, out) f32 kernel -> (int8 kernel, f32 per-output
    -channel scale)."""
    w = np.asarray(w, np.float32)
    s = np.maximum(np.abs(w).max(axis=-2), 1e-12) / 127.0  # (..., out)
    q = np.clip(np.round(w / s[..., None, :]), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def quantize_encoder_params(params, config: WhisperConfig) -> dict:
    """Standard WhisperEncoder param tree (scan "blocks" layout or unrolled
    "block_i"; the encoder subtree of a full Whisper tree also works) ->
    quantized tree for :func:`quant_encode_fn`. Weights only — activations
    quantize dynamically at run time."""
    p = params.get("encoder", params)
    if "blocks" not in p:
        from wealy_tpu.models.whisper.convert import stack_block_params

        p = stack_block_params(
            jax.tree_util.tree_map(np.asarray, dict(p)), config.n_audio_layer
        )
    blk = jax.tree_util.tree_map(np.asarray, p["blocks"]["block"])
    layers: dict = {
        "attn_ln": blk["attn_ln"],
        "mlp_ln": blk["mlp_ln"],
    }
    for name, src, has_bias in (
        ("q", blk["attn"]["q"], True),
        ("k", blk["attn"]["k"], False),
        ("v", blk["attn"]["v"], True),
        ("out", blk["attn"]["out"], True),
        ("fc1", blk["mlp_fc1"], True),
        ("fc2", blk["mlp_fc2"], True),
    ):
        w, s = _quant_kernel(src["kernel"])
        layers[name] = {"w": w, "s": s}
        if has_bias:
            layers[name]["b"] = np.asarray(src["bias"], np.float32)
    return {
        "stem": {
            "conv1": jax.tree_util.tree_map(np.asarray, p["conv1"]),
            "conv2": jax.tree_util.tree_map(np.asarray, p["conv2"]),
            "positions": np.asarray(p["positions"]),
        },
        "layers": layers,
        "ln_post": jax.tree_util.tree_map(np.asarray, p["ln_post"]),
    }


def _qdense(x, qp):
    """Per-token dynamic int8 activation quant -> int8 MXU matmul ->
    (token_scale x channel_scale) rescale. x: (..., in) any float dtype;
    returns f32."""
    x32 = x.astype(jnp.float32)
    sa = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-8)
    sa = sa / 127.0
    q = jnp.clip(jnp.round(x32 / sa), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q, qp["w"],
        (((q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (sa * qp["s"])
    if "b" in qp:
        out = out + qp["b"]
    return out


def _ln(x, p):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def quant_encode_fn(config: WhisperConfig, dtype: Any = jnp.bfloat16):
    """Build the jitted quantized forward: ``fn(qparams, mel) -> (B, T, D)``.

    qparams come from :func:`quantize_encoder_params` and enter as jit
    ARGUMENTS (closure constants blow up remote compile requests)."""
    from wealy_tpu.ops.flash_attention import flash_mha

    cfg = config
    H = cfg.n_audio_head
    Dh = cfg.n_audio_state // H

    def layer(x, lp):
        B, T, D = x.shape
        h = _ln(x, lp["attn_ln"]).astype(dtype)
        q = _qdense(h, lp["q"]).reshape(B, T, H, Dh).astype(dtype)
        k = _qdense(h, lp["k"]).reshape(B, T, H, Dh).astype(dtype)
        v = _qdense(h, lp["v"]).reshape(B, T, H, Dh).astype(dtype)
        # attention itself stays bf16 through the same fused Pallas kernel
        # as the bf16 encoder — at T=1500 a materialized (B, H, T, T) f32
        # logits tensor is HBM-bound and erases the int8 projection win
        # (measured: the einsum variant ran at 0.3-0.8x the bf16 encoder)
        att = flash_mha(q, k, v, Dh**-0.5).reshape(B, T, D)
        x = x + _qdense(att.astype(dtype), lp["out"]).astype(dtype)

        h = _ln(x, lp["mlp_ln"]).astype(dtype)
        h = _qdense(h, lp["fc1"])
        h = jax.nn.gelu(h.astype(dtype), approximate=False)
        h = _qdense(h, lp["fc2"])
        return (x + h.astype(dtype)), None

    @jax.jit
    def encode(qparams, mel):
        st = qparams["stem"]
        x = jnp.swapaxes(mel, 1, 2).astype(dtype)  # (B, T, n_mels)
        x = jax.lax.conv_general_dilated(
            x, st["conv1"]["kernel"].astype(dtype), (1,), ((1, 1),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + st["conv1"]["bias"].astype(dtype)
        x = jax.nn.gelu(x, approximate=False)
        x = jax.lax.conv_general_dilated(
            x, st["conv2"]["kernel"].astype(dtype), (2,), ((1, 1),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + st["conv2"]["bias"].astype(dtype)
        x = jax.nn.gelu(x, approximate=False)
        x = x + st["positions"][None, : x.shape[1]].astype(dtype)
        x, _ = jax.lax.scan(layer, x, qparams["layers"])
        return _ln(x, qparams["ln_post"]).astype(dtype)

    return encode
