"""Convert Hugging Face WhisperModel weights to wealy_tpu param pytrees.

Works on a plain ``state_dict()``-style mapping of numpy/torch tensors, so
checkpoints can come from ``transformers`` (locally cached) or from any dump
of the published weights. No network access is required or attempted.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from wealy_tpu.models.whisper.config import WhisperConfig
from wealy_tpu.models.whisper.model import sinusoids


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _dense(sd, prefix, bias=True):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _attn(sd, prefix):
    return {
        "q": _dense(sd, f"{prefix}.q_proj"),
        "k": _dense(sd, f"{prefix}.k_proj", bias=False),
        "v": _dense(sd, f"{prefix}.v_proj"),
        "out": _dense(sd, f"{prefix}.out_proj"),
    }


def _enc_block(sd, prefix):
    return {
        "attn_ln": _ln(sd, f"{prefix}.self_attn_layer_norm"),
        "attn": _attn(sd, f"{prefix}.self_attn"),
        "mlp_ln": _ln(sd, f"{prefix}.final_layer_norm"),
        "mlp_fc1": _dense(sd, f"{prefix}.fc1"),
        "mlp_fc2": _dense(sd, f"{prefix}.fc2"),
    }


def _dec_block(sd, prefix):
    out = _enc_block(sd, prefix)
    out["cross_attn_ln"] = _ln(sd, f"{prefix}.encoder_attn_layer_norm")
    out["cross_attn"] = _attn(sd, f"{prefix}.encoder_attn")
    return out


def stack_block_params(section: dict, n_layers: int) -> dict:
    """Convert per-layer ``block_i`` params to the nn.scan layout:
    {"blocks": {"block": <stacked leaves with leading layer axis>}}. Other
    entries (convs, ln_post, embeddings) pass through unchanged."""
    import jax

    layers = [section[f"block_{i}"] for i in range(n_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *layers)
    out = {k: v for k, v in section.items() if not k.startswith("block_")}
    out["blocks"] = {"block": stacked}
    return out


def params_from_openai_state_dict(
    state_dict: Mapping[str, object],
    config: WhisperConfig,
    scan_layers: bool = False,
) -> dict:
    """Build the param tree from an OpenAI-format Whisper checkpoint
    (``whisper`` pip package naming: encoder.blocks.N.attn.query / key /
    value / out, attn_ln, mlp.0/mlp.2, mlp_ln; decoder.blocks.N with
    cross_attn*; token_embedding / positional_embedding;
    encoder.ln_post / decoder.ln).

    Accepts the raw checkpoint dict (with ``model_state_dict``) or the state
    dict itself.
    """
    sd = state_dict.get("model_state_dict", state_dict)

    def attn(prefix):
        return {
            "q": _dense(sd, f"{prefix}.query"),
            "k": _dense(sd, f"{prefix}.key", bias=False),
            "v": _dense(sd, f"{prefix}.value"),
            "out": _dense(sd, f"{prefix}.out"),
        }

    def block(prefix, cross):
        out = {
            "attn_ln": _ln(sd, f"{prefix}.attn_ln"),
            "attn": attn(f"{prefix}.attn"),
            "mlp_ln": _ln(sd, f"{prefix}.mlp_ln"),
            "mlp_fc1": _dense(sd, f"{prefix}.mlp.0"),
            "mlp_fc2": _dense(sd, f"{prefix}.mlp.2"),
        }
        if cross:
            out["cross_attn_ln"] = _ln(sd, f"{prefix}.cross_attn_ln")
            out["cross_attn"] = attn(f"{prefix}.cross_attn")
        return out

    enc = {
        "conv1": {
            "kernel": _np(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
            "bias": _np(sd["encoder.conv1.bias"]),
        },
        "conv2": {
            "kernel": _np(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
            "bias": _np(sd["encoder.conv2.bias"]),
        },
        # openai checkpoints register the sinusoid table as a buffer; prefer
        # the stored value, else the exact host-computed table
        "positions": (
            _np(sd["encoder.positional_embedding"])
            if "encoder.positional_embedding" in sd
            else sinusoids(config.n_audio_ctx, config.n_audio_state)
        ),
        "ln_post": _ln(sd, "encoder.ln_post"),
    }
    for i in range(config.n_audio_layer):
        enc[f"block_{i}"] = block(f"encoder.blocks.{i}", cross=False)

    dec = {
        "token_embedding": _np(sd["decoder.token_embedding.weight"]),
        "positional_embedding": _np(sd["decoder.positional_embedding"]),
        "ln": _ln(sd, "decoder.ln"),
    }
    for i in range(config.n_text_layer):
        dec[f"block_{i}"] = block(f"decoder.blocks.{i}", cross=True)
    if scan_layers:
        enc = stack_block_params(enc, config.n_audio_layer)
        dec = stack_block_params(dec, config.n_text_layer)
    return {"encoder": enc, "decoder": dec}


def params_from_hf_state_dict(
    state_dict: Mapping[str, object],
    config: WhisperConfig,
    scan_layers: bool = False,
) -> dict:
    """Build the ``{"encoder": ..., "decoder": ...}`` param tree for
    :class:`wealy_tpu.models.whisper.model.Whisper` from an HF state dict.

    Accepts keys with or without the ``model.`` prefix
    (WhisperForConditionalGeneration vs WhisperModel); ``proj_out`` is ignored
    (Whisper ties it to the token embedding).
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model."):
            k = k[len("model.") :]
        sd[k] = v

    enc = {
        # torch Conv1d weight (out, in, k) -> linen Conv kernel (k, in, out)
        "conv1": {
            "kernel": _np(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
            "bias": _np(sd["encoder.conv1.bias"]),
        },
        "conv2": {
            "kernel": _np(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
            "bias": _np(sd["encoder.conv2.bias"]),
        },
        # the checkpoint's stored table when present (byte-faithful), else
        # the exact host-computed sinusoids
        "positions": (
            _np(sd["encoder.embed_positions.weight"])
            if "encoder.embed_positions.weight" in sd
            else sinusoids(config.n_audio_ctx, config.n_audio_state)
        ),
        "ln_post": _ln(sd, "encoder.layer_norm"),
    }
    for i in range(config.n_audio_layer):
        enc[f"block_{i}"] = _enc_block(sd, f"encoder.layers.{i}")

    dec = {
        "token_embedding": _np(sd["decoder.embed_tokens.weight"]),
        "positional_embedding": _np(sd["decoder.embed_positions.weight"]),
        "ln": _ln(sd, "decoder.layer_norm"),
    }
    for i in range(config.n_text_layer):
        dec[f"block_{i}"] = _dec_block(sd, f"decoder.layers.{i}")

    if scan_layers:
        enc = stack_block_params(enc, config.n_audio_layer)
        dec = stack_block_params(dec, config.n_text_layer)
    return {"encoder": enc, "decoder": dec}
