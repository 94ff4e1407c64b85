"""Multimodal training adapters: batch flattening + model_call builders for
every ``conf.model.name`` signature, so the generic train step drives the
fusion models exactly like the single-modal head.

Mask boundary: collates emit ops-convention masks (True = invalid); fusion
models take layer-convention masks (True = valid) — the adapters convert
(wealy_tpu.utils.masks rationale).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

from wealy_tpu.models.registry import build_model


def flatten_multimodal_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """(B, n_per_class, ...) multimodal batch -> flat (B*n, ...) with
    labels/ids, the layout the losses consume.

    Float leaves ship as float16 — the embedding store's disk dtype, so the
    cast is bit-lossless for store-sourced values and halves host->device
    transfer bytes (same rationale as ``loop.batch_to_device``); the jitted
    step upcasts on device (``step.upcast_batch``)."""
    B, n = batch["version_ids"].shape
    flat = {
        "labels": np.repeat(np.asarray(batch["clique_ids"], np.int32), n),
        "ids": np.asarray(batch["version_ids"], np.int32).reshape(-1),
    }
    for k, v in batch.items():
        if k in ("clique_ids", "version_ids"):
            continue
        v = np.asarray(v)
        if np.issubdtype(v.dtype, np.floating):
            v = v.astype(np.float16)
        flat[k] = v.reshape(B * n, *v.shape[2:])
    return flat


def make_model_call(name: str, model, signature: str) -> Callable:
    """model_call(params, flat_batch) -> (B*n, zdim) embeddings."""
    if signature == "single":

        def call(params, batch):
            return model.apply({"params": params}, batch["emb"], batch["mask"])

    elif signature == "wealy":

        def call(params, batch):
            return model.apply(
                {"params": params},
                batch["wealy"],
                batch["full_clews"],
                ~batch["clews_mask"],  # ops -> layer convention
            )

    elif signature == "dual":

        def call(params, batch):
            return model.apply(
                {"params": params},
                batch["whisper_seq"],
                ~batch["whisper_mask"],
                batch["full_clews"],
                ~batch["clews_mask"],
            )

    elif signature == "two_stream":

        def call(params, batch):
            z, _zw, _zc = model.apply(
                {"params": params},
                batch["whisper_seq"],
                ~batch["whisper_mask"],
                batch["full_clews"],
                ~batch["clews_mask"],
            )
            return z

    else:
        raise ValueError(f"unknown signature {signature!r}")

    def call_upcast(params, batch):
        # batches ship fp16 (flatten_multimodal_batch); widen to f32 on
        # device BEFORE any model math (pooling/norm stats must not run in
        # half precision). Covers eval-side jit(model_call) users too.
        from wealy_tpu.train.step import upcast_batch

        return call(params, upcast_batch(batch))

    return call_upcast


def build_trainable(name: str, zdim: int = 512, **kwargs) -> Tuple:
    """(model, signature, model_call) for any conf.model.name."""
    model, signature = build_model(name, zdim=zdim, **kwargs)
    return model, signature, make_model_call(name, model, signature)
