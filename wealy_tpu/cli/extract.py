"""Embedding extraction job: audio -> 30 s chunks -> mel -> Whisper -> store.

The flagship TPU workload (SURVEY.md §3.5): replaces the reference's
out-of-repo extraction that produced the hs_*/x_* files. Idempotent and
resumable — already-stored versions are skipped, failures are collected into
the missing-work list for re-runs (SURVEY.md §5.3/§5.4).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from wealy_tpu.data.audio_dataset import AudioDataset
from wealy_tpu.data.embedding_store import EmbeddingStore
from wealy_tpu.data.metadata import Metadata
from wealy_tpu.train.config import Config


def load_whisper_model(config: Config, hf_checkpoint: Optional[str] = None):
    """Build the extraction Whisper; load converted HF weights when given,
    otherwise random-init (weights are not downloadable in this environment)."""
    import jax
    import jax.numpy as jnp

    from wealy_tpu.models.whisper import (
        Whisper,
        WHISPER_CONFIGS,
        params_from_hf_state_dict,
    )

    cfg = WHISPER_CONFIGS[config.model.whisper_size]
    scan = getattr(config.model, "scan_layers", True)
    model = Whisper(cfg, dtype=jnp.bfloat16, scan_layers=scan)
    if hf_checkpoint:
        import torch

        from wealy_tpu.models.whisper import params_from_openai_state_dict

        sd = torch.load(hf_checkpoint, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if "model_state_dict" in sd or any(
            k.startswith("encoder.blocks.") for k in sd
        ):
            params = params_from_openai_state_dict(sd, cfg, scan_layers=scan)
        else:
            params = params_from_hf_state_dict(sd, cfg, scan_layers=scan)
    else:
        mel0 = jnp.zeros((1, cfg.n_mels, 3000), jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), mel0, jnp.zeros((1, 4), jnp.int32)
        )["params"]
    return model, params, cfg


def extract_split(
    config: Config,
    metadata: Metadata,
    split: str,
    *,
    kinds: Sequence[str] = ("x_concat", "hs_last_seq"),
    hf_checkpoint: Optional[str] = None,
    max_len: int = 224,
    limit: Optional[int] = None,
    overwrite: bool = False,
    log: Callable[[str], None] = print,
) -> dict:
    """Extract the requested taxonomy entries for every version in a split.

    Returns {"done": [...], "skipped": [...], "failed": [...]}.
    """
    from wealy_tpu.models.whisper.extract import extract_song

    model, params, wcfg = load_whisper_model(config, hf_checkpoint)
    store = EmbeddingStore(config.path.hidden_states, config.data.dataset_name)
    ds = AudioDataset(metadata, split, config.path.data)

    primary = f"{kinds[0]}.npz"
    done, skipped, failed = [], [], []
    versions = ds.versions[:limit] if limit else ds.versions
    for i, version_key in enumerate(versions):
        if not overwrite and store.exists(version_key, primary):
            skipped.append(version_key)
            continue
        item = ds[ds.versions.index(version_key)]
        try:
            out = extract_song(model, params, item.waveform, wcfg, kinds=kinds, max_len=max_len)
            for kind in kinds:
                arrays = {"embeddings": out[kind]}
                if f"{kind}_lengths" in out:
                    arrays["lengths"] = out[f"{kind}_lengths"]
                store.save(version_key, f"{kind}.npz", **arrays)
            done.append(version_key)
        except Exception as e:  # degrade-and-continue; recorded for re-run
            failed.append(version_key)
            log(f"[extract] FAILED {version_key}: {e}")
        if (i + 1) % 50 == 0:
            log(f"[extract] {i + 1}/{len(versions)} ({len(done)} new)")

    audit_dir = config.path.cache or config.path.working_dir
    if audit_dir:
        store.verify(metadata, primary, out_dir=audit_dir)
    return {"done": done, "skipped": skipped, "failed": failed}
