"""CLEWS acoustic-embedding extraction: audio -> CQT -> window encoder ->
the hs_clews file trio.

Produces exactly the on-disk layout the reference's multimodal datasets
consume (lib/embedding_dataset/multimodal_dataset.py:104-163):
  hs_clews      (N_WINDOWS, embed_dim)   per-window acoustic embeddings
  hs_clews_avg  (embed_dim,)             masked mean over valid windows
  hs_clews_mask (N_WINDOWS,) bool        True = INVALID window (ops convention)

Windowing: the song's CQT frames are laid out into N_WINDOWS (=116, the
reference's canonical sequence length) fixed-width windows; songs shorter
than the full span leave trailing windows invalid, longer songs are cropped.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from wealy_tpu.audio.cqt import cqt_spectrogram
from wealy_tpu.data.multimodal import CLEWS_SEQ_LEN
from wealy_tpu.models.clews_encoder import ClewsWindowEncoder


def make_clews_extractor(
    n_windows: int = CLEWS_SEQ_LEN,
    frames_per_window: int = 32,
    embed_dim: int = 2048,
    n_bins: int = 84,
    hop: int = 512,
    encoder_kwargs: Optional[dict] = None,
    params=None,
    seed: int = 0,
    cqt_method: str = "pseudo",
):
    """Build ``extract(audio (T,)) -> dict`` with the hs_clews trio.

    Random-init params unless ``params`` given (trained CLEWS weights are not
    distributable here; the extractor is the production plumbing).

    ``cqt_method``: "pseudo" (triangular filterbank on STFT, default) or
    "multirate" (the exact constant-Q transform,
    :func:`wealy_tpu.audio.cqt.cqt_multirate`).
    """
    enc = ClewsWindowEncoder(
        n_windows=n_windows,
        embed_dim=embed_dim,
        encoder_kwargs=encoder_kwargs or dict(stem=16, stages=((16, 2), (32, 2))),
    )
    total_frames = n_windows * frames_per_window
    cqt0 = jnp.zeros((1, n_bins, total_frames, 1), jnp.float32)
    if params is None:
        variables = enc.init(jax.random.PRNGKey(seed), cqt0, train=False)
    else:
        variables = params if "params" in params else {"params": params}

    @jax.jit
    def _embed(variables, cqt):
        return enc.apply(variables, cqt, train=False)[0]  # (n_windows, D)

    samples_per_window = frames_per_window * hop

    def extract(audio: np.ndarray) -> dict:
        audio = np.asarray(audio, np.float32)
        n_valid = min(
            n_windows, max(1, int(np.ceil(len(audio) / samples_per_window)))
        )
        need = total_frames * hop
        if len(audio) < need:
            audio = np.pad(audio, (0, need - len(audio)))
        else:
            audio = audio[:need]
        if cqt_method == "multirate":
            from wealy_tpu.audio.cqt import cqt_multirate

            cqt = cqt_multirate(audio, n_bins=n_bins, hop=hop)
        else:
            cqt = cqt_spectrogram(audio, n_bins=n_bins, hop=hop)  # (n_bins, ~frames)
        cqt = np.asarray(cqt)[:, :total_frames]
        if cqt.shape[1] < total_frames:
            cqt = np.pad(cqt, ((0, 0), (0, total_frames - cqt.shape[1])))
        z = np.asarray(
            _embed(variables, jnp.asarray(cqt[None, :, :, None])), np.float32
        )  # (n_windows, D)
        mask = np.ones((n_windows,), bool)  # True = invalid
        mask[:n_valid] = False
        valid = ~mask
        avg = z[valid].mean(axis=0) if valid.any() else np.zeros((embed_dim,), np.float32)
        return {"hs_clews": z, "hs_clews_avg": avg, "hs_clews_mask": mask}

    return extract


def extract_clews_split(
    config,
    metadata,
    split: str,
    *,
    extractor: Optional[Callable] = None,
    limit: Optional[int] = None,
    overwrite: bool = False,
    log: Callable[[str], None] = print,
) -> dict:
    """Write the hs_clews trio for every version of a split (resumable)."""
    from wealy_tpu.data.audio_dataset import AudioDataset
    from wealy_tpu.data.embedding_store import EmbeddingStore

    extractor = extractor or make_clews_extractor(
        cqt_method=getattr(config.model, "cqt_method", "pseudo")
    )
    store = EmbeddingStore(config.path.hidden_states, config.data.dataset_name)
    ds = AudioDataset(metadata, split, config.path.data)

    done, skipped, failed = [], [], []
    versions = ds.versions[:limit] if limit else ds.versions
    for version_key in versions:
        if not overwrite and store.exists(version_key, "hs_clews.npz"):
            skipped.append(version_key)
            continue
        item = ds[ds.versions.index(version_key)]
        try:
            out = extractor(item.waveform)
            store.save(version_key, "hs_clews.npz", embeddings=out["hs_clews"])
            store.save(version_key, "hs_clews_avg.npz", embeddings=out["hs_clews_avg"])
            store.save(version_key, "hs_clews_mask.npz", embeddings=out["hs_clews_mask"])
            done.append(version_key)
        except Exception as e:
            failed.append(version_key)
            log(f"[clews-extract] FAILED {version_key}: {e}")
    return {"done": done, "skipped": skipped, "failed": failed}
