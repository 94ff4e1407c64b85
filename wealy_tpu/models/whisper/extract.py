"""Embedding extraction: the pipeline that produces the reference's on-disk
embedding taxonomy (lib/embedding_dataset/base_dataset.py:99-126), TPU-native.

Reference file -> extractor mapping (per song; a song is a sequence of 30 s
chunks):

  x_all        encoder, full states            (n_chunks, 1500, D)
  x_concat     encoder, pooled per chunk       (n_chunks, D)
  hs_last_all  decoder last hidden, per chunk  (n_chunks, max_len, D) + lengths
  hs_last_seq  decoder last hidden, flattened  (sum_len, D)
  *_en         same with the language forced to English in the prompt
  hs_wealy_concat  projection-head outputs     (n_chunks, zdim) — produced by
                   wealy_tpu.models.heads on top of x_all / hs_last_*

All device work is batched over chunks; host code only reshapes per-song.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from wealy_tpu.audio.mel import N_SAMPLES
from wealy_tpu.audio.pallas_mel import log_mel_spectrogram_pallas
from wealy_tpu.models.whisper.config import WhisperConfig
from wealy_tpu.models.whisper.generate import default_prompt, greedy_decode
from wealy_tpu.models.whisper.model import Whisper


def chunk_waveform(audio: np.ndarray, n_samples: int = N_SAMPLES) -> np.ndarray:
    """Split a 1-D waveform into zero-padded 30 s chunks: (n_chunks, n_samples)."""
    audio = np.asarray(audio, dtype=np.float32)
    n_chunks = max(1, -(-len(audio) // n_samples))
    out = np.zeros((n_chunks, n_samples), np.float32)
    for i in range(n_chunks):
        seg = audio[i * n_samples : (i + 1) * n_samples]
        out[i, : len(seg)] = seg
    return out


def encoder_states(model: Whisper, params, mel):
    """(B, n_mels, 3000) -> (B, 1500, D) encoder states."""
    return model.apply({"params": params}, mel, method=Whisper.encode)


def encoder_embeddings(model: Whisper, params, mel, pool: str = "mean"):
    """x_concat-style pooled encoder embedding per chunk: (B, D)."""
    states = encoder_states(model, params, mel)
    if pool == "mean":
        return jnp.mean(states, axis=1)
    if pool == "max":
        return jnp.max(states, axis=1)
    raise ValueError(f"unknown pool mode {pool!r}")


def decoder_embeddings(
    model: Whisper,
    params,
    mel,
    config: WhisperConfig,
    language: Optional[int] = None,
    max_len: int = 224,
    eot: Optional[int] = None,
):
    """hs_last_all-style decoder last-hidden-state embeddings per chunk.

    Returns dict: ``hidden`` (B, max_len, D), ``lengths`` (B,),
    ``tokens`` (B, max_len). Set ``language=0`` for the ``_en`` variants.
    """
    enc = encoder_states(model, params, mel)
    prompt = default_prompt(config, language=language)
    return greedy_decode(
        model, params, enc, config, prompt=prompt, max_len=max_len, eot=eot
    )


def flatten_decoder_sequence(hidden: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """hs_last_seq: concatenate the valid positions of every chunk: (sum_len, D)."""
    parts = [np.asarray(hidden[i, : int(lengths[i])]) for i in range(hidden.shape[0])]
    return np.concatenate(parts, axis=0) if parts else np.zeros((0, hidden.shape[-1]))


def extract_song(
    model: Whisper,
    params,
    audio: np.ndarray,
    config: WhisperConfig,
    kinds: Sequence[str] = ("x_concat",),
    max_len: int = 224,
):
    """Run the full per-song extraction for the requested taxonomy entries.

    ``kinds`` ⊆ {x_all, x_concat, hs_last_all, hs_last_seq, hs_last_all_en,
    hs_last_seq_en}. Audio is chunked to 30 s windows; all chunks are batched
    through the model together.
    """
    chunks = chunk_waveform(audio)
    mel = log_mel_spectrogram_pallas(jnp.asarray(chunks), n_mels=config.n_mels)
    out = {}
    if "x_all" in kinds:
        out["x_all"] = np.asarray(encoder_states(model, params, mel))
    if "x_concat" in kinds:
        out["x_concat"] = np.asarray(encoder_embeddings(model, params, mel))
    for suffix, language in (("", None), ("_en", 0)):
        wants = {
            f"hs_last_all{suffix}",
            f"hs_last_seq{suffix}",
            f"hs_all{suffix}",
        } & set(kinds)
        if not wants:
            continue
        dec = decoder_embeddings(
            model, params, mel, config, language=language, max_len=max_len
        )
        hidden = np.asarray(dec["hidden"], dtype=np.float32)
        lengths = np.asarray(dec["lengths"])
        if f"hs_last_all{suffix}" in kinds:
            out[f"hs_last_all{suffix}"] = hidden
            out[f"hs_last_all{suffix}_lengths"] = lengths
        if f"hs_last_seq{suffix}" in kinds:
            out[f"hs_last_seq{suffix}"] = flatten_decoder_sequence(hidden, lengths)
        if f"hs_all{suffix}" in kinds:
            # all-layer hidden states: teacher-forced pass over the decoded
            # tokens (hidden_states/all taxonomy entry)
            from wealy_tpu.models.whisper.model import Whisper as _W

            enc = encoder_states(model, params, mel)
            _, _, all_h = model.apply(
                {"params": params},
                dec["tokens"],
                enc,
                return_all_hiddens=True,
                method=_W.decode,
            )
            out[f"hs_all{suffix}"] = np.asarray(all_h, dtype=np.float32)
            out[f"hs_all{suffix}_lengths"] = lengths
    return out
