"""Transcription job: audio -> long-form Whisper decode -> .txt files +
validity census.

Produces what the reference's transcription stack consumes
(lib/audio_dataset/cache.py expects ``{root}/{whisper_set}/.../{key}.txt``
trees): per-version transcription text files, then a TranscriptionCache index
+ TranscriptionValidator census persisted alongside.

Decoding follows Whisper's published long-form algorithm by default —
sequential chunks with <|startofprev|> context carry-over, temperature
fallback, compression-ratio/logprob gating, no-speech skip
(wealy_tpu.models.whisper.longform) — because the reference's transcription
sets (``turbo_nothing_whisper_42`` etc.) were produced that way; greedy
per-chunk decoding remains available via ``longform=False``.

Token ids decode to text through the offline byte-level BPE
(wealy_tpu.data.tokenizer) when a vocab directory is supplied; without one,
the job writes token-id lines (still resumable — re-run with a tokenizer to
overwrite).
"""

from __future__ import annotations

import zlib

from pathlib import Path
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from wealy_tpu.data.audio_dataset import AudioDataset
from wealy_tpu.data.metadata import Metadata
from wealy_tpu.data.tokenizer import ByteLevelBPE
from wealy_tpu.data.transcription import TranscriptionCache, TranscriptionValidator
from wealy_tpu.models.whisper.extract import chunk_waveform
from wealy_tpu.models.whisper.generate import default_prompt, greedy_decode
from wealy_tpu.models.whisper.model import Whisper
from wealy_tpu.train.config import Config


def transcribe_split(
    config: Config,
    metadata: Metadata,
    split: str,
    *,
    tokenizer_dir: Optional[str] = None,
    language: Optional[int] = 0,
    max_len: int = 224,
    limit: Optional[int] = None,
    overwrite: bool = False,
    hf_checkpoint: Optional[str] = None,
    longform: bool = True,
    log: Callable[[str], None] = print,
) -> dict:
    """Transcribe every version of a split into the reference .txt layout and
    run the validity census. Returns {done, skipped, failed, census}."""
    from wealy_tpu.cli.extract import load_whisper_model

    model, params, wcfg = load_whisper_model(config, hf_checkpoint)
    tokenizer = ByteLevelBPE.from_dir(tokenizer_dir) if tokenizer_dir else None
    ds = AudioDataset(metadata, split, config.path.data)

    root = (
        Path(config.path.cache or config.path.working_dir or ".")
        / "transcriptions"
        / config.data.whisper_set
        / split
    )
    root.mkdir(parents=True, exist_ok=True)
    prompt = default_prompt(wcfg, language=language)

    done, skipped, failed = [], [], []
    versions = ds.versions[:limit] if limit else ds.versions
    # O(1) key->row lookup (a versions.index() scan per song is O(N^2) over
    # the split — ~3.8e9 string compares at SHS's 87K-version train split)
    index_of = {v: i for i, v in enumerate(ds.versions)}
    for version_key in versions:
        out_path = root / f"{version_key.replace('/', '__')}.txt"
        if out_path.exists() and not overwrite:
            skipped.append(version_key)
            continue
        item = ds[index_of[version_key]]
        try:
            chunks = chunk_waveform(item.waveform)
            from wealy_tpu.audio.pallas_mel import log_mel_spectrogram_pallas

            mel = log_mel_spectrogram_pallas(jnp.asarray(chunks), n_mels=wcfg.n_mels)
            enc = model.apply({"params": params}, mel, method=Whisper.encode)
            if longform:
                from wealy_tpu.models.whisper.longform import transcribe_longform

                res = transcribe_longform(
                    model, params, enc, wcfg,
                    language=language, max_len=max_len,
                    decode_text=(
                        (lambda ids: tokenizer.decode(list(ids)))
                        if tokenizer is not None else None
                    ),
                    seed=zlib.crc32(version_key.encode()) & 0x7FFFFFFF,
                )
                if tokenizer is not None:
                    pieces = [res["text"] or ""]
                else:
                    pieces = [
                        " ".join(str(int(t)) for t in toks)
                        for toks in res["chunk_tokens"]
                    ]
            else:
                out = greedy_decode(
                    model, params, enc, wcfg, prompt=prompt, max_len=max_len
                )
                tokens = np.asarray(out["tokens"])
                lengths = np.asarray(out["lengths"])
                pieces = []
                for c in range(tokens.shape[0]):
                    ids = tokens[c, len(prompt) : int(lengths[c])]
                    if tokenizer is not None:
                        pieces.append(tokenizer.decode(ids.tolist()))
                    else:
                        pieces.append(" ".join(str(int(t)) for t in ids))
            out_path.write_text(" ".join(p.strip() for p in pieces).strip() + "\n")
            done.append(version_key)
        except Exception as e:
            failed.append(version_key)
            log(f"[transcribe] FAILED {version_key}: {e}")

    # census: index the tree and validate every transcription
    cache = TranscriptionCache(
        root.parent, config.data.dataset_name, config.data.whisper_set, split
    )
    cache.build_index(root)
    census = cache.validate_all(
        [v.replace("/", "__") for v in versions],
        TranscriptionValidator(min_words=10, max_repetition_ratio=0.6),
    )
    cache.save_disk_cache()
    n_valid = sum(1 for c in census.values() if c["has_valid_transcription"])
    return {
        "done": done,
        "skipped": skipped,
        "failed": failed,
        "n_valid": n_valid,
        "n_total": len(versions),
        "cache_file": str(cache.cache_file),
    }
