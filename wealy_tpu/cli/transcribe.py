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
    beam_size: Optional[int] = None,
    initial_prompt: Optional[str] = None,
    log: Callable[[str], None] = print,
) -> dict:
    """Transcribe every version of a split into the reference .txt layout and
    run the validity census. Returns {done, skipped, failed, census}.

    ``beam_size`` (>1) decodes with beam search on the deterministic rung
    (openai-whisper's ``DecodingOptions.beam_size``); greedy otherwise.
    ``initial_prompt`` (longform only) pre-seeds the first chunk's
    <|startofprev|> context (openai-whisper semantics; needs a tokenizer).
    Decoding applies openai-whisper's default suppression set — task
    specials always, the non-speech symbol tokens when a tokenizer is
    available (generate.default_suppress_tokens)."""
    from wealy_tpu.cli.extract import load_whisper_model
    from wealy_tpu.models.whisper.generate import default_suppress_tokens

    model, params, wcfg = load_whisper_model(config, hf_checkpoint)
    tokenizer = ByteLevelBPE.from_dir(tokenizer_dir) if tokenizer_dir else None
    suppress = default_suppress_tokens(wcfg, tokenizer)
    init_toks = None
    if initial_prompt:
        if tokenizer is None:
            raise ValueError("--initial-prompt requires --tokenizer-dir")
        init_toks = tokenizer.encode(" " + initial_prompt.strip())
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
                    beam_size=beam_size,
                    suppress_tokens=suppress,
                    initial_prompt_tokens=init_toks,
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
                if beam_size is not None and beam_size > 1:
                    from wealy_tpu.models.whisper.beam import beam_decode

                    out = beam_decode(
                        model, params, enc, wcfg, prompt=prompt,
                        beam_size=int(beam_size), max_len=max_len,
                        suppress_tokens=suppress,
                    )
                else:
                    out = greedy_decode(
                        model, params, enc, wcfg, prompt=prompt,
                        max_len=max_len, suppress_tokens=suppress,
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

    return _census_result(config, root, split, versions, done, skipped, failed)


def _census_result(config, root, split, versions, done, skipped, failed) -> dict:
    """Index the .txt tree and run the validity census (shared by the
    sequential and batched drivers)."""
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


def make_transcribe_fn(config: Config, hf_checkpoint=None, *,
                       language: Optional[int] = 0, max_len: int = 224,
                       mesh=None, beam_size: Optional[int] = None,
                       tokenizer=None):
    """Jitted batched device path for transcription: fused Pallas mel ->
    Whisper encoder -> greedy decode, ONE compile for a fixed (B, N_SAMPLES)
    batch. ``fn(audio) -> (tokens (B, max_len), lengths (B,))``; params are
    jit arguments (closure params blow up remote-compile requests —
    BENCH_NOTES.md). ``beam_size`` (>1) swaps greedy for beam search —
    per-chunk beams batch across songs exactly like greedy rows (the beam
    axis flattens into the device batch, wealy_tpu.models.whisper.beam)."""
    import jax

    from wealy_tpu.audio.pallas_mel import log_mel_spectrogram_pallas
    from wealy_tpu.cli.extract import load_whisper_model

    model, params, wcfg = load_whisper_model(config, hf_checkpoint)
    prompt = default_prompt(wcfg, language=language)
    from wealy_tpu.models.whisper.generate import default_suppress_tokens

    suppress_tokens = default_suppress_tokens(wcfg, tokenizer)

    @jax.jit
    def _run(p, audio):
        mel = log_mel_spectrogram_pallas(audio, n_mels=wcfg.n_mels)
        enc = model.apply({"params": p}, mel, method=Whisper.encode)
        if beam_size is not None and beam_size > 1:
            from wealy_tpu.models.whisper.beam import beam_decode

            out = beam_decode(
                model, p, enc, wcfg, prompt=prompt,
                beam_size=int(beam_size), max_len=max_len,
                suppress_tokens=suppress_tokens,
            )
        else:
            out = greedy_decode(
                model, p, enc, wcfg, prompt=prompt, max_len=max_len,
                suppress_tokens=suppress_tokens,
            )
        return out["tokens"], out["lengths"]

    if mesh is not None:
        from wealy_tpu.parallel.mesh import data_sharding

        def fn(audio):
            if audio.shape[0] % mesh.shape["data"] == 0:
                audio = jax.device_put(audio, data_sharding(mesh, 2))
            return _run(params, audio)
    else:
        def fn(audio):
            return _run(params, audio)

    fn.prompt_len = len(prompt)
    return fn


def transcribe_split_batched(
    config: Config,
    metadata: Metadata,
    split: str,
    transcribe_fn=None,
    *,
    tokenizer_dir: Optional[str] = None,
    language: Optional[int] = 0,
    max_len: int = 224,
    batch_size: int = 16,
    mesh=None,
    limit: Optional[int] = None,
    overwrite: bool = False,
    hf_checkpoint: Optional[str] = None,
    n_workers: int = 4,
    beam_size: Optional[int] = None,
    log: Callable[[str], None] = print,
) -> dict:
    """Cross-song batched transcription: the device-saturating Phase-A
    driver for the reference's full-corpus transcription trees
    (lib/audio_dataset/cache.py:46-90 consumes ~100K .txt files per
    whisper_set — the implied upstream job transcribed every version).

    30 s chunks from MANY songs share fixed-size device batches exactly like
    ``extract_split_batched`` (one jit signature, host decode prefetched,
    mesh-sharded batch when available); per-chunk token rows scatter back to
    per-song accumulators that write ``{key}.txt`` as soon as a song
    completes. Greedy per-chunk decoding (the trivially-batchable mode);
    long-form sequential decoding stays on :func:`transcribe_split` — its
    chunk-to-chunk prompt dependence serializes each song by construction.

    Host-side cost is O(N): version lookup is a dict, resume is one stat()
    per version, accumulators hold only in-flight songs.
    """
    from wealy_tpu.cli.extract_batched import _chunk_stream
    from wealy_tpu.utils.prefetch import prefetch
    from wealy_tpu.utils.profiling import ThroughputMeter

    tokenizer = ByteLevelBPE.from_dir(tokenizer_dir) if tokenizer_dir else None
    if transcribe_fn is None:
        transcribe_fn = make_transcribe_fn(
            config, hf_checkpoint, language=language, max_len=max_len,
            mesh=mesh, beam_size=beam_size, tokenizer=tokenizer,
        )
    prompt_len = getattr(transcribe_fn, "prompt_len", 0)
    ds = AudioDataset(metadata, split, config.path.data)

    root = (
        Path(config.path.cache or config.path.working_dir or ".")
        / "transcriptions"
        / config.data.whisper_set
        / split
    )
    root.mkdir(parents=True, exist_ok=True)

    def out_path(v: str) -> Path:
        return root / f"{v.replace('/', '__')}.txt"

    if limit:
        ds.versions = ds.versions[:limit]
    versions = list(ds.versions)
    if not overwrite:
        todo = [v for v in versions if not out_path(v).exists()]
        skipped = [v for v in versions if out_path(v).exists()]
        ds.versions = todo
    else:
        skipped = []

    meter = ThroughputMeter(window=20)
    # per-song accumulators: pieces[chunk_idx] token-id arrays
    pieces: dict = {}
    expect: dict = {}
    done: list = []
    failed: list = []

    def finish(version_key: str) -> None:
        toks = pieces.pop(version_key)
        expect.pop(version_key)
        parts = []
        for ids in toks:
            if tokenizer is not None:
                parts.append(tokenizer.decode([int(t) for t in ids]))
            else:
                parts.append(" ".join(str(int(t)) for t in ids))
        try:
            out_path(version_key).write_text(
                " ".join(p.strip() for p in parts).strip() + "\n"
            )
            done.append(version_key)
        except OSError as e:
            failed.append(version_key)
            log(f"[transcribe-batched] FAILED {version_key}: {e}")

    pending: list = []

    def flush(batch):
        B = len(batch)
        from wealy_tpu.audio.mel import N_SAMPLES

        audio = np.zeros((batch_size, N_SAMPLES), np.float32)
        for i, (_, _, _, chunk) in enumerate(batch):
            audio[i] = chunk
        tokens, lengths = transcribe_fn(jnp.asarray(audio))
        tokens = np.asarray(tokens)[:B]
        lengths = np.asarray(lengths)[:B]
        meter.tick(B)
        for (version_key, chunk_idx, n_chunks, _), row, L in zip(
            batch, tokens, lengths
        ):
            expect[version_key] = n_chunks
            acc = pieces.setdefault(version_key, [None] * n_chunks)
            acc[chunk_idx] = row[prompt_len : int(L)]
            if all(p is not None for p in acc):
                finish(version_key)

    for entry in prefetch(
        _chunk_stream(ds, None, n_workers=n_workers), depth=2 * batch_size
    ):
        pending.append(entry)
        if len(pending) == batch_size:
            flush(pending)
            pending = []
            if len(done) and len(done) % 200 == 0:
                log(
                    f"[transcribe-batched] {len(done)} songs, "
                    f"{meter.items_per_sec:.1f} chunks/s"
                )
    if pending:
        flush(pending)
    incomplete = sorted(pieces.keys())

    result = _census_result(config, root, split, versions, done, skipped, failed)
    result["incomplete"] = incomplete
    result["throughput"] = meter.report()
    return result
