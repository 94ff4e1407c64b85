"""Batched, device-saturating embedding extraction.

``extract_split`` (extract.py) runs one song at a time — correct but leaves
the chip idle on short songs. This driver packs 30 s chunks from MANY songs
into fixed-size device batches (one jit signature), keeps the host decode
running ahead via the prefetch thread, shards the batch over the mesh when
one is available, and scatters per-chunk embeddings back into per-song
accumulators that flush to the store as soon as a song completes.

This is the production Phase-A pipeline of SURVEY.md §2.8 item 3: batch dim
sharded over chips (ICI), host data loading per-process.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from wealy_tpu.audio.mel import N_SAMPLES
from wealy_tpu.data.audio_dataset import AudioDataset
from wealy_tpu.data.embedding_store import EmbeddingStore
from wealy_tpu.data.metadata import Metadata
from wealy_tpu.models.whisper.extract import chunk_waveform
from wealy_tpu.parallel.multihost import host_shard
from wealy_tpu.train.config import Config
from wealy_tpu.utils.prefetch import prefetch
from wealy_tpu.utils.profiling import ThroughputMeter


@dataclasses.dataclass
class _SongAcc:
    version_key: str
    n_chunks: int
    received: int = 0
    embeddings: Optional[np.ndarray] = None  # (n_chunks, D)


def _chunk_stream(
    ds: AudioDataset, limit: Optional[int], n_workers: int = 1
) -> Iterator[Tuple[str, int, int, np.ndarray]]:
    """Yield (version_key, chunk_idx, n_chunks, chunk_audio) host-side.

    ``n_workers > 1`` decodes files on a thread pool with a bounded in-flight
    window (order preserved). Decode is dominated by the native C decoder /
    numpy, which release the GIL, so threads give real parallelism.
    """
    versions = ds.versions[:limit] if limit else ds.versions
    index_of = {v: i for i, v in enumerate(ds.versions)}

    if n_workers <= 1:
        for version_key in versions:
            item = ds[index_of[version_key]]
            chunks = chunk_waveform(item.waveform)
            for i in range(chunks.shape[0]):
                yield version_key, i, chunks.shape[0], chunks[i]
        return

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        window = 2 * n_workers
        pending = deque()
        it = iter(versions)

        def submit_next():
            try:
                v = next(it)
            except StopIteration:
                return False
            pending.append((v, pool.submit(lambda v=v: ds[index_of[v]])))
            return True

        for _ in range(window):
            if not submit_next():
                break
        while pending:
            version_key, fut = pending.popleft()
            item = fut.result()
            submit_next()
            chunks = chunk_waveform(item.waveform)
            for i in range(chunks.shape[0]):
                yield version_key, i, chunks.shape[0], chunks[i]


def extract_split_batched(
    config: Config,
    metadata: Metadata,
    split: str,
    embed_fn: Callable[[jnp.ndarray], jnp.ndarray],
    *,
    kind: str = "x_concat",
    batch_size: int = 32,
    mesh=None,
    limit: Optional[int] = None,
    overwrite: bool = False,
    n_workers: int = 4,
    log: Callable[[str], None] = print,
    sink: Optional[Callable] = None,
    skip_fn: Optional[Callable[[str], bool]] = None,
) -> dict:
    """Run one embedding kind over a split with cross-song chunk batching.

    ``embed_fn(audio (B, N_SAMPLES)) -> (B, D)`` is the jitted device path
    (mel + encoder [+ head]); it sees exactly one batch shape.

    ``sink(version_key, **arrays)``: overrides the per-version npz write —
    the direct-to-packed extraction path (`extract --pack-direct`) streams
    completed songs straight into a PackWriter, eliminating the intermediate
    per-version write + re-read of `--pack`. ``skip_fn(version_key)``
    replaces the npz-existence resume check to match the sink.
    """
    store = EmbeddingStore(config.path.hidden_states, config.data.dataset_name)
    ds = AudioDataset(metadata, split, config.path.data)
    filename = f"{kind}.npz"
    save = sink or (lambda v, **arrays: store.save(v, filename, **arrays))

    # --limit keeps its single-host meaning at pod scale: cap the GLOBAL
    # list first, then shard it round-robin per host (host_shard is the
    # identity when process_count()==1)
    if limit:
        ds.versions = ds.versions[:limit]
    limit = None
    ds.versions = host_shard(ds.versions)

    if not overwrite:
        exists = skip_fn or (lambda v: store.exists(v, filename))
        versions = [v for v in ds.versions if not exists(v)]
        skipped = len(ds.versions) - len(versions)
        ds.versions = versions
    else:
        skipped = 0

    meter = ThroughputMeter(window=20)
    accs: Dict[str, _SongAcc] = {}
    done: List[str] = []

    pending: List[Tuple[str, int, int, np.ndarray]] = []

    def flush(batch: List[Tuple[str, int, int, np.ndarray]]):
        B = len(batch)
        audio = np.zeros((batch_size, N_SAMPLES), np.float32)
        for i, (_, _, _, chunk) in enumerate(batch):
            audio[i] = chunk
        x = jnp.asarray(audio)
        if mesh is not None:
            from wealy_tpu.parallel.mesh import data_sharding

            x = jax.device_put(x, data_sharding(mesh, 2))
        z = np.asarray(embed_fn(x))[:B]
        meter.tick(B)
        for (version_key, chunk_idx, n_chunks, _), emb in zip(batch, z):
            acc = accs.get(version_key)
            if acc is None:
                acc = accs[version_key] = _SongAcc(version_key, n_chunks)
            if acc.embeddings is None:
                acc.embeddings = np.zeros((n_chunks, emb.shape[-1]), np.float32)
            acc.embeddings[chunk_idx] = emb
            acc.received += 1
            if acc.received == acc.n_chunks:
                save(version_key, embeddings=acc.embeddings)
                done.append(version_key)
                del accs[version_key]

    for entry in prefetch(_chunk_stream(ds, limit, n_workers=n_workers), depth=2 * batch_size):
        pending.append(entry)
        if len(pending) == batch_size:
            flush(pending)
            pending = []
            if len(done) and len(done) % 200 == 0:
                log(f"[extract-batched] {len(done)} songs, {meter.items_per_sec:.0f} chunks/s")
    if pending:
        flush(pending)

    # any partially-filled accumulators indicate a bug; record them
    incomplete = sorted(accs.keys())
    audit_dir = config.path.cache or config.path.working_dir
    if audit_dir and jax.process_count() == 1 and sink is None:
        # at pod scale every host would race-write the global resume lists
        # while others are mid-extraction; run the audit as a post-step.
        # (custom sinks own their completeness accounting — the npz census
        # would report everything missing)
        store.verify(metadata, filename, out_dir=audit_dir)
    return {
        "done": done,
        "skipped": skipped,
        "incomplete": incomplete,
        "throughput": meter.report(),
    }


def extract_split_batched_decoder(
    config: Config,
    metadata: Metadata,
    split: str,
    decode_fn: Callable,
    *,
    kind: str = "hs_last_seq",
    batch_size: int = 16,
    limit: Optional[int] = None,
    overwrite: bool = False,
    n_workers: int = 4,
    log: Callable[[str], None] = print,
    sink: Optional[Callable] = None,
    skip_fn: Optional[Callable[[str], bool]] = None,
) -> dict:
    """Batched DECODER-embedding extraction (hs_last_all / hs_last_seq kinds).

    ``decode_fn(audio (B, N_SAMPLES)) -> (hidden (B, max_len, D),
    lengths (B,))`` — see :func:`make_decoder_embed_fn`. Chunks from many
    songs share device batches exactly like the encoder driver; per-song
    results store as ``hidden (n_chunks, max_len, D)`` + ``lengths`` (the
    hs_last_all layout), or flattened valid positions for hs_last_seq.
    """
    from wealy_tpu.models.whisper.extract import flatten_decoder_sequence

    store = EmbeddingStore(config.path.hidden_states, config.data.dataset_name)
    ds = AudioDataset(metadata, split, config.path.data)
    filename = f"{kind}.npz"
    flatten = kind.startswith("hs_last_seq")
    save = sink or (lambda v, **arrays: store.save(v, filename, **arrays))

    # global --limit semantics, then per-host round-robin (see encoder driver)
    if limit:
        ds.versions = ds.versions[:limit]
    limit = None
    ds.versions = host_shard(ds.versions)

    if not overwrite:
        exists = skip_fn or (lambda v: store.exists(v, filename))
        versions = [v for v in ds.versions if not exists(v)]
        skipped = len(ds.versions) - len(versions)
        ds.versions = versions
    else:
        skipped = 0

    meter = ThroughputMeter(window=20)
    hidden_acc: Dict[str, list] = {}
    length_acc: Dict[str, list] = {}
    expect: Dict[str, int] = {}
    done: List[str] = []
    pending: List[Tuple[str, int, int, np.ndarray]] = []

    def flush(batch):
        B = len(batch)
        audio = np.zeros((batch_size, N_SAMPLES), np.float32)
        for i, (_, _, _, chunk) in enumerate(batch):
            audio[i] = chunk
        hidden, lengths = decode_fn(jnp.asarray(audio))
        hidden = np.asarray(hidden, np.float32)[:B]
        lengths = np.asarray(lengths)[:B]
        meter.tick(B)
        for (version_key, chunk_idx, n_chunks, _), hid, L in zip(batch, hidden, lengths):
            expect[version_key] = n_chunks
            hidden_acc.setdefault(version_key, [None] * n_chunks)[chunk_idx] = hid
            length_acc.setdefault(version_key, [0] * n_chunks)[chunk_idx] = int(L)
            if all(h is not None for h in hidden_acc[version_key]):
                hid_all = np.stack(hidden_acc[version_key])  # (n_chunks, max_len, D)
                lens = np.array(length_acc[version_key], np.int32)
                if flatten:
                    save(
                        version_key,
                        embeddings=flatten_decoder_sequence(hid_all, lens),
                    )
                else:
                    save(version_key, embeddings=hid_all, lengths=lens)
                done.append(version_key)
                del hidden_acc[version_key], length_acc[version_key]

    for entry in prefetch(_chunk_stream(ds, limit, n_workers=n_workers), depth=2 * batch_size):
        pending.append(entry)
        if len(pending) == batch_size:
            flush(pending)
            pending = []
    if pending:
        flush(pending)

    incomplete = sorted(hidden_acc.keys())
    audit_dir = config.path.cache or config.path.working_dir
    if audit_dir and jax.process_count() == 1 and sink is None:
        # pod scale: see the encoder driver — audit post-hoc, not per host
        store.verify(metadata, filename, out_dir=audit_dir)
    return {
        "done": done,
        "skipped": skipped,
        "incomplete": incomplete,
        "throughput": meter.report(),
    }


def make_decoder_embed_fn(
    config: Config,
    hf_checkpoint: Optional[str] = None,
    language: Optional[int] = 0,
    max_len: int = 224,
    cross_kv_f8: bool = False,
    self_kv_f8: bool = False,
    mesh=None,
    tp: int = 1,
):
    """decode_fn for :func:`extract_split_batched_decoder`: mel -> encoder ->
    greedy decode -> (last hidden states, lengths).

    ``cross_kv_f8``: store the prefill cross-attention K/V in float8_e4m3 —
    -28% per decode step at B=128 (bandwidth-bound re-reads), ~1.4%
    hidden-state perturbation (BENCH_NOTES round 2). Opt-in.

    ``self_kv_f8``: float8 storage for the self-attention KV caches too
    (round-3; halves the cache's per-step HBM traffic — BENCH_NOTES round 3
    for measured throughput/perturbation). Opt-in.

    ``mesh``: shard the clip batch over the mesh's data axis — data-parallel
    greedy decode (every decode-loop op is batch-parallel, so XLA keeps the
    per-chip KV caches local; no cross-chip traffic after the input scatter).

    ``tp``: tensor-parallel degree (>1 builds a (data, model) mesh over all
    devices and Megatron-shards the Whisper params — the large-v3 path;
    see wealy_tpu.parallel.tp). Mutually exclusive with ``mesh``.
    """
    import jax.numpy as jnp

    from wealy_tpu.audio.pallas_mel import log_mel_spectrogram_pallas
    from wealy_tpu.cli.extract import load_whisper_model
    from wealy_tpu.models.whisper.generate import default_prompt, greedy_decode
    from wealy_tpu.models.whisper.model import Whisper

    model, params, wcfg = load_whisper_model(config, hf_checkpoint)
    prompt = default_prompt(wcfg, language=language)
    kv_dtype = jnp.float8_e4m3fn if cross_kv_f8 else None
    self_dtype = jnp.float8_e4m3fn if self_kv_f8 else None

    if tp > 1:
        from wealy_tpu.parallel.tp import make_tp_mesh, shard_params, tp_decode_fn

        assert mesh is None, "pass either mesh (dp) or tp (>1), not both"
        # rebuild with the XLA attention path: the Pallas flash kernel has no
        # GSPMD partitioning rule, so under a model-sharded mesh the encoder
        # must use the einsum attention (partitions cleanly by heads). The
        # param tree is identical, so the loaded params are reused as-is.
        model = Whisper(
            wcfg, dtype=model.dtype, scan_layers=model.scan_layers, use_flash=False
        )
        # TP over HOST-LOCAL chips: extraction data is host-sharded, so the
        # model axis must not span hosts (each host runs its own TP program)
        mesh2d = make_tp_mesh(n_model=tp, devices=jax.local_devices())
        params = shard_params(params, mesh2d)
        tp_decode = tp_decode_fn(
            model, mesh2d, wcfg, prompt, max_len=max_len,
            cross_kv_dtype=kv_dtype, self_kv_dtype=self_dtype,
        )

        @jax.jit
        def _mel(audio):
            return log_mel_spectrogram_pallas(audio, n_mels=wcfg.n_mels)

        def decode_fn(audio):
            out = tp_decode(params, _mel(audio))
            return out["hidden"], out["lengths"]

        return decode_fn

    @jax.jit
    def _decode(params, audio):
        mel = log_mel_spectrogram_pallas(audio, n_mels=wcfg.n_mels)
        enc = model.apply({"params": params}, mel, method=Whisper.encode)
        out = greedy_decode(
            model, params, enc, wcfg, prompt=prompt, max_len=max_len,
            cross_kv_dtype=kv_dtype, self_kv_dtype=self_dtype,
        )
        return out["hidden"], out["lengths"]

    def decode_fn(audio):
        if mesh is not None:
            from wealy_tpu.parallel.mesh import data_sharding

            audio = jax.device_put(audio, data_sharding(mesh, 2))
        return _decode(params, audio)

    return decode_fn


def make_wealy_embed_fn(
    config: Config,
    hf_checkpoint: Optional[str] = None,
    head_checkpoint: Optional[str] = None,
):
    """embed_fn producing WEALY chunk embeddings: mel -> Whisper encoder ->
    ProjectionHead -> (B, zdim). Feeding this through the batched driver with
    kind='hs_wealy_concat' yields the (n_chunks, zdim) per-song files the
    multimodal datasets consume (multimodal_dataset.py:104-126 layout).

    Head weights come from an orbax checkpoint dir (a trained metric-learning
    head) or random init.
    """
    from wealy_tpu.audio.pallas_mel import log_mel_spectrogram_pallas
    from wealy_tpu.cli.extract import load_whisper_model
    from wealy_tpu.models.heads import ProjectionHead
    from wealy_tpu.models.whisper.model import Whisper

    model, params, wcfg = load_whisper_model(config, hf_checkpoint)
    head = ProjectionHead(
        zdim=config.model.zdim, hidden=(config.model.zdim,), dtype=jnp.bfloat16
    )
    head_params = None
    ckpt_dir = head_checkpoint or config.path.checkpoints
    if ckpt_dir:
        from wealy_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        if mgr.latest_step() is not None:
            head_params = mgr.restore()["params"]
    if head_params is None:
        enc0 = jnp.zeros((1, wcfg.n_audio_ctx, wcfg.n_audio_state), jnp.bfloat16)
        head_params = head.init(
            jax.random.PRNGKey(0), enc0, jnp.ones((1, wcfg.n_audio_ctx), bool)
        )["params"]

    @jax.jit
    def _embed(params, head_params, audio):
        mel = log_mel_spectrogram_pallas(audio, n_mels=wcfg.n_mels)
        states = model.apply({"params": params}, mel, method=Whisper.encode)
        mask = jnp.ones(states.shape[:2], bool)
        return head.apply({"params": head_params}, states, mask)

    return lambda audio: _embed(params, head_params, audio)


def make_encoder_embed_fn(
    config: Config,
    hf_checkpoint: Optional[str] = None,
    quant_int8: bool = False,
):
    """Default embed_fn: fused Pallas mel -> Whisper encoder -> mean pool.

    ``quant_int8``: run the encoder through the W8A8 int8 path
    (models/whisper/quant.py) — the dense projections ride the 2x-rate int8
    MXU; LN/softmax/attention stay f32/bf16. Opt-in (like the f8 KV modes);
    perturbation + throughput in BENCH_NOTES.
    """
    from wealy_tpu.audio.pallas_mel import log_mel_spectrogram_pallas
    from wealy_tpu.cli.extract import load_whisper_model
    from wealy_tpu.models.whisper.model import Whisper

    model, params, wcfg = load_whisper_model(config, hf_checkpoint)

    if quant_int8:
        import numpy as np

        from wealy_tpu.models.whisper.quant import (
            quant_encode_fn,
            quantize_encoder_params,
        )

        qparams = quantize_encoder_params(
            jax.tree_util.tree_map(np.asarray, dict(params)), wcfg
        )
        qenc = quant_encode_fn(wcfg, dtype=jnp.bfloat16)

        @jax.jit
        def _embed_q(qparams, audio):
            mel = log_mel_spectrogram_pallas(audio, n_mels=wcfg.n_mels)
            return jnp.mean(qenc(qparams, mel), axis=1)

        return lambda audio: _embed_q(qparams, audio)

    @jax.jit
    def _embed(params, audio):
        mel = log_mel_spectrogram_pallas(audio, n_mels=wcfg.n_mels)
        states = model.apply({"params": params}, mel, method=Whisper.encode)
        return jnp.mean(states, axis=1)

    # params as a jit argument (closure params blow up remote-compile
    # requests — BENCH_NOTES.md); bind them here for the driver interface
    return lambda audio: _embed(params, audio)
