"""Serving surface: build a retrieval index for a corpus split, then answer
audio queries against it (cover-song search — the product the reference's
training pipeline exists to enable but never ships as a runnable surface;
its evaluate-only flow stops at corpus-internal MAP/MR1).

Two commands:

- ``index``: embed every song of a split through the trained head (the same
  collate_overlapping -> slabbed encoder -> chunk-set regroup path
  ``evaluate`` uses) and persist a self-contained ``.npz`` index: pooled
  song vectors for fast cosine ranking plus (optionally) the full chunk
  sets for exact ``distance_tensor_redux`` re-scoring — the scoring the
  reference's test-time path defines (SURVEY.md §3.4,
  lib/tensor_ops.py:241-335).
- ``query``: raw audio file -> native decode/resample -> 30 s chunks ->
  Whisper embed (the kind the config trains on) -> trained head -> score
  against the index -> top-k (version_key, clique, score) JSON.

Single-modal models only (``whisper``): the fusion models need per-song
CLEWS/transcription context that a cold query does not have.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Optional

import numpy as np

INDEX_VERSION = 1

# chunk counts are padded up to a multiple of this before the whisper embed
# jit call so arbitrary-length query audio reuses a handful of compiled
# shapes instead of one per distinct chunk count
_QUERY_PAD = 8


def _load_head_params(config, model, checkpoint: Optional[str], L: int, emb_dim: int):
    """Trained head params from the checkpoint dir (evaluate semantics:
    random init when no checkpoint exists — useful for plumbing tests)."""
    import jax
    import jax.numpy as jnp

    from wealy_tpu.train.checkpoint import CheckpointManager

    step = None
    params = None
    ckpt_dir = checkpoint or config.path.checkpoints
    if ckpt_dir:
        mgr = CheckpointManager(ckpt_dir)
        step = mgr.latest_step()
        if step is not None:
            params = mgr.restore()["params"]
    if params is None:
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, L, emb_dim)),
            jnp.ones((1, L), bool),
        )["params"]
    return params, step


def cmd_index(args) -> int:
    """Embed a split into a serving index file."""
    import jax

    from wealy_tpu.data.chunking import collate_overlapping
    from wealy_tpu.data.dataset import EmbeddingDataset
    from wealy_tpu.eval.retrieval import regroup_chunks, slabbed_apply
    from wealy_tpu.models.registry import build_model
    from wealy_tpu.utils.hostmem import trim_host_heap

    from wealy_tpu.cli.main import _load_config

    config = _load_config(args.config)
    model, sig = build_model(config.model.name, zdim=config.model.zdim)
    if sig != "single":
        print(
            f"[index] {config.model.name} is a fusion model; serving "
            "supports single-modal (whisper) heads",
            file=sys.stderr,
        )
        return 2
    ds = EmbeddingDataset(config, args.split, seed=0)
    versions = list(ds.sampler.versions)
    emb_dim = ds.load_embedding(versions[0]).shape[-1]
    L = config.data.chunk_size
    params, step = _load_head_params(config, model, args.checkpoint, L, emb_dim)
    embed = jax.jit(lambda e, m: model.apply({"params": params}, e, m))

    keys, cliques, labels, ids = [], [], [], []
    vec_groups, set_groups, mask_groups = [], [], []
    group = max(1, args.song_group)
    for g0 in range(0, len(versions), group):
        gv = versions[g0 : g0 + group]
        items = [
            (ds.sampler.labels[ds.sampler.clique_of[v]],
             [(int(ds.metadata.info[v]["id"]), ds.load_embedding(v))])
            for v in gv
        ]
        batch = collate_overlapping(
            items, chunk_size=L, overlap=config.data.overlap_percentage
        )
        z = slabbed_apply(
            embed, batch.embeddings, batch.masks, slab_size=args.encode_slab
        )
        sets, set_mask, bidx, _ = regroup_chunks(
            z, batch.chunk_info, batch.chunk_valid
        )
        keys.extend(gv[i] for i in bidx)
        cliques.extend(ds.sampler.clique_of[gv[i]] for i in bidx)
        labels.extend(items[i][0] for i in bidx)
        ids.extend(items[i][1][0][0] for i in bidx)
        w = set_mask[..., None].astype(np.float32)
        vec_groups.append(
            (sets * w).sum(axis=1) / np.maximum(w.sum(axis=1), 1e-9)
        )
        if not args.no_sets:
            set_groups.append(sets.astype(np.float16))
            mask_groups.append(set_mask)
        if (g0 // group) % 32 == 31:
            trim_host_heap()

    n = len(keys)
    payload = {
        "version_keys": np.asarray(keys),
        "cliques": np.asarray(cliques),
        "labels": np.asarray(labels, np.int32),
        "ids": np.asarray(ids, np.int64),
        "vecs": np.concatenate(vec_groups, axis=0).astype(np.float32),
        "meta": np.asarray(json.dumps({
            "index_version": INDEX_VERSION,
            "model": config.model.name,
            "zdim": int(config.model.zdim),
            "split": args.split,
            "checkpoint_step": step,
            "embedding_file": ds.filename,
            "chunk_size": L,
            "overlap": float(config.data.overlap_percentage),
            "has_sets": not args.no_sets,
        })),
    }
    if not args.no_sets:
        smax = max(s.shape[1] for s in set_groups)
        C = set_groups[0].shape[-1]
        sets = np.zeros((n, smax, C), np.float16)
        mask = np.zeros((n, smax), bool)
        row = 0
        for s, m in zip(set_groups, mask_groups):
            sets[row : row + s.shape[0], : s.shape[1]] = s
            mask[row : row + s.shape[0], : s.shape[1]] = m
            row += s.shape[0]
        payload["sets"] = sets
        payload["set_mask"] = mask

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **payload)
    print(json.dumps({
        "indexed": n,
        "out": str(out),
        "zdim": int(payload["vecs"].shape[-1]),
        "sets": not args.no_sets,
        "checkpoint_step": step,
    }))
    return 0


def embed_query_audio(config, audio_path: str) -> np.ndarray:
    """Raw audio -> the (T, C) whisper-level embedding sequence the
    config's embedding kind stores per version (so a query enters the head
    exactly like an indexed song's file does).

    Supported kinds: ``x_concat`` (mean-pooled encoder per 30 s chunk —
    reference (encoder, concat), base_dataset.py:99-126) and
    ``hs_wealy_concat`` (WEALY 512-d projection). The decoder-token kinds
    need a transcription pass per chunk; precompute those and pass
    ``--query-embeddings`` instead.
    """
    from wealy_tpu.audio.decode import load_audio
    from wealy_tpu.data.paths import embedding_filename
    from wealy_tpu.models.whisper.extract import chunk_waveform

    kind = embedding_filename(
        config.data.embedding_type, config.data.embedding_format
    ).removesuffix(".npz")
    if kind == "x_concat":
        from wealy_tpu.cli.extract_batched import make_encoder_embed_fn

        embed_fn = make_encoder_embed_fn(config)
    elif kind == "hs_wealy_concat":
        from wealy_tpu.cli.extract_batched import make_wealy_embed_fn

        embed_fn = make_wealy_embed_fn(config)
    else:
        raise ValueError(
            f"query-time embedding is not supported for kind {kind!r} "
            "(decoder kinds need a transcription pass); pass "
            "--query-embeddings with a precomputed (T, C) .npz"
        )
    chunks = chunk_waveform(load_audio(audio_path))
    n = chunks.shape[0]
    pad = -(-n // _QUERY_PAD) * _QUERY_PAD
    if pad != n:
        chunks = np.concatenate(
            [chunks, np.zeros((pad - n, chunks.shape[1]), np.float32)]
        )
    # bf16 device output -> f32 (the store's on-disk convention; ml_dtypes
    # bfloat16 does not round-trip through .npz)
    return np.asarray(embed_fn(chunks))[:n].astype(np.float32)


def cmd_query(args) -> int:
    """Answer audio queries against an index file."""
    import jax

    from wealy_tpu.data.chunking import collate_overlapping
    from wealy_tpu.eval.retrieval import (
        regroup_chunks,
        slabbed_apply,
        song_distance_matrix,
    )
    from wealy_tpu.models.registry import build_model

    from wealy_tpu.cli.main import _load_config

    config = _load_config(args.config)
    with np.load(args.index, allow_pickle=False) as idx:
        meta = json.loads(str(idx["meta"]))
        keys = [str(k) for k in idx["version_keys"]]
        cliques = [str(c) for c in idx["cliques"]]
        vecs = idx["vecs"]
        sets = idx["sets"] if "sets" in idx.files else None
        set_mask = idx["set_mask"] if "sets" in idx.files else None
    if meta.get("index_version") != INDEX_VERSION:
        print(f"[query] unsupported index version {meta.get('index_version')}",
              file=sys.stderr)
        return 2
    if meta["model"] != config.model.name or meta["zdim"] != int(config.model.zdim):
        print(
            f"[query] index was built for model={meta['model']} "
            f"zdim={meta['zdim']}; config says {config.model.name}/"
            f"{config.model.zdim}",
            file=sys.stderr,
        )
        return 2

    model, sig = build_model(config.model.name, zdim=config.model.zdim)
    if sig != "single":
        print("[query] fusion models are not servable", file=sys.stderr)
        return 2
    L = meta["chunk_size"]
    exact = sets is not None and not args.pooled

    queries = []
    if args.query_embeddings:
        for p in args.query_embeddings:
            with np.load(p) as d:
                seq = d["embeddings"] if "embeddings" in d.files else d[d.files[0]]
            queries.append((p, np.asarray(seq, np.float32)))
    for p in args.audio or []:
        queries.append((p, embed_query_audio(config, p)))
    if not queries:
        print("[query] no --audio or --query-embeddings given", file=sys.stderr)
        return 2

    emb_dim = queries[0][1].shape[-1]
    params, _ = _load_head_params(config, model, args.checkpoint, L, emb_dim)
    embed = jax.jit(lambda e, m: model.apply({"params": params}, e, m))

    vn = vecs / np.maximum(np.linalg.norm(vecs, axis=-1, keepdims=True), 1e-9)
    k = min(args.k, len(keys))
    for name, seq in queries:
        batch = collate_overlapping(
            [(0, [(0, seq)])], chunk_size=L, overlap=meta["overlap"]
        )
        z = slabbed_apply(embed, batch.embeddings, batch.masks, slab_size=64)
        qsets, qmask, _, _ = regroup_chunks(z, batch.chunk_info, batch.chunk_valid)
        if exact:
            # exact chunk-set redux scoring, corpus streamed in blocks so the
            # (1, N, s1, s2) redux tensor stays bounded
            blk = max(1, args.block_size)
            d = np.concatenate([
                song_distance_matrix(
                    qsets, qmask,
                    sets[b : b + blk].astype(np.float32),
                    set_mask[b : b + blk],
                    redux=args.redux,
                )[0]
                for b in range(0, len(keys), blk)
            ])
            scores = -d
        else:
            w = qmask[0][:, None].astype(np.float32)
            qv = (qsets[0] * w).sum(axis=0) / np.maximum(w.sum(), 1e-9)
            qv = qv / max(float(np.linalg.norm(qv)), 1e-9)
            scores = vn @ qv
        order = np.argsort(-scores)[:k]
        print(json.dumps({
            "query": name,
            "scoring": ("chunk_set_" + args.redux) if exact else "pooled_cosine",
            "results": [
                {
                    "rank": r + 1,
                    "version_key": keys[i],
                    "clique": cliques[i],
                    "score": round(float(scores[i]), 6),
                }
                for r, i in enumerate(order)
            ],
        }))
    return 0
