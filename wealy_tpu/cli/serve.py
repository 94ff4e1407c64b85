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

ALL seven ``conf.model.name`` values serve. Fusion families (wealy-clews,
whisper-clews, multimodal-*) index per-song fused embeddings through the
deterministic multimodal collate (the train-val protocol,
collate_functions.py:432-696 first-window selection) and answer RAW-AUDIO
queries by computing BOTH modalities cold: the Whisper side through the
extraction pipeline's own embed fns and the CLEWS side through the owned
CQT -> window-encoder extractor (models/clews_extract.py) — the same
extractor that produced the indexed hs_clews files, so query and corpus
stay in one embedding space. Fusion scoring is cosine on the fused song
vectors (exact chunk-set redux applies to the single-modal family, whose
songs have chunk SETS; fusion models emit one z per song by construction).
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


def _mm_collate_fn(config, sig):
    from wealy_tpu.data.collate_factory import (
        collate_wealy_clews,
        collate_whisper_clews,
    )

    def collate(items):
        if sig == "wealy":
            return collate_wealy_clews(items, wealy_mode="deterministic")
        return collate_whisper_clews(
            items, chunk_size=config.data.chunk_size, use_random_chunks=False
        )

    return collate


def _mm_init_params(model, sig, flat):
    """Init fusion params from one flattened probe batch (cmd_train's
    example construction)."""
    import jax
    import jax.numpy as jnp

    if sig == "wealy":
        example = (
            jnp.asarray(flat["wealy"]),
            jnp.asarray(flat["full_clews"]),
            ~jnp.asarray(flat["clews_mask"]),
        )
    else:
        example = (
            jnp.asarray(flat["whisper_seq"]),
            ~jnp.asarray(flat["whisper_mask"]),
            jnp.asarray(flat["full_clews"]),
            ~jnp.asarray(flat["clews_mask"]),
        )
    return model.init(jax.random.PRNGKey(0), *example)["params"]


def _mm_restore_params(config, checkpoint):
    from wealy_tpu.train.checkpoint import CheckpointManager

    ckpt_dir = checkpoint or config.path.checkpoints
    if ckpt_dir:
        mgr = CheckpointManager(ckpt_dir)
        step = mgr.latest_step()
        if step is not None:
            return mgr.restore()["params"], step
    return None, None


def _index_fusion(args, config, sig) -> int:
    """Fusion-family index: per-song fused embeddings through the
    deterministic multimodal collate (one z per song; cosine retrieval —
    the fusion evaluate semantics)."""
    import jax
    import jax.numpy as jnp

    from wealy_tpu.data.multimodal import WealyClewsDataset, WhisperClewsDataset
    from wealy_tpu.train.multimodal import build_trainable, flatten_multimodal_batch
    from wealy_tpu.utils.hostmem import trim_host_heap

    model, _, model_call = build_trainable(
        config.model.name, zdim=config.model.zdim
    )
    ds_cls = WealyClewsDataset if sig == "wealy" else WhisperClewsDataset
    update = bool(getattr(args, "update", False))
    ds = ds_cls(config, args.split, n_per_class=1, seed=0,
                refresh_cache=update)
    collate = _mm_collate_fn(config, sig)
    n = len(ds)
    if n == 0:
        print(f"[index] split {args.split!r} is empty", file=sys.stderr)
        return 2
    probe = flatten_multimodal_batch(collate([ds[0], ds[min(1, n - 1)]]))
    params, step = _mm_restore_params(config, args.checkpoint)
    if params is None:
        params = _mm_init_params(model, sig, probe)

    versions = list(ds.sampler.versions)
    out = Path(args.out)
    carry_keys, carry_vecs = [], None
    if update and out.exists():
        # incremental: carry forward fused vectors for versions still in
        # the split, embed only the new ones (single-modal --update
        # semantics; a changed checkpoint/model invalidates the carry)
        with np.load(out, allow_pickle=False) as old:
            old_meta = json.loads(str(old["meta"]))
            want = {
                "model": config.model.name, "zdim": int(config.model.zdim),
                "split": args.split, "sig": sig, "fusion": True,
                "checkpoint_step": step,
                "index_version": INDEX_VERSION,
            }
            stale = [k for k, v in want.items() if old_meta.get(k) != v]
            if stale:
                print(
                    f"[index] --update refused: existing index differs on "
                    f"{stale}; rebuild without --update", file=sys.stderr,
                )
                return 2
            in_split = set(versions)
            keep = np.asarray(
                [str(k) in in_split for k in old["version_keys"]], bool
            )
            carry_keys = [
                str(k) for k, m in zip(old["version_keys"], keep) if m
            ]
            carry_vecs = old["vecs"][keep]
        dropped = int((~keep).sum())
        carried = set(carry_keys)
        new_versions = [v for v in versions if v not in carried]
        print(
            f"[index] --update: {len(carry_keys)} carried, {dropped} "
            f"dropped, {len(new_versions)} new", file=sys.stderr,
        )
    else:
        new_versions = versions

    embed = jax.jit(model_call)
    # cap by the actual work: an --update with 2 new songs must not pad a
    # 64-item collated batch (32x wasted FLOPs + a needless jit shape)
    G = max(1, min(args.song_group, max(1, len(new_versions))))
    index_of = {v: i for i, v in enumerate(versions)}
    zs = [carry_vecs] if carry_vecs is not None and len(carry_vecs) else []
    for g0 in range(0, len(new_versions), G):
        gv = new_versions[g0 : g0 + G]
        items = [ds[index_of[v]] for v in gv]
        pad = G - len(items)
        if pad:
            items = items + [items[0]] * pad
        flat = flatten_multimodal_batch(collate(items))
        feed = {
            k: jnp.asarray(v) for k, v in flat.items()
            if k not in ("labels", "ids")
        }
        zs.append(np.asarray(embed(params, feed), np.float32)[: G - pad])
        if (g0 // G) % 32 == 31:
            trim_host_heap()
    versions = carry_keys + new_versions
    meta = {
        "index_version": INDEX_VERSION,
        "model": config.model.name,
        "zdim": int(config.model.zdim),
        "split": args.split,
        "checkpoint_step": step,
        "chunk_size": config.data.chunk_size,
        "overlap": float(config.data.overlap_percentage),
        "has_sets": False,
        "fusion": True,
        "sig": sig,
        "wealy_dim": int(probe["wealy"].shape[-1]) if sig == "wealy" else None,
        "emb_dim": (
            int(probe["whisper_seq"].shape[-1]) if sig != "wealy" else None
        ),
        "clews_shape": [int(s) for s in probe["full_clews"].shape[1:]],
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        out,
        version_keys=np.asarray(versions),
        cliques=np.asarray([ds.sampler.clique_of[v] for v in versions]),
        labels=np.asarray(
            [ds.sampler.labels[ds.sampler.clique_of[v]] for v in versions],
            np.int32,
        ),
        ids=np.asarray(
            [int(ds.metadata.info[v]["id"]) for v in versions], np.int64
        ),
        vecs=np.concatenate(zs, axis=0),
        meta=np.asarray(json.dumps(meta)),
    )
    print(json.dumps({
        "indexed": n, "new": len(new_versions), "out": str(out),
        "zdim": int(config.model.zdim), "sets": False, "fusion": True,
        "checkpoint_step": step,
    }))
    return 0


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
        return _index_fusion(args, config, sig)
    # --update must see source-CSV changes: bypass the processed-metadata
    # cache read (a stale cache would silently hide newly added songs)
    ds = EmbeddingDataset(
        config, args.split, seed=0,
        refresh_cache=getattr(args, "update", False),
    )
    versions = list(ds.sampler.versions)
    if not versions:
        print(f"[index] split {args.split!r} is empty", file=sys.stderr)
        return 2
    emb_dim = ds.load_embedding(versions[0]).shape[-1]
    L = config.data.chunk_size
    params, step = _load_head_params(config, model, args.checkpoint, L, emb_dim)
    embed = jax.jit(lambda e, m: model.apply({"params": params}, e, m))

    out = Path(args.out)
    carry = None
    if getattr(args, "update", False) and out.exists():
        # incremental rebuild: carry forward every already-indexed version
        # still in the split, embed only the new ones. Rows for versions
        # dropped from the split are dropped from the index too.
        with np.load(out, allow_pickle=False) as old:
            old_meta = json.loads(str(old["meta"]))
            want = {
                "model": config.model.name, "zdim": int(config.model.zdim),
                "split": args.split, "emb_dim": int(emb_dim),
                "embedding_file": ds.filename,
                "chunk_size": L,
                "overlap": float(config.data.overlap_percentage),
                "has_sets": not args.no_sets,
                "checkpoint_step": step,
                "index_version": INDEX_VERSION,
            }
            stale = [k for k, v in want.items() if old_meta.get(k) != v]
            if stale:
                # a changed checkpoint (or model/schema) invalidates every
                # carried vector — carrying forward would silently mix
                # embeddings from two heads in one index
                print(
                    f"[index] --update refused: existing index differs on "
                    f"{stale} (old "
                    f"{ {k: old_meta.get(k) for k in stale} }); rebuild "
                    "without --update", file=sys.stderr,
                )
                return 2
            carry = {k: old[k] for k in old.files if k != "meta"}
        in_split = set(versions)
        keep = np.asarray(
            [str(k) in in_split for k in carry["version_keys"]], bool
        )
        carried_keys = {str(k) for k, m in zip(carry["version_keys"], keep) if m}
        for k in list(carry):
            carry[k] = carry[k][keep]
        dropped = int((~keep).sum())
        versions = [v for v in versions if v not in carried_keys]
        print(
            f"[index] --update: {len(carried_keys)} carried, "
            f"{dropped} dropped, {len(versions)} new", file=sys.stderr,
        )

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

    zdim = int(config.model.zdim)
    if carry is not None:
        # carried rows first (stable order for unchanged corpora), then new
        keys = [str(k) for k in carry["version_keys"]] + keys
        cliques = [str(c) for c in carry["cliques"]] + cliques
        labels = carry["labels"].tolist() + labels
        ids = carry["ids"].tolist() + ids
        vec_groups.insert(0, carry["vecs"].reshape(-1, zdim))
        if not args.no_sets:
            set_groups.insert(0, carry["sets"].reshape(-1, *carry["sets"].shape[1:]))
            mask_groups.insert(0, carry["set_mask"])
    n = len(keys)
    payload = {
        "version_keys": np.asarray(keys),
        "cliques": np.asarray(cliques),
        "labels": np.asarray(labels, np.int32),
        "ids": np.asarray(ids, np.int64),
        "vecs": (
            np.concatenate(vec_groups, axis=0).astype(np.float32)
            if vec_groups else np.zeros((0, zdim), np.float32)
        ),
        "meta": np.asarray(json.dumps({
            "index_version": INDEX_VERSION,
            "model": config.model.name,
            "zdim": zdim,
            "split": args.split,
            "checkpoint_step": step,
            "embedding_file": ds.filename,
            "emb_dim": int(emb_dim),
            "chunk_size": L,
            "overlap": float(config.data.overlap_percentage),
            "has_sets": not args.no_sets,
        })),
    }
    if not args.no_sets:
        smax = max((s.shape[1] for s in set_groups), default=0)
        sets = np.zeros((n, smax, zdim), np.float16)
        mask = np.zeros((n, smax), bool)
        row = 0
        for s, m in zip(set_groups, mask_groups):
            sets[row : row + s.shape[0], : s.shape[1]] = s
            mask[row : row + s.shape[0], : s.shape[1]] = m
            row += s.shape[0]
        payload["sets"] = sets
        payload["set_mask"] = mask

    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **payload)
    print(json.dumps({
        "indexed": n,
        "new": len(keys) - (len(carry["version_keys"]) if carry else 0),
        "out": str(out),
        "zdim": int(payload["vecs"].shape[-1]),
        "sets": not args.no_sets,
        "checkpoint_step": step,
    }))
    return 0


def make_query_embed_fn(config):
    """Build once: raw-audio-path -> the (T, C) whisper-level embedding
    sequence the config's embedding kind stores per version (so a query
    enters the head exactly like an indexed song's file does). The Whisper
    model init + jit happens here, NOT per call — the daemon embeds every
    audio query through the same compiled fn.

    Supported kinds: ``x_concat`` (mean-pooled encoder per 30 s chunk —
    reference (encoder, concat), base_dataset.py:99-126),
    ``hs_wealy_concat`` (WEALY 512-d projection), and the decoder-token
    kinds ``hs_last_seq``/``hs_last_seq_en`` (greedy transcription pass
    per chunk, valid decoder positions flattened — the extraction
    pipeline's own decode_fn, so a query matches the indexed files).
    ``hs_last_all`` keeps per-chunk (max_len, D) grids the chunk-set head
    does not consume — pass ``--query-embeddings`` there.
    """
    from wealy_tpu.audio.decode import load_audio
    from wealy_tpu.data.paths import embedding_filename
    from wealy_tpu.models.whisper.extract import chunk_waveform

    kind = embedding_filename(
        config.data.embedding_type, config.data.embedding_format
    ).removesuffix(".npz")
    post = None
    if kind == "x_concat":
        from wealy_tpu.cli.extract_batched import make_encoder_embed_fn

        embed_fn = make_encoder_embed_fn(config)
    elif kind == "hs_wealy_concat":
        from wealy_tpu.cli.extract_batched import make_wealy_embed_fn

        embed_fn = make_wealy_embed_fn(config)
    elif kind in ("hs_last_seq", "hs_last_seq_en"):
        from wealy_tpu.cli.extract_batched import make_decoder_embed_fn
        from wealy_tpu.models.whisper.extract import flatten_decoder_sequence

        embed_fn = make_decoder_embed_fn(
            config, language=0 if kind.endswith("_en") else None
        )
        post = flatten_decoder_sequence
    else:
        raise ValueError(
            f"query-time embedding is not supported for kind {kind!r}; "
            "pass --query-embeddings with a precomputed (T, C) .npz"
        )

    def run(audio_path: str) -> np.ndarray:
        chunks = chunk_waveform(load_audio(audio_path))
        n = chunks.shape[0]
        pad = -(-n // _QUERY_PAD) * _QUERY_PAD
        if pad != n:
            chunks = np.concatenate(
                [chunks, np.zeros((pad - n, chunks.shape[1]), np.float32)]
            )
        # bf16 device output -> f32 (the store's on-disk convention;
        # ml_dtypes bfloat16 does not round-trip through .npz)
        if post is not None:  # decoder kinds: (hidden, lengths) per chunk
            hidden, lengths = embed_fn(chunks)
            return post(
                np.asarray(hidden)[:n], np.asarray(lengths)[:n]
            ).astype(np.float32)
        return np.asarray(embed_fn(chunks))[:n].astype(np.float32)

    return run


def embed_query_audio(config, audio_path: str) -> np.ndarray:
    """One-shot convenience wrapper over :func:`make_query_embed_fn`."""
    return make_query_embed_fn(config)(audio_path)


def make_mm_query_embed_fn(config, meta, wealy_head_checkpoint=None):
    """Raw audio -> the multimodal per-song dict the fusion collates consume
    (data/multimodal.py item format). Both modalities are computed cold:

    - CLEWS side: the owned CQT -> window-encoder extractor
      (models/clews_extract.py, default params/seed) — the SAME extractor
      `extract --kinds hs_clews` runs, so the query lands in the indexed
      hs_clews embedding space. Pass trained CLEWS params upstream by
      re-extracting the corpus; query-side custom weights ride the same
      default-extractor contract.
    - Whisper side: "wealy" sig -> mel -> encoder -> WEALY ProjectionHead
      chunk embeddings at the corpus's wealy_dim (head weights from
      ``wealy_head_checkpoint``; random init otherwise — matching the
      default `extract --kinds hs_wealy_concat`); "two_stream" sig ->
      greedy decode -> flattened hs_last_seq decoder states.
    """
    from wealy_tpu.audio.decode import load_audio
    from wealy_tpu.models.clews_extract import make_clews_extractor
    from wealy_tpu.models.whisper.extract import chunk_waveform
    from wealy_tpu.train.config import Config

    sig = meta["sig"]
    clews = make_clews_extractor()
    if sig == "wealy":
        from wealy_tpu.cli.extract_batched import make_wealy_embed_fn

        cfg_w = Config.from_dict(config.to_dict())
        cfg_w.model.zdim = int(meta["wealy_dim"])
        # the fusion checkpoint dir holds FUSION params, not a WEALY head —
        # never feed it to the head restore
        cfg_w.path.checkpoints = ""
        embed_fn = make_wealy_embed_fn(
            cfg_w, head_checkpoint=wealy_head_checkpoint
        )
        post = None
    else:
        from wealy_tpu.cli.extract_batched import make_decoder_embed_fn
        from wealy_tpu.models.whisper.extract import flatten_decoder_sequence

        embed_fn = make_decoder_embed_fn(config, language=None)
        post = flatten_decoder_sequence

    def run(audio_path: str) -> dict:
        audio = load_audio(audio_path)
        trio = clews(audio)
        chunks = chunk_waveform(audio)
        n = chunks.shape[0]
        pad = -(-n // _QUERY_PAD) * _QUERY_PAD
        if pad != n:
            chunks = np.concatenate(
                [chunks, np.zeros((pad - n, chunks.shape[1]), np.float32)]
            )
        if post is None:
            wealy = np.asarray(embed_fn(chunks))[:n].astype(np.float32)
            whisper = {"wealy": {"embeddings": wealy}}
        else:
            hidden, lengths = embed_fn(chunks)
            seq = post(
                np.asarray(hidden)[:n], np.asarray(lengths)[:n]
            ).astype(np.float32)
            whisper = {"whisper_seq": seq}
        return {
            **whisper,
            "full_clews": trio["hs_clews"],
            "avg_clews": trio["hs_clews_avg"],
            "clews_mask": trio["hs_clews_mask"],
        }

    return run


class QueryEngine:
    """Loaded-once search state: index arrays + jitted head. Shared by the
    one-shot ``query`` command and the persistent ``serve`` daemon."""

    def __init__(self, config, index_path: str, checkpoint: Optional[str],
                 redux: str = "bpwr", block_size: int = 512,
                 resident: bool = True, mesh=None,
                 quantize: Optional[str] = None,
                 wealy_head_checkpoint: Optional[str] = None):
        import jax

        from wealy_tpu.models.registry import build_model

        self.config = config
        self.redux = redux
        self.block_size = max(1, block_size)
        self._wealy_head_checkpoint = wealy_head_checkpoint
        with np.load(index_path, allow_pickle=False) as idx:
            self.meta = json.loads(str(idx["meta"]))
            self.keys = [str(k) for k in idx["version_keys"]]
            self.cliques = [str(c) for c in idx["cliques"]]
            self.vecs = idx["vecs"]
            self.sets = idx["sets"] if "sets" in idx.files else None
            self.set_mask = idx["set_mask"] if "sets" in idx.files else None
        # survives the quantized-resident path freeing the host f16 copy
        self._has_sets = self.sets is not None
        if self.meta.get("index_version") != INDEX_VERSION:
            raise ValueError(
                f"unsupported index version {self.meta.get('index_version')}"
            )
        if (self.meta["model"] != config.model.name
                or self.meta["zdim"] != int(config.model.zdim)):
            raise ValueError(
                f"index was built for model={self.meta['model']} "
                f"zdim={self.meta['zdim']}; config says "
                f"{config.model.name}/{config.model.zdim}"
            )
        model, sig = build_model(config.model.name, zdim=config.model.zdim)
        self.fusion = bool(self.meta.get("fusion"))
        if (sig != "single") != self.fusion:
            raise ValueError(
                f"index sig mismatch: index fusion={self.fusion} but "
                f"model {config.model.name!r} is "
                f"{'fusion' if sig != 'single' else 'single-modal'}"
            )
        if self.fusion:
            from wealy_tpu.train.multimodal import build_trainable

            if quantize:
                raise ValueError(
                    "quantize applies to chunk-set indexes; fusion indexes "
                    "hold one vector per song"
                )

            fmodel, fsig, model_call = build_trainable(
                config.model.name, zdim=config.model.zdim
            )
            if fsig != self.meta["sig"]:
                raise ValueError(
                    f"index built for sig={self.meta['sig']!r}; model "
                    f"resolves to {fsig!r}"
                )
            params, self.checkpoint_step = _mm_restore_params(
                config, checkpoint
            )
            if params is None:
                params = _mm_init_params(
                    fmodel, fsig, self._mm_probe_flat(fsig)
                )
            self._mm_params = params
            self._embed_mm = jax.jit(model_call)
            self._mm_sig = fsig
            self._collate_mm = _mm_collate_fn(config, fsig)
            self._vn = self.vecs / np.maximum(
                np.linalg.norm(self.vecs, axis=-1, keepdims=True), 1e-9
            )
            self._audio_fn = None
            self._resident = False
            self._mesh = None
            self._quantized = False
            return
        self.L = self.meta["chunk_size"]
        self._model = model
        self._params, self.checkpoint_step = _load_head_params(
            config, model, checkpoint, self.L, int(self.meta["emb_dim"])
        )
        self._embed = jax.jit(
            lambda e, m: model.apply({"params": self._params}, e, m)
        )
        self._vn = self.vecs / np.maximum(
            np.linalg.norm(self.vecs, axis=-1, keepdims=True), 1e-9
        )
        self._audio_fn = None  # built on first audio query, then reused
        # device-resident corpus (the TPU-native serving shape): the chunk
        # sets live in device memory (HBM) from init on, so a query never
        # re-uploads the corpus — exact scoring is ONE jitted dispatch that
        # lax.map-streams block-sized slices of the resident arrays, vs the
        # host path's per-block upload of megabytes of sets per query.
        # Residency keeps the index's f16 storage (no precision change vs
        # the host path); scores are computed in f32. quantize="int8"
        # halves HBM again (2x corpus capacity per chip — Discogs-VI scale)
        # via per-(song, chunk) absmax scales, dequantized in-kernel.
        self._resident = bool(resident) and self.sets is not None
        self._mesh = mesh
        if quantize not in (None, "int8"):
            raise ValueError(f"unsupported quantize={quantize!r}")
        if quantize and not self._resident:
            # silently serving the unquantized host path would lie to a
            # capacity/latency operator who explicitly asked for int8
            raise ValueError(
                "quantize=int8 requires the device-resident corpus (drop "
                "--no-resident; pooled-only indexes have no chunk sets)"
            )
        self._quantized = self._resident and quantize == "int8"
        if self._resident:
            import jax.numpy as jnp

            blk = self.block_size
            n, smax, _ = self.sets.shape
            # multi-chip: shard the resident corpus row-wise over the
            # mesh's data axis (each chip holds N/ndev songs in its own
            # HBM — corpus capacity scales with the pod) and score with
            # shard_map: every device lax.maps over its local blocks, the
            # (N,) distance vector comes back data-sharded. Queries are
            # replicated (tiny). Row padding to blk*ndev keeps each
            # shard's block count static.
            ndev = int(mesh.devices.size) if mesh is not None else 1
            pad = (-n) % (blk * ndev)
            if self._quantized:
                # quantize FIRST (blockwise — a Discogs-VI-scale corpus,
                # 1M songs ~10 GB f16, must not materialize a full f32
                # temp), then pad the int8 result: the pad copy costs half
                # the bytes and the padded f16 never exists
                qscale = np.zeros((n + pad, smax), np.float32)
                qsets = np.zeros((n + pad, smax, self.sets.shape[2]), np.int8)
                for b in range(0, n, 65536):
                    blk32 = self.sets[b : b + 65536].astype(np.float32)
                    m = blk32.shape[0]  # destination is padded past n
                    am = np.abs(blk32).max(axis=-1)
                    sc = np.maximum(am, 1e-12) / 127.0
                    qscale[b : b + m] = sc
                    qsets[b : b + m] = np.clip(
                        np.round(blk32 / sc[..., None]), -127, 127
                    ).astype(np.int8)
                sets = qsets
                mask = self.set_mask
                if pad:
                    mask = np.concatenate([mask, np.zeros((pad, smax), bool)])
                scale_arrs = (qscale,)
                if mesh is None:
                    # the host f16 copy serves only the non-quantized host/
                    # rerank fallbacks (the quantized rerank gathers on
                    # device); dropping it halves host residency — 10 GB
                    # at the 1M-song capacity point
                    self.sets = None
            else:
                sets, mask = self.sets, self.set_mask
                if pad:
                    sets = np.concatenate(
                        [sets, np.zeros((pad, *sets.shape[1:]), sets.dtype)]
                    )
                    mask = np.concatenate([mask, np.zeros((pad, smax), bool)])
                scale_arrs = ()
            score = self._make_score_fn(quantized=self._quantized)
            if mesh is not None:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                from wealy_tpu.parallel.mesh import data_sharding

                self._sets_dev = jax.device_put(sets, data_sharding(mesh, 3))
                self._mask_dev = jax.device_put(mask, data_sharding(mesh, 2))
                self._scale_dev = tuple(
                    jax.device_put(s, data_sharding(mesh, 2))
                    for s in scale_arrs
                )
                score = shard_map(
                    score, mesh=mesh,
                    in_specs=(P(), P(), P("data"), P("data"))
                    + (P("data"),) * len(scale_arrs),
                    out_specs=P(None, "data"),
                )
            else:
                self._sets_dev = jax.device_put(jnp.asarray(sets))
                self._mask_dev = jax.device_put(jnp.asarray(mask))
                self._scale_dev = tuple(
                    jax.device_put(jnp.asarray(s)) for s in scale_arrs
                )
            self._score_dev = jax.jit(score)

            # two-stage rescoring: per-query on-device gather of its own
            # shortlist, vmapped so the whole batch is one dispatch
            def _rerank_one(q, qm, idx, sets, mask, *scale):
                from wealy_tpu.eval.retrieval import song_distance_matrix_jnp

                s = jnp.take(sets, idx, axis=0).astype(jnp.float32)
                if scale:
                    s = s * jnp.take(scale[0], idx, axis=0)[..., None]
                m = jnp.take(mask, idx, axis=0)
                return song_distance_matrix_jnp(
                    q[None], qm[None], s, m, redux=self.redux
                )[0]

            self._rerank_dev = jax.jit(jax.vmap(
                _rerank_one,
                in_axes=(0, 0, 0, None, None) + (None,) * len(scale_arrs),
            ))

    def _make_score_fn(self, quantized: bool = False):
        """(Q, s1, C) query sets vs resident (M, s2, C) sets -> (Q, M)
        distances, M a multiple of block_size — every query in the batch
        rides the same flattened (Q*s1, blk*s2) MXU matmul per block. The
        sets/mask come in as jit ARGUMENTS (a closure would inline the
        corpus into the compile request). ``quantized`` adds a (M, s2)
        per-chunk scale argument; int8 sets dequantize in-block."""
        import jax
        import jax.numpy as jnp

        from wealy_tpu.eval.retrieval import song_distance_matrix_jnp

        blk, redux = self.block_size, self.redux

        def score(qsets, qmask, sets, mask, *scale):
            s2, C = sets.shape[1], sets.shape[2]
            sets = sets.reshape(-1, blk, s2, C)
            mask = mask.reshape(-1, blk, s2)
            ops = (sets, mask) + tuple(
                s.reshape(-1, blk, s2) for s in scale
            )

            def one(args):
                sb, mb = args[0].astype(jnp.float32), args[1]
                if quantized:
                    sb = sb * args[2][..., None]
                return song_distance_matrix_jnp(
                    qsets, qmask, sb, mb, redux=redux,
                )  # (Q, blk)

            d = jax.lax.map(one, ops)  # (nb, Q, blk)
            return jnp.moveaxis(d, 0, 1).reshape(qsets.shape[0], -1)

        return score

    def _mm_probe_flat(self, sig):
        """Synthetic flat probe (meta-recorded dims) for fusion param init
        when no checkpoint exists."""
        Lc, Cc = self.meta["clews_shape"]
        mask = np.ones((2, Lc), bool)
        mask[:, :1] = False  # one valid window: masked means stay finite
        flat = {
            "full_clews": np.zeros((2, Lc, Cc), np.float32),
            "avg_clews": np.zeros((2, Cc), np.float32),
            "clews_mask": mask,
        }
        if sig == "wealy":
            flat["wealy"] = np.zeros((2, self.meta["wealy_dim"]), np.float32)
        else:
            flat["whisper_seq"] = np.zeros(
                (2, self.meta["chunk_size"], self.meta["emb_dim"]), np.float32
            )
            wm = np.ones((2, self.meta["chunk_size"]), bool)
            wm[:, :1] = False
            flat["whisper_mask"] = wm
        return flat

    def embed_audio(self, audio_path: str):
        """Raw audio -> query payload through a cached compiled embed fn
        (first call builds + jits the Whisper/CLEWS paths, later calls reuse
        them). Single-modal: a (T, C) sequence. Fusion: the multimodal
        per-song dict."""
        if self._audio_fn is None:
            self._audio_fn = (
                make_mm_query_embed_fn(
                    self.config, self.meta,
                    wealy_head_checkpoint=self._wealy_head_checkpoint,
                )
                if self.fusion
                else make_query_embed_fn(self.config)
            )
        return self._audio_fn(audio_path)

    def search(self, seq: np.ndarray, k: int = 10, pooled: bool = False,
               rerank: int = 0):
        """(T, C) whisper-level sequence -> ranked results payload.

        ``rerank > 0`` switches exact scoring to two-stage retrieval: a
        pooled-cosine pass over the whole corpus shortlists the top
        ``rerank`` songs, and only those pay the chunk-set redux re-score.
        Exact-scan cost is O(corpus * s1 * s2); two-stage is O(corpus)
        cosine + O(rerank * s1 * s2) redux — the production shape for
        large corpora. ``rerank >= corpus`` degenerates to the full scan.
        """
        return self.search_many([seq], k=k, pooled=pooled, rerank=rerank)[0]

    def search_many(self, seqs, k: int = 10, pooled: bool = False,
                    rerank: int = 0):
        """Batch of (T, C) sequences -> one ranked-results payload per
        query. The whole batch scores in ONE device dispatch — the Q query
        chunk sets join the same flattened (Q*s1, blk*s2) MXU matmul the
        single-query path uses, so per-dispatch overhead (and tunnel RTT)
        amortizes across the batch. Q is padded to a multiple of 4 with
        mask-excluded dummy queries to bound jit-shape churn."""
        import jax.numpy as jnp

        from wealy_tpu.data.chunking import collate_overlapping
        from wealy_tpu.eval.retrieval import (
            regroup_chunks,
            slabbed_apply,
            song_distance_matrix,
        )

        if self.fusion:
            if rerank:
                # chunk-set-only option: erroring beats silently ignoring
                # (the fusion payload carries no 'rerank' field to notice)
                raise ValueError(
                    "rerank applies to chunk-set indexes; fusion scoring is "
                    "already one cosine pass over fused song vectors"
                )
            return self._search_many_mm(seqs, k=k)
        exact = self._has_sets and not pooled
        Q = len(seqs)
        if Q == 0:
            return []
        batch = collate_overlapping(
            [(i, [(i, np.asarray(s, np.float32))]) for i, s in enumerate(seqs)],
            chunk_size=self.L, overlap=self.meta["overlap"],
        )
        z = slabbed_apply(self._embed, batch.embeddings, batch.masks,
                          slab_size=64)
        qsets, qmask, bidx, _ = regroup_chunks(
            z, batch.chunk_info, batch.chunk_valid
        )
        order_in = np.argsort(bidx)  # restore input order explicitly
        qsets, qmask = qsets[order_in], qmask[order_in]
        # pad the query chunk count so a long-running daemon compiles a
        # handful of (Q, s1) shapes instead of one per distinct song length
        # (padding rows/queries are mask-excluded everywhere downstream)
        s1 = qsets.shape[1]
        s1p = -(-s1 // _QUERY_PAD) * _QUERY_PAD
        # Q=1 (the common single-query case) stays unpadded — it should not
        # pay 4x redux work; batches pad to multiples of 4
        Qp = 1 if Q == 1 else -(-Q // 4) * 4
        if s1p != s1 or Qp != Q:
            qsets = np.pad(qsets, ((0, Qp - Q), (0, s1p - s1), (0, 0)))
            qmask = np.pad(qmask, ((0, Qp - Q), (0, s1p - s1)))
        # pooled query vectors: the cosine ranking itself in pooled mode,
        # the stage-1 shortlist signal in two-stage exact mode
        w = qmask[..., None].astype(np.float32)
        qv = (qsets * w).sum(axis=1) / np.maximum(w.sum(axis=1), 1e-9)
        qv = qv / np.maximum(
            np.linalg.norm(qv, axis=-1, keepdims=True), 1e-9
        )
        cos = qv @ self._vn.T  # (Qp, n)
        n = len(self.keys)
        if exact:
            two_stage = 0 < rerank < n
            blk = self.block_size
            q32 = qsets.astype(np.float32)
            if two_stage:
                cand = np.argpartition(-cos, rerank - 1, axis=1)[:, :rerank]
                cand.sort(axis=1)  # ascending: contiguous gather reads
                if self._resident and self._mesh is None:
                    # per-query on-device gather + rescore, one dispatch
                    d = np.asarray(self._rerank_dev(
                        q32, qmask, jnp.asarray(cand),
                        self._sets_dev, self._mask_dev, *self._scale_dev,
                    ))
                else:
                    # sharded corpus (a device gather would collective per
                    # query) or host mode: upload each tiny shortlist
                    d = np.stack([
                        song_distance_matrix(
                            q32[i : i + 1], qmask[i : i + 1],
                            self.sets[cand[i]].astype(np.float32),
                            self.set_mask[cand[i]],
                            redux=self.redux,
                        )[0]
                        for i in range(Q)
                    ] + [np.zeros(cand.shape[1], np.float32)] * (Qp - Q))
            elif self._resident:
                # exact full scan over the resident corpus: one dispatch,
                # lax.map streams block slices device-side
                d = np.asarray(self._score_dev(
                    q32, qmask, self._sets_dev, self._mask_dev,
                    *self._scale_dev,
                ))[:, :n]
            else:
                # host fallback: corpus streamed in blocks so the
                # (Q, blk, s1, s2) redux tensor stays bounded
                d = np.concatenate([
                    song_distance_matrix(
                        q32, qmask,
                        self.sets[b : b + blk].astype(np.float32),
                        self.set_mask[b : b + blk],
                        redux=self.redux,
                    )
                    for b in range(0, n, blk)
                ], axis=1)
        else:
            two_stage = False
        outs = []
        for i in range(Q):
            if exact:
                cand_i = cand[i] if two_stage else np.arange(n)
                cand_scores = -d[i]
                top = np.argsort(-cand_scores)[: min(k, len(cand_i))]
                order = cand_i[top]
                scores = np.empty(n, np.float32)
                scores[cand_i] = cand_scores
            else:
                scores = cos[i]
                order = np.argsort(-scores)[: min(k, n)]
            out = {
                "scoring": (
                    "chunk_set_" + self.redux) if exact else "pooled_cosine",
                "results": [
                    {
                        "rank": r + 1,
                        "version_key": self.keys[j],
                        "clique": self.cliques[j],
                        "score": round(float(scores[j]), 6),
                    }
                    for r, j in enumerate(order)
                ],
            }
            if two_stage:
                out["rerank"] = int(rerank)
            outs.append(out)
        return outs


    def _search_many_mm(self, mms, k: int = 10):
        """Fusion search: multimodal query dicts (see
        :func:`make_mm_query_embed_fn`) -> deterministic collate -> fused z
        -> cosine against the indexed song vectors. One device dispatch per
        batch; Q padded to a multiple of 4 like the single-modal path."""
        import jax.numpy as jnp

        from wealy_tpu.train.multimodal import flatten_multimodal_batch

        Q = len(mms)
        if Q == 0:
            return []
        Qp = 1 if Q == 1 else -(-Q // 4) * 4
        items = [(i, [(i, mm)]) for i, mm in enumerate(mms)]
        items = items + [items[0]] * (Qp - Q)
        flat = flatten_multimodal_batch(self._collate_mm(items))
        feed = {
            key: jnp.asarray(v) for key, v in flat.items()
            if key not in ("labels", "ids")
        }
        z = np.asarray(self._embed_mm(self._mm_params, feed), np.float32)[:Q]
        zn = z / np.maximum(np.linalg.norm(z, axis=-1, keepdims=True), 1e-9)
        cos = zn @ self._vn.T  # (Q, n)
        outs = []
        for i in range(Q):
            order = np.argsort(-cos[i])[: min(k, len(self.keys))]
            outs.append({
                "scoring": "fusion_cosine",
                "results": [
                    {
                        "rank": r + 1,
                        "version_key": self.keys[j],
                        "clique": self.cliques[j],
                        "score": round(float(cos[i, j]), 6),
                    }
                    for r, j in enumerate(order)
                ],
            })
        return outs


def _serving_mesh(args):
    """Host-local data mesh for ``--shard`` (None on a single device)."""
    if not getattr(args, "shard", False):
        return None
    import jax

    local = jax.local_devices()
    if len(local) < 2:
        return None
    from wealy_tpu.parallel.mesh import make_mesh

    return make_mesh(devices=local)


def _load_seq(path: str) -> np.ndarray:
    with np.load(path) as d:
        seq = d["embeddings"] if "embeddings" in d.files else d[d.files[0]]
    return np.asarray(seq, np.float32)


def cmd_query(args) -> int:
    """Answer audio queries against an index file (one-shot CLI)."""
    from wealy_tpu.cli.main import _load_config

    config = _load_config(args.config)
    if not (args.audio or args.query_embeddings):
        print("[query] no --audio or --query-embeddings given", file=sys.stderr)
        return 2
    try:
        engine = QueryEngine(
            config, args.index, args.checkpoint,
            redux=args.redux, block_size=args.block_size,
            resident=not args.no_resident, mesh=_serving_mesh(args),
            quantize=args.quantize,
            wealy_head_checkpoint=getattr(args, 'wealy_head_checkpoint', None),
        )
        if engine.fusion and args.query_embeddings:
            raise ValueError(
                "fusion indexes answer raw-audio queries only (a query "
                "needs BOTH modalities computed cold); pass --audio"
            )
    except ValueError as e:
        print(f"[query] {e}", file=sys.stderr)
        return 2
    queries = [(p, _load_seq(p)) for p in args.query_embeddings or []]
    # engine.embed_audio caches one compiled embed fn across all files
    queries.extend((p, engine.embed_audio(p)) for p in args.audio or [])
    # all queries score in one batched device dispatch
    outs = engine.search_many(
        [s for _, s in queries], k=args.k, pooled=args.pooled,
        rerank=args.rerank,
    )
    for (name, _), out in zip(queries, outs):
        print(json.dumps({"query": name, **out}))
    return 0


class MicroBatcher:
    """Bounded-delay query collector: concurrent in-flight queries coalesce
    into ONE batched ``search_many`` device dispatch.

    Independent HTTP clients at Q=1 each used to serialize on the daemon's
    search lock — the measured 7x batched-dispatch win (BENCH_NOTES
    ``bench_serve`` Q=16) was reachable only by a client that composed its
    own batch. This collector composes it daemon-side: the first arriving
    query opens a ``window_s`` collection window (new arrivals wake the
    collector; ``max_batch`` caps a burst), then everything pending goes to
    the device as one batch. Queries with different (k, pooled, rerank)
    options are grouped and dispatched back-to-back within the batch.

    The cost is the window itself: an isolated query waits up to
    ``window_s`` before dispatch (the idle-latency floor measured in
    ``bench_serve_concurrent``). ``window_s=0`` disables collection
    (immediate per-query dispatch under the same serialization).
    """

    def __init__(self, dispatch, window_s: float = 0.010, max_batch: int = 32):
        import threading

        self._dispatch = dispatch  # (seqs, opts) -> list[result]
        self.window_s = float(window_s)
        self.max_batch = int(max_batch)
        self._cv = threading.Condition()
        self._pending: list = []
        self._closed = False
        # observability: dispatch count + query count -> mean batch size
        # (surfaced in /healthz as "batch_stats")
        self.n_dispatches = 0
        self.n_queries = 0
        self._thread = threading.Thread(
            target=self._run, name="microbatch-collector", daemon=True
        )
        self._thread.start()

    class _Item:
        __slots__ = ("seq", "opts", "done", "result", "error")

        def __init__(self, seq, opts):
            import threading

            self.seq = seq
            self.opts = opts
            self.done = threading.Event()
            self.result = None
            self.error = None

    def submit_many(self, seqs, opts) -> list:
        """Enqueue ``seqs`` (one logical client request) and block until all
        are answered; re-raises the dispatch error if the batch failed."""
        items = [self._Item(s, opts) for s in seqs]
        with self._cv:
            if self._closed:
                raise RuntimeError("batcher closed")
            self._pending.extend(items)
            self._cv.notify_all()
        outs = []
        for it in items:
            it.done.wait()
            if it.error is not None:
                raise it.error
            outs.append(it.result)
        return outs

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()

    def _run(self) -> None:
        import time as _time

        while True:
            with self._cv:
                while not self._pending and not self._closed:
                    self._cv.wait()
                if self._closed and not self._pending:
                    return
                deadline = _time.monotonic() + self.window_s
                while len(self._pending) < self.max_batch and not self._closed:
                    remaining = deadline - _time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(remaining)
                batch = self._pending[: self.max_batch]
                del self._pending[: len(batch)]
            # dispatch OUTSIDE the condition so new arrivals keep queueing
            groups: dict = {}
            for it in batch:
                groups.setdefault(it.opts, []).append(it)
            for opts, items in groups.items():
                self.n_dispatches += 1
                self.n_queries += len(items)
                try:
                    outs = self._dispatch([it.seq for it in items], opts)
                    for it, o in zip(items, outs):
                        it.result = o
                except Exception as e:  # noqa: BLE001 — daemon must not die
                    for it in items:
                        it.error = e
                finally:
                    for it in items:
                        it.done.set()


def cmd_serve(args) -> int:
    """Persistent local search daemon: the model, head, and index load ONCE
    and every query reuses the compiled path (a cold `query` invocation pays
    model init + jit per call; the daemon pays it once).

    JSON-over-HTTP on localhost (stdlib http.server — no web framework in
    the image, and serving infra should carry zero extra deps):

    - ``GET /healthz`` -> {"ok": true, "indexed": N, ...}
    - ``POST /query`` body {"audio_path": ...} or {"embeddings": [[...]]}
      (+ optional "k", "pooled", "rerank") -> the same payload `query`
      prints. A {"batch": [entry, ...]} body scores every entry in one
      batched device dispatch and answers {"batch": [payload, ...]}.
    - ``POST /reload`` -> re-read the index file and swap the corpus in
      under the search lock (pair with ``index --update`` for live corpus
      growth without a daemon restart; the compiled audio-embed fn carries
      over, and queries in flight finish against the old corpus).

    Concurrent clients are micro-batched: queries arriving within
    ``--batch-window-ms`` (default 10 ms) coalesce into ONE batched
    ``search_many`` device dispatch instead of serializing one-by-one on
    the search lock (see :class:`MicroBatcher`).
    """
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from wealy_tpu.cli.main import _load_config

    config = _load_config(args.config)

    def build_engine() -> QueryEngine:
        return QueryEngine(
            config, args.index, args.checkpoint,
            redux=args.redux, block_size=args.block_size,
            resident=not args.no_resident, mesh=_serving_mesh(args),
            quantize=args.quantize,
            wealy_head_checkpoint=getattr(args, 'wealy_head_checkpoint', None),
        )

    try:
        engine = build_engine()
    except ValueError as e:
        print(f"[serve] {e}", file=sys.stderr)
        return 2

    state = {"engine": engine}

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *a):  # quiet: one line per request
            print(f"[serve] {fmt % a}", file=sys.stderr)

        def do_GET(self):
            if self.path != "/healthz":
                return self._send(404, {"error": "unknown path"})
            eng = state["engine"]
            self._send(200, {
                "ok": True,
                "indexed": len(eng.keys),
                "model": eng.meta["model"],
                "split": eng.meta["split"],
                "checkpoint_step": eng.checkpoint_step,
                "exact_sets": eng._has_sets,
                "batch_stats": {
                    "dispatches": batcher.n_dispatches,
                    "queries": batcher.n_queries,
                },
            })

        def do_POST(self):
            if self.path == "/reload":
                return self._reload()
            if self.path != "/query":
                return self._send(404, {"error": "unknown path"})
            try:
                return self._answer_query()
            except Exception as e:  # noqa: BLE001 — daemon must not die
                return self._send(400, {"error": str(e)})

        def _reload(self):
            # the whole swap runs under the search lock: the old corpus's
            # device buffers are RELEASED before the new engine device_puts
            # its own — at the advertised capacity limit (a >half-HBM
            # resident corpus) holding both copies would OOM the chip.
            # Queries block for the duration; /healthz stays responsive.
            with search_lock:
                old = state["engine"]
                old_n = len(old.keys)
                old_fn = old._audio_fn
                old_meta = dict(old.meta)
                old_step = old.checkpoint_step
                for a in ("_sets_dev", "_mask_dev", "_scale_dev",
                          "_score_dev", "_rerank_dev"):
                    if hasattr(old, a):
                        setattr(old, a, None)
                del old
                try:
                    new = build_engine()
                except Exception as e:  # noqa: BLE001
                    # the old device state is gone: rebuild from the same
                    # index path so the daemon keeps serving
                    try:
                        state["engine"] = build_engine()
                        state["engine"]._audio_fn = old_fn
                        return self._send(400, {
                            "error": f"reload failed ({e}); previous index "
                            "re-loaded",
                        })
                    except Exception as e2:  # noqa: BLE001
                        return self._send(500, {
                            "error": f"reload failed ({e}) and the previous "
                            f"index could not be re-loaded ({e2}); daemon "
                            "needs a restart",
                        })
                # the compiled raw-audio embed fn depends on these meta
                # fields AND the head checkpoint; carry it (skip the re-jit)
                # only when none changed
                same_embed = new.checkpoint_step == old_step and all(
                    old_meta.get(k) == new.meta.get(k)
                    for k in ("fusion", "sig", "wealy_dim", "emb_dim",
                              "chunk_size")
                )
                if same_embed:
                    new._audio_fn = old_fn
                state["engine"] = new
            self._send(200, {
                "ok": True, "indexed": len(new.keys), "was": old_n,
                "checkpoint_step": new.checkpoint_step,
            })

        def _answer_query(self):
            engine = state["engine"]
            try:
                req = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"] or 0))
                )
                entries = req.get("batch")
                single = entries is None
                if single:
                    entries = [req]
                if not entries:
                    raise ValueError("'batch' must be a non-empty list")
                seqs = []
                for e in entries:
                    if "embeddings" in e:
                        if engine.fusion:
                            raise ValueError(
                                "fusion indexes answer audio_path queries "
                                "only (both modalities are computed cold)"
                            )
                        seq = np.asarray(e["embeddings"], np.float32)
                        if seq.ndim != 2:
                            raise ValueError("embeddings must be (T, C)")
                    elif "audio_path" in e:
                        seq = engine.embed_audio(e["audio_path"])
                    else:
                        raise ValueError("need 'audio_path' or 'embeddings'")
                    seqs.append(seq)
                # score through the micro-batcher: concurrent clients'
                # queries coalesce into one device dispatch; the dispatch
                # itself serializes on search_lock (one device, one jit
                # state), audio embedding above runs outside it
                opts = (
                    int(req.get("k", args.k)),
                    bool(req.get("pooled", args.pooled)),
                    int(req.get("rerank", args.rerank)),
                )
                outs = batcher.submit_many(seqs, opts)
                out = outs[0] if single else {"batch": outs}
            except Exception as e:  # noqa: BLE001 — daemon must not die
                return self._send(400, {"error": str(e)})
            self._send(200, out)

    if getattr(args, "warmup", False):
        # pre-compile the full audio-query path (decode -> embed -> score)
        # with one synthetic clip so the FIRST real request doesn't pay the
        # model jit (seconds to minutes through a remote compile service)
        import tempfile
        import time
        import wave as _wave

        t0 = time.perf_counter()
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            with _wave.open(f.name, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(b"\x00\x00" * (16000 * 30))
            engine.search_many([engine.embed_audio(f.name)], k=1)
        print(json.dumps({
            "warmup_s": round(time.perf_counter() - t0, 1)
        }), flush=True)

    # threaded accept loop so /healthz answers while a long query runs;
    # searches themselves serialize on one lock (one device, one jit state)
    search_lock = threading.Lock()

    def _batched_dispatch(seqs, opts):
        k, pooled, rerank = opts
        with search_lock:
            return state["engine"].search_many(
                seqs, k=k, pooled=pooled, rerank=rerank
            )

    batcher = MicroBatcher(
        _batched_dispatch,
        window_s=max(0.0, getattr(args, "batch_window_ms", 10.0) / 1000.0),
        max_batch=max(1, getattr(args, "max_batch", 32)),
    )
    srv = ThreadingHTTPServer((args.host, args.port), Handler)
    print(json.dumps({
        "serving": f"http://{args.host}:{srv.server_address[1]}",
        "indexed": len(engine.keys),
    }), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
    return 0
