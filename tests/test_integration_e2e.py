"""Full-pipeline integration test: synthetic audio cliques -> Whisper
extraction (random weights — the encoder is still a deterministic featurizer,
so acoustically-similar versions land close) -> embedding store -> dataset ->
all-pairs retrieval. MAP must be near-perfect on well-separated cliques.

This is the closest thing to the reference's end-to-end workflow that runs
hermetically on CPU.
"""

import json
import wave

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp


def _write_wav(path, x, sr=16000):
    path.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())


def _melody(freqs, seconds=2.0, sr=16000, detune=1.0, noise=0.0, rng=None):
    """A little tone sequence; versions of a clique share freqs (detuned)."""
    n = int(seconds * sr)
    t = np.arange(n) / sr
    seg = n // len(freqs)
    x = np.zeros(n, np.float32)
    for i, f in enumerate(freqs):
        sl = slice(i * seg, (i + 1) * seg)
        x[sl] = 0.4 * np.sin(2 * np.pi * f * detune * t[sl])
    if noise and rng is not None:
        x += noise * rng.normal(size=n).astype(np.float32)
    return x


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(7)
    cliques = {
        "A": [330.0, 440.0, 550.0],
        "B": [660.0, 880.0, 770.0],
        "C": [220.0, 275.0, 247.5],
    }
    rows = []
    vid = 100
    base = tmp_path / "data" / "LyricCovers" / "audio"
    for label, freqs in cliques.items():
        for detune in (1.0, 1.01, 0.99):  # three versions per clique
            x = _melody(freqs, detune=detune, noise=0.01, rng=rng)
            _write_wav(base / str(vid) / f"{vid}_audio.mp3", x)
            rows.append((1, vid, detune != 1.0, "o", label))
            vid += 1

    lc = tmp_path / "lc"
    lc.mkdir()
    pd.DataFrame(
        rows, columns=["original_id", "id", "is_cover", "song_text_type", "label"]
    ).to_csv(lc / "train_no_dup.csv", index=False)
    for split in ("val", "test"):
        pd.DataFrame(
            [], columns=["original_id", "id", "is_cover", "song_text_type", "label"]
        ).to_csv(lc / f"{split}_no_dup.csv", index=False)

    from wealy_tpu.train.config import Config

    config = Config.from_dict(
        {
            "path": {
                "lyric_covers_data": str(lc),
                "hidden_states": str(tmp_path / "hs"),
                "cache": str(tmp_path / "cache"),
                "data": str(tmp_path / "data"),
            },
            "data": {"dataset_name": "lyric-covers"},
            "model": {"whisper_size": "dev"},
        }
    )
    return config, tmp_path


def test_extract_then_retrieve(project, monkeypatch):
    config, tmp_path = project

    # decode path: fixture files are WAV bytes under .mp3 names
    import wealy_tpu.audio.decode as dec
    import wealy_tpu.data.audio_dataset as AD

    monkeypatch.setattr(
        AD, "load_audio", lambda path, sr=16000: dec._decode_wav(str(path))[0]
    )

    # small Whisper (1 layer, 32-wide) keeps the CPU forward cheap while still
    # running the real mel + encoder stack
    from wealy_tpu.models.whisper import Whisper, WhisperConfig
    import wealy_tpu.cli.extract as EX

    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=1500, n_audio_state=32, n_audio_head=2,
        n_audio_layer=1, n_vocab=64, n_text_ctx=8, n_text_state=32,
        n_text_head=2, n_text_layer=1,
    )

    def small_loader(config, hf_checkpoint=None):
        model = Whisper(cfg, dtype=jnp.float32)
        mel0 = jnp.zeros((1, 80, 3000), jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), mel0, jnp.zeros((1, 2), jnp.int32)
        )["params"]
        return model, params, cfg

    monkeypatch.setattr(EX, "load_whisper_model", small_loader)

    # 1) build metadata + extract x_concat for every version
    from wealy_tpu.cli.extract import extract_split
    from wealy_tpu.data.dataset import EmbeddingDataset, build_clean_dataset

    md, _ = build_clean_dataset(config, check_audio=True)
    assert sum(len(v) for v in md.splits["train"].values()) == 9
    result = extract_split(config, md, "train", kinds=("x_concat",))
    assert len(result["done"]) == 9 and not result["failed"]

    # 2) dataset over the extracted store
    config.data.embedding_type = "encoder"
    config.data.embedding_format = "concat"
    ds = EmbeddingDataset(config, "train", seed=0)
    assert len(ds) == 9

    # 3) all-pairs retrieval on the song embeddings
    from wealy_tpu.eval.wealy import evaluate_song_embeddings

    z, labels, ids = [], [], []
    for v in ds.sampler.versions:
        emb = ds.load_embedding(v)  # (n_chunks=1, 32)
        z.append(emb.mean(axis=0))
        labels.append(ds.sampler.labels[ds.sampler.clique_of[v]])
        ids.append(int(ds.metadata.info[v]["id"]))
    m = evaluate_song_embeddings(np.stack(z), np.array(labels), np.array(ids))
    assert m["n_queries"] == 9
    # same-melody versions must retrieve each other through the real pipeline
    assert m["MAP"] > 0.95, m
    assert m["MR1"] < 1.5, m

    # 4) int8 W8A8 extraction (extract --quant-int8) must preserve retrieval
    # quality: same corpus re-extracted through the quantized encoder ranks
    # identically well
    from wealy_tpu.cli.extract_batched import (
        extract_split_batched,
        make_encoder_embed_fn,
    )
    from wealy_tpu.train.config import Config

    conf8 = Config.from_dict({
        "path": {
            "lyric_covers_data": config.path.lyric_covers_data,
            "hidden_states": str(tmp_path / "hs_int8"),
            "cache": str(tmp_path / "cache_int8"),
            "data": config.path.data,
        },
        "data": {"dataset_name": "lyric-covers",
                 "embedding_type": "encoder", "embedding_format": "concat"},
        "model": {"whisper_size": "dev"},
    })
    r8 = extract_split_batched(
        conf8, md, "train", make_encoder_embed_fn(conf8, quant_int8=True),
        kind="x_concat", batch_size=4,
    )
    assert len(r8["done"]) == 9 and not r8["incomplete"]
    ds8 = EmbeddingDataset(conf8, "train", seed=0)
    z8 = np.stack([
        ds8.load_embedding(v).mean(axis=0) for v in ds8.sampler.versions
    ])
    m8 = evaluate_song_embeddings(z8, np.array(labels), np.array(ids))
    assert m8["MAP"] > 0.95, (m8, m)
    assert abs(m8["MAP"] - m["MAP"]) < 0.02, (m8, m)


def test_training_improves_retrieval(rng):
    """Metric-learning end-to-end: train the projection head on clustered
    embeddings and verify retrieval MAP improves over the untrained head."""
    import jax
    import jax.numpy as jnp

    from wealy_tpu.data.metadata import Metadata
    from wealy_tpu.data.sampler import CliqueSampler
    from wealy_tpu.eval.wealy import evaluate_song_embeddings
    from wealy_tpu.losses import clews_loss
    from wealy_tpu.models.heads import ProjectionHead
    from wealy_tpu.train import create_train_state, make_train_step
    from wealy_tpu.train.loop import MetricsWriter, fit
    from wealy_tpu.train.state import make_optimizer

    # 8 cliques x 4 versions with weak clique structure buried in noise
    info, splits = {}, {"train": {}, "val": {}, "test": {}}
    centers = {}
    T, C = 10, 24
    data = {}
    for ci in range(8):
        clique = f"c{ci}"
        centers[clique] = rng.normal(size=(C,)).astype(np.float32)
        splits["train"][clique] = []
        for v in range(4):
            key = f"{clique}-{v}"
            info[key] = {"id": ci * 100 + v, "clique": clique, "clique_idx": ci,
                         "version_idx": len(info), "filename": key, "version_key": key}
            splits["train"][clique].append(key)
            data[key] = (0.6 * centers[clique][None] +
                         1.0 * rng.normal(size=(T, C)).astype(np.float32))
    md = Metadata("lyric-covers", info, splits)
    sampler = CliqueSampler(md, "train", lambda k: data[k], n_per_class=2, seed=0)

    model = ProjectionHead(zdim=16, hidden=(32,), l2_normalize=True)
    state = create_train_state(
        model, (jnp.zeros((8, T, C)), jnp.ones((8, T), bool)),
        tx=make_optimizer(lr=5e-3, warmup_steps=1, max_steps=400),
    )

    def song_map(params):
        z, labels, ids = [], [], []
        for key in sampler.versions:
            emb = jnp.asarray(data[key][None])
            mask = jnp.ones((1, T), bool)
            z.append(np.asarray(model.apply({"params": params}, emb, mask))[0])
            labels.append(sampler.labels[sampler.clique_of[key]])
            ids.append(info[key]["id"])
        return evaluate_song_embeddings(
            np.stack(z), np.array(labels), np.array(ids)
        )["MAP"]

    map_before = song_map(state.params)
    step = make_train_step(model, clews_loss)
    state, _ = fit(state, step, sampler, batch_size=16, chunk_size=T,
                   max_steps=120, writer=MetricsWriter(log_every=0))
    map_after = song_map(state.params)
    assert map_after > map_before + 0.05, (map_before, map_after)
    assert map_after > 0.8, (map_before, map_after)
