"""Serving-surface tests: `index` builds a self-contained retrieval index,
`query` answers audio / precomputed-embedding queries against it with
self-retrieval at rank 1 (the serving product the reference's pipeline
implies but never ships — its flow stops at corpus-internal evaluate)."""

import json
import wave

import numpy as np
import pandas as pd
import pytest

from wealy_tpu.cli.main import main


def _write_csvs(lc, rows):
    lc.mkdir(parents=True, exist_ok=True)
    for split, data in rows.items():
        pd.DataFrame(
            data,
            columns=["original_id", "id", "is_cover", "song_text_type", "label"],
        ).to_csv(lc / f"{split}_no_dup.csv", index=False)


ROWS = {
    "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A")],
    "val": [(3, 300, False, "o", "C"), (3, 301, True, "c", "C")],
    "test": [(4, 400, False, "o", "D"), (4, 401, True, "c", "D"),
             (5, 500, False, "o", "E"), (5, 501, True, "c", "E")],
}


@pytest.fixture
def serve_project(tmp_path):
    """hs_last_seq store + config (test_cli.py::project shape, test-heavy)."""
    from wealy_tpu.data.embedding_store import EmbeddingStore

    _write_csvs(tmp_path / "lc", ROWS)
    store = EmbeddingStore(tmp_path / "hs", "lyric-covers")
    rng = np.random.default_rng(0)
    centers = {}
    for data in ROWS.values():
        for _, vid, _, _, label in data:
            if label not in centers:
                centers[label] = rng.normal(size=(24,)).astype(np.float32)
            T = int(rng.integers(12, 20))
            emb = centers[label][None] + 0.1 * rng.normal(size=(T, 24)).astype(
                np.float32
            )
            store.save(str(vid), "hs_last_seq.npz", embeddings=emb)
    conf = {
        "path": {
            "lyric_covers_data": str(tmp_path / "lc"),
            "hidden_states": str(tmp_path / "hs"),
            "cache": str(tmp_path / "cache"),
        },
        "data": {
            "dataset_name": "lyric-covers",
            "embedding_type": "last_hidden_states",
            "embedding_format": "concat",
            "chunk_size": 8,
        },
        "model": {"name": "whisper", "zdim": 16},
    }
    cpath = tmp_path / "conf.json"
    cpath.write_text(json.dumps(conf))
    return tmp_path, cpath, store


def test_index_and_query_self_retrieval(serve_project, capsys):
    tmp_path, cpath, store = serve_project
    idx = tmp_path / "serve" / "test.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["indexed"] == 4 and out["sets"] is True

    with np.load(idx) as d:
        meta = json.loads(str(d["meta"]))
        assert set(d.files) >= {"version_keys", "cliques", "vecs", "sets",
                                "set_mask", "labels", "ids"}
        assert d["vecs"].shape == (4, 16)
        assert meta["model"] == "whisper" and meta["has_sets"] is True

    # self-retrieval: query with version 400's own stored sequence, both
    # scoring modes must put 400 at rank 1
    qpath = store.path("400", "hs_last_seq.npz")
    for extra in ([], ["--pooled"]):
        assert main(["query", "--config", str(cpath), "--index", str(idx),
                     "--query-embeddings", str(qpath), *extra]) == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["results"][0]["version_key"] == "400", res
        assert res["results"][0]["rank"] == 1
        assert res["scoring"] == ("pooled_cosine" if extra else "chunk_set_bpwr")
        # its cover (same clique D) should beat the unrelated clique E songs
        assert res["results"][1]["version_key"] == "401", res


def test_two_stage_rerank(serve_project, capsys):
    """--rerank R: pooled-cosine shortlist + exact redux on the shortlist
    only. R >= corpus degenerates to the full exact scan (identical
    payload); small R still self-retrieves at rank 1."""
    from wealy_tpu.cli.serve import QueryEngine
    from wealy_tpu.train.config import Config

    tmp_path, cpath, store = serve_project
    idx = tmp_path / "serve" / "test.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx)]) == 0
    capsys.readouterr()
    config = Config.from_dict(json.loads(cpath.read_text()))
    engine = QueryEngine(config, str(idx), None)
    with np.load(store.path("400", "hs_last_seq.npz")) as d:
        seq = d["embeddings"]

    full = engine.search(seq, k=4)
    degenerate = engine.search(seq, k=4, rerank=99)  # >= corpus -> full scan
    assert degenerate == full and "rerank" not in full

    two = engine.search(seq, k=4, rerank=2)
    assert two["rerank"] == 2 and two["scoring"] == "chunk_set_bpwr"
    assert len(two["results"]) == 2  # only shortlisted songs are returned
    assert two["results"][0]["version_key"] == "400"
    # the exact score of the shortlist winner matches the full scan's
    assert two["results"][0]["score"] == full["results"][0]["score"]

    # CLI flag reaches the engine
    assert main(["query", "--config", str(cpath), "--index", str(idx),
                 "--query-embeddings", str(store.path("400", "hs_last_seq.npz")),
                 "--rerank", "2"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rerank"] == 2
    assert res["results"][0]["version_key"] == "400"


def test_index_update_incremental(serve_project, capsys):
    """`index --update` embeds only versions missing from the existing
    index, carries the rest forward byte-identically, drops versions no
    longer in the split, and refuses when the head changed."""
    tmp_path, cpath, store = serve_project
    idx = tmp_path / "serve" / "test.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx)]) == 0
    capsys.readouterr()
    with np.load(idx) as d:
        before = {k: d[k].copy() for k in d.files if k != "meta"}

    # grow the split by one clique (6 versions now) and update
    rows = dict(ROWS)
    rows["test"] = ROWS["test"] + [(6, 600, False, "o", "F"),
                                   (6, 601, True, "c", "F")]
    _write_csvs(tmp_path / "lc", rows)
    rng = np.random.default_rng(7)
    for vid in ("600", "601"):
        store.save(vid, "hs_last_seq.npz",
                   embeddings=rng.normal(size=(14, 24)).astype(np.float32))
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx), "--update"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["indexed"] == 6 and out["new"] == 2
    with np.load(idx) as d:
        keys = [str(k) for k in d["version_keys"]]
        assert set(keys) == {"400", "401", "500", "501", "600", "601"}
        # carried rows are byte-identical to the original build
        for old_key, old_vec in zip(before["version_keys"], before["vecs"]):
            np.testing.assert_array_equal(
                d["vecs"][keys.index(str(old_key))], old_vec
            )

    # shrink the split (clique E gone) — update drops its rows, embeds none
    rows["test"] = [r for r in rows["test"] if r[0] != 5]
    _write_csvs(tmp_path / "lc", rows)
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx), "--update"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["indexed"] == 4 and out["new"] == 0
    with np.load(idx) as d:
        assert "500" not in {str(k) for k in d["version_keys"]}

    # a different head (zdim) must refuse --update rather than mix vectors
    conf = json.loads(cpath.read_text())
    conf["model"]["zdim"] = 32
    c2 = tmp_path / "conf2.json"
    c2.write_text(json.dumps(conf))
    assert main(["index", "--config", str(c2), "--split", "test",
                 "--out", str(idx), "--update"]) == 2
    capsys.readouterr()


def test_resident_matches_host_scoring(serve_project, capsys):
    """The device-resident scorer (corpus uploaded once, one lax.map
    dispatch) returns the same ranking and scores as the host per-block
    upload path, full-scan and two-stage alike."""
    from wealy_tpu.cli.serve import QueryEngine
    from wealy_tpu.train.config import Config

    tmp_path, cpath, store = serve_project
    idx = tmp_path / "serve" / "test.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx)]) == 0
    capsys.readouterr()
    config = Config.from_dict(json.loads(cpath.read_text()))
    # block_size 2 < corpus 4: exercises the block/pad seams of both paths
    res = QueryEngine(config, str(idx), None, block_size=2)
    host = QueryEngine(config, str(idx), None, block_size=2, resident=False)
    assert res._resident and not host._resident
    with np.load(store.path("501", "hs_last_seq.npz")) as d:
        seq = d["embeddings"]
    for kw in ({}, {"rerank": 3}, {"pooled": True}):
        a, b = res.search(seq, k=4, **kw), host.search(seq, k=4, **kw)
        assert [r["version_key"] for r in a["results"]] == [
            r["version_key"] for r in b["results"]
        ], (kw, a, b)
        np.testing.assert_allclose(
            [r["score"] for r in a["results"]],
            [r["score"] for r in b["results"]], atol=1e-4,
        )


def test_sharded_resident_corpus(serve_project, capsys):
    """mesh= shards the resident corpus row-wise over the 8-device virtual
    mesh (shard_map scoring, data-sharded distances); results must match
    the single-device engine exactly — full scan, two-stage (routed through
    the host shortlist path), and pooled."""
    import jax

    from wealy_tpu.cli.serve import QueryEngine
    from wealy_tpu.parallel.mesh import make_mesh
    from wealy_tpu.train.config import Config

    tmp_path, cpath, store = serve_project
    idx = tmp_path / "serve" / "test.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx)]) == 0
    capsys.readouterr()
    config = Config.from_dict(json.loads(cpath.read_text()))
    mesh = make_mesh(devices=jax.devices())
    assert mesh.devices.size == 8
    # corpus 4 < blk*ndev = 16: every shard is padding except the first —
    # the hardest row-padding seam
    sharded = QueryEngine(config, str(idx), None, block_size=2, mesh=mesh)
    single = QueryEngine(config, str(idx), None, block_size=2)
    with np.load(store.path("500", "hs_last_seq.npz")) as d:
        seq = d["embeddings"]
    for kw in ({}, {"rerank": 3}, {"pooled": True}):
        a, b = sharded.search(seq, k=4, **kw), single.search(seq, k=4, **kw)
        assert [r["version_key"] for r in a["results"]] == [
            r["version_key"] for r in b["results"]
        ], (kw, a, b)
        np.testing.assert_allclose(
            [r["score"] for r in a["results"]],
            [r["score"] for r in b["results"]], atol=1e-4,
        )


def test_search_many_matches_single(serve_project, capsys):
    """One batched dispatch over Q=3 queries (padded to 4) returns the same
    payloads as three single-query searches, in every scoring mode."""
    from wealy_tpu.cli.serve import QueryEngine
    from wealy_tpu.train.config import Config

    tmp_path, cpath, store = serve_project
    idx = tmp_path / "serve" / "test.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx)]) == 0
    capsys.readouterr()
    config = Config.from_dict(json.loads(cpath.read_text()))
    engine = QueryEngine(config, str(idx), None, block_size=2)
    seqs = []
    for vid in ("400", "501", "401"):
        with np.load(store.path(vid, "hs_last_seq.npz")) as d:
            seqs.append(d["embeddings"])
    for kw in ({}, {"rerank": 2}, {"pooled": True}):
        many = engine.search_many(seqs, k=4, **kw)
        assert len(many) == 3
        for seq, got in zip(seqs, many):
            one = engine.search(seq, k=4, **kw)
            assert [r["version_key"] for r in got["results"]] == [
                r["version_key"] for r in one["results"]
            ], (kw, got, one)
            np.testing.assert_allclose(
                [r["score"] for r in got["results"]],
                [r["score"] for r in one["results"]], atol=1e-4,
            )
    # self-retrieval sanity on the batch itself
    full = engine.search_many(seqs, k=1)
    assert [o["results"][0]["version_key"] for o in full] == [
        "400", "501", "401"
    ]


def test_int8_resident_corpus(serve_project, capsys):
    """quantize="int8" (per-chunk absmax scales, in-kernel dequant) keeps
    the ranking of the f16 engine and its scores to ~1% — full scan,
    two-stage, and the sharded mesh variant."""
    import jax

    from wealy_tpu.cli.serve import QueryEngine
    from wealy_tpu.parallel.mesh import make_mesh
    from wealy_tpu.train.config import Config

    tmp_path, cpath, store = serve_project
    idx = tmp_path / "serve" / "test.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx)]) == 0
    capsys.readouterr()
    config = Config.from_dict(json.loads(cpath.read_text()))
    f16 = QueryEngine(config, str(idx), None, block_size=2)
    int8 = QueryEngine(config, str(idx), None, block_size=2,
                       quantize="int8")
    assert int8._quantized and int8._sets_dev.dtype == np.int8
    int8_mesh = QueryEngine(
        config, str(idx), None, block_size=2, quantize="int8",
        mesh=make_mesh(devices=jax.devices()),
    )
    with np.load(store.path("400", "hs_last_seq.npz")) as d:
        seq = d["embeddings"]
    for kw in ({}, {"rerank": 3}):
        a = f16.search(seq, k=4, **kw)
        sa = {r["version_key"]: r["score"] for r in a["results"]}
        for eng in (int8, int8_mesh):
            b = eng.search(seq, k=4, **kw)
            sb = {r["version_key"]: r["score"] for r in b["results"]}
            # same-clique covers can be near-ties (<1e-3 apart) that int8
            # noise legitimately reorders; require the well-separated head
            # of the ranking and per-song score agreement instead
            assert [r["version_key"] for r in b["results"]][:2] == [
                "400", "401"
            ], (kw, b)
            assert set(sa) == set(sb)
            for v in sa:
                assert abs(sa[v] - sb[v]) < 1.5e-2, (kw, v, sa, sb)

    import pytest

    with pytest.raises(ValueError, match="quantize"):
        QueryEngine(config, str(idx), None, quantize="int4")


def test_pooled_only_index(serve_project, capsys):
    tmp_path, cpath, store = serve_project
    idx = tmp_path / "serve" / "pooled.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx), "--no-sets"]) == 0
    capsys.readouterr()
    with np.load(idx) as d:
        assert "sets" not in d.files
    qpath = store.path("500", "hs_last_seq.npz")
    assert main(["query", "--config", str(cpath), "--index", str(idx),
                 "--query-embeddings", str(qpath), "--k", "2"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["scoring"] == "pooled_cosine"  # no sets -> cosine fallback
    assert len(res["results"]) == 2
    assert res["results"][0]["version_key"] == "500"


def test_query_rejects_mismatched_index(serve_project, capsys, tmp_path):
    _, cpath, store = serve_project
    idx = tmp_path / "serve" / "test.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx)]) == 0
    conf = json.loads(cpath.read_text())
    conf["model"]["zdim"] = 32
    c2 = tmp_path / "conf2.json"
    c2.write_text(json.dumps(conf))
    capsys.readouterr()
    assert main(["query", "--config", str(c2), "--index", str(idx),
                 "--query-embeddings", str(store.path("400", "hs_last_seq.npz"))]
                ) == 2


def test_serve_daemon(serve_project, tmp_path):
    """The `serve` daemon answers /healthz and /query over HTTP with the
    model+index loaded once (embeddings-payload query: rank-1 self-hit)."""
    import os
    import subprocess
    import sys as _sys
    import time
    import urllib.request

    tmp_root, cpath, store = serve_project
    idx = tmp_root / "serve" / "test.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx)]) == 0

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [_sys.executable, "-m", "wealy_tpu.cli.main", "serve",
         "--config", str(cpath), "--index", str(idx), "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        line = proc.stdout.readline()  # startup JSON carries the bound port
        url = json.loads(line)["serving"]
        h = json.loads(
            urllib.request.urlopen(f"{url}/healthz", timeout=30).read()
        )
        assert h["ok"] and h["indexed"] == 4 and h["exact_sets"] is True

        with np.load(store.path("400", "hs_last_seq.npz")) as d:
            seq = d["embeddings"].tolist()
        t0 = time.perf_counter()
        req = urllib.request.Request(
            f"{url}/query",
            data=json.dumps({"embeddings": seq, "k": 2}).encode(),
            headers={"Content-Type": "application/json"},
        )
        res = json.loads(urllib.request.urlopen(req, timeout=120).read())
        cold = time.perf_counter() - t0
        assert res["results"][0]["version_key"] == "400", res
        # second query rides the already-compiled path
        t0 = time.perf_counter()
        res2 = json.loads(urllib.request.urlopen(req, timeout=120).read())
        warm = time.perf_counter() - t0
        assert res2 == res
        assert warm <= cold + 1.0  # no recompile on the warm path

        # batch request: one device dispatch, per-entry payloads in order
        with np.load(store.path("501", "hs_last_seq.npz")) as d:
            seq2 = d["embeddings"].tolist()
        breq = urllib.request.Request(
            f"{url}/query",
            data=json.dumps(
                {"batch": [{"embeddings": seq}, {"embeddings": seq2}],
                 "k": 1}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        bres = json.loads(urllib.request.urlopen(breq, timeout=120).read())
        assert [o["results"][0]["version_key"] for o in bres["batch"]] == [
            "400", "501"
        ], bres

        # malformed request: daemon answers 400 and stays alive
        bad = urllib.request.Request(f"{url}/query", data=b"{}")
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert json.loads(
            urllib.request.urlopen(f"{url}/healthz", timeout=30).read()
        )["ok"]

        # live corpus growth: append a song, `index --update`, POST /reload
        # -> the running daemon serves the new corpus without a restart
        df = pd.read_csv(tmp_root / "lc" / "test_no_dup.csv")
        # a full clique (two versions): single-version cliques are filtered
        df.loc[len(df)] = (6, 600, False, "o", "F")
        df.loc[len(df)] = (6, 601, True, "c", "F")
        df.to_csv(tmp_root / "lc" / "test_no_dup.csv", index=False)
        rng = np.random.default_rng(600)
        new_emb = rng.normal(size=(14, 24)).astype(np.float32)
        store.save("600", "hs_last_seq.npz", embeddings=new_emb)
        store.save(
            "601", "hs_last_seq.npz",
            embeddings=new_emb + 0.05 * rng.normal(size=(14, 24)).astype(
                np.float32
            ),
        )
        assert main(["index", "--config", str(cpath), "--split", "test",
                     "--out", str(idx), "--update"]) == 0
        r = json.loads(urllib.request.urlopen(
            urllib.request.Request(f"{url}/reload", data=b""), timeout=60
        ).read())
        assert r["ok"] and r["was"] == 4 and r["indexed"] == 6, r
        qreq = urllib.request.Request(
            f"{url}/query",
            data=json.dumps(
                {"embeddings": new_emb.tolist(), "k": 1}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        got = json.loads(urllib.request.urlopen(qreq, timeout=120).read())
        assert got["results"][0]["version_key"] == "600", got
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def _write_wav(path, seconds, sr=16000, freq=440.0):
    path.parent.mkdir(parents=True, exist_ok=True)
    t = np.arange(int(seconds * sr)) / sr
    x = (np.sin(2 * np.pi * freq * t) * 0.4 * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


@pytest.mark.slow
def test_audio_query_decoder_kind(tmp_path, capsys, monkeypatch):
    """Raw wav -> dev-whisper greedy transcription pass -> flattened
    hs_last_seq decoder states -> head -> index search: the serving path
    for the decoder-token taxonomy kinds (previously --query-embeddings
    only). Corpus files are produced by the SAME query embed fn, so
    self-retrieval must hit rank 1."""
    import functools

    import wealy_tpu.cli.extract_batched as EB

    # cap the greedy decode at 16 tokens for the dev model (the production
    # default of 224 costs ~6 min of pure CPU decode loop here and tests
    # nothing extra — length handling is covered in test_whisper_extract)
    monkeypatch.setattr(
        EB, "make_decoder_embed_fn",
        functools.partial(EB.make_decoder_embed_fn, max_len=16),
    )
    from wealy_tpu.cli.serve import make_query_embed_fn
    from wealy_tpu.data.embedding_store import EmbeddingStore
    from wealy_tpu.train.config import Config

    rows = {
        "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A")],
        "val": [(3, 300, False, "o", "C"), (3, 301, True, "c", "C")],
        "test": [(4, 400, False, "o", "D"), (4, 401, True, "c", "D")],
    }
    _write_csvs(tmp_path / "lc", rows)
    conf = {
        "path": {
            "lyric_covers_data": str(tmp_path / "lc"),
            "hidden_states": str(tmp_path / "hs"),
            "cache": str(tmp_path / "cache"),
        },
        "data": {
            "dataset_name": "lyric-covers",
            "embedding_type": "last_hidden_states",
            "embedding_format": "concat",
            "chunk_size": 2,
        },
        "model": {"name": "whisper", "zdim": 8, "whisper_size": "dev"},
    }
    cpath = tmp_path / "conf.json"
    cpath.write_text(json.dumps(conf))
    config = Config.from_dict(conf)

    embed = make_query_embed_fn(config)  # one model init for everything
    store = EmbeddingStore(tmp_path / "hs", "lyric-covers")
    wavs = {}
    for (_, vid, *_r), freq in zip(
        [r for d in rows.values() for r in d], [220, 260, 300, 340, 392, 440]
    ):
        w = tmp_path / "audio" / f"{vid}.wav"
        _write_wav(w, seconds=31.0, freq=float(freq))
        wavs[str(vid)] = w
        seq = embed(str(w))
        assert seq.ndim == 2 and seq.shape[0] >= 2  # >=1 token per chunk
        store.save(str(vid), "hs_last_seq.npz", embeddings=seq)

    idx = tmp_path / "serve" / "test.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx)]) == 0
    capsys.readouterr()
    assert main(["query", "--config", str(cpath), "--index", str(idx),
                 "--audio", str(wavs["400"]), "--k", "2"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["results"][0]["version_key"] == "400", res


def test_audio_query_end_to_end(tmp_path, capsys):
    """Raw wav -> dev-whisper x_concat embed -> head -> index search: the
    query's own song ranks first. Exercises the full serving path
    (decode, 30 s chunking, encoder kind dispatch, head, redux scoring)."""
    from wealy_tpu.cli.serve import embed_query_audio
    from wealy_tpu.data.embedding_store import EmbeddingStore
    from wealy_tpu.train.config import Config

    rows = {
        "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A")],
        "val": [(3, 300, False, "o", "C"), (3, 301, True, "c", "C")],
        "test": [(4, 400, False, "o", "D"), (4, 401, True, "c", "D")],
    }
    _write_csvs(tmp_path / "lc", rows)
    conf = {
        "path": {
            "lyric_covers_data": str(tmp_path / "lc"),
            "hidden_states": str(tmp_path / "hs"),
            "cache": str(tmp_path / "cache"),
        },
        "data": {
            "dataset_name": "lyric-covers",
            "embedding_type": "encoder",
            "embedding_format": "concat",
            "chunk_size": 2,
        },
        "model": {"name": "whisper", "zdim": 8, "whisper_size": "dev"},
    }
    cpath = tmp_path / "conf.json"
    cpath.write_text(json.dumps(conf))
    config = Config.from_dict(conf)

    # corpus x_concat embeddings produced by the SAME path a query takes,
    # from distinct waveforms (31 s -> 2 chunks each)
    store = EmbeddingStore(tmp_path / "hs", "lyric-covers")
    wavs = {}
    for (_, vid, *_r), freq in zip(
        [r for d in rows.values() for r in d], [220, 260, 300, 340, 392, 440]
    ):
        w = tmp_path / "audio" / f"{vid}.wav"
        _write_wav(w, seconds=31.0, freq=float(freq))
        wavs[str(vid)] = w
        store.save(str(vid), "x_concat.npz",
                   embeddings=embed_query_audio(config, str(w)))

    idx = tmp_path / "serve" / "test.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx)]) == 0
    capsys.readouterr()
    assert main(["query", "--config", str(cpath), "--index", str(idx),
                 "--audio", str(wavs["401"]), "--k", "2"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["results"][0]["version_key"] == "401", res
    assert res["query"] == str(wavs["401"])


def test_serve_warmup_precompiles_audio_path(tmp_path, capsys):
    """--warmup: the daemon pre-compiles the audio-query path at boot (one
    synthetic silence clip through decode -> embed -> score) and prints a
    warmup_s line before `serving`."""
    import os
    import subprocess
    import sys as _sys

    from wealy_tpu.cli.serve import embed_query_audio
    from wealy_tpu.data.embedding_store import EmbeddingStore
    from wealy_tpu.train.config import Config

    rows = {
        "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A")],
        "val": [],
        "test": [(4, 400, False, "o", "D"), (4, 401, True, "c", "D")],
    }
    _write_csvs(tmp_path / "lc", rows)
    conf = {
        "path": {"lyric_covers_data": str(tmp_path / "lc"),
                 "hidden_states": str(tmp_path / "hs"),
                 "cache": str(tmp_path / "cache")},
        "data": {"dataset_name": "lyric-covers",
                 "embedding_type": "encoder", "embedding_format": "concat",
                 "chunk_size": 2},
        "model": {"name": "whisper", "zdim": 8, "whisper_size": "dev"},
    }
    cpath = tmp_path / "conf.json"
    cpath.write_text(json.dumps(conf))
    config = Config.from_dict(conf)
    store = EmbeddingStore(tmp_path / "hs", "lyric-covers")
    w = tmp_path / "a.wav"
    _write_wav(w, seconds=31.0, freq=330.0)
    for vid in ("400", "401"):
        store.save(vid, "x_concat.npz",
                   embeddings=embed_query_audio(config, str(w)))
    idx = tmp_path / "serve" / "test.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx)]) == 0
    capsys.readouterr()

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [_sys.executable, "-m", "wealy_tpu.cli.main", "serve",
         "--config", str(cpath), "--index", str(idx), "--port", "0",
         "--warmup"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        first = json.loads(proc.stdout.readline())
        assert "warmup_s" in first and first["warmup_s"] > 0, first
        second = json.loads(proc.stdout.readline())
        assert "serving" in second
    finally:
        proc.terminate()
        proc.wait(timeout=30)


class TestFusionServing:
    """All seven model families serve: fusion indexes hold per-song fused
    embeddings (deterministic multimodal collate), raw-audio queries compute
    BOTH modalities cold through the same extractors that built the corpus."""

    def _conf(self, tmp_path, name, rows):
        _write_csvs(tmp_path / "lc", rows)
        conf = {
            "path": {
                "lyric_covers_data": str(tmp_path / "lc"),
                "hidden_states": str(tmp_path / "hs"),
                "cache": str(tmp_path / "cache"),
                "data": str(tmp_path / "data"),
            },
            "data": {"dataset_name": "lyric-covers", "chunk_size": 8},
            "model": {"name": name, "zdim": 16, "whisper_size": "dev"},
        }
        cpath = tmp_path / "conf.json"
        cpath.write_text(json.dumps(conf))
        return cpath, conf

    def test_two_stream_index_and_query(self, tmp_path, capsys):
        """whisper-clews: index from store files, query via the same mm
        payloads -> self-retrieval at rank 1; fusion guard rails."""
        import pytest as _pytest

        from wealy_tpu.cli.serve import QueryEngine
        from wealy_tpu.data.embedding_store import EmbeddingStore
        from wealy_tpu.train.config import Config

        rows = {
            "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A")],
            "val": [],
            "test": [(4, 400, False, "o", "D"), (4, 401, True, "c", "D"),
                     (5, 500, False, "o", "E"), (5, 501, True, "c", "E")],
        }
        cpath, conf = self._conf(tmp_path, "whisper-clews", rows)
        store = EmbeddingStore(tmp_path / "hs", "lyric-covers")
        rng = np.random.default_rng(0)
        centers = {}
        for data in rows.values():
            for _, vid, _, _, label in data:
                if label not in centers:
                    centers[label] = (
                        rng.normal(size=(24,)).astype(np.float32),
                        rng.normal(size=(116, 2048)).astype(np.float32),
                    )
                cw, cc = centers[label]
                T = int(rng.integers(10, 16))
                store.save(str(vid), "hs_last_seq.npz",
                           embeddings=cw[None] + 0.1 * rng.normal(
                               size=(T, 24)).astype(np.float32))
                store.save(str(vid), "hs_clews.npz",
                           embeddings=(cc + 0.1 * rng.normal(
                               size=(116, 2048))).astype(np.float32))
                store.save(str(vid), "hs_clews_avg.npz",
                           embeddings=rng.normal(size=(2048,)).astype(np.float32))
                mask = np.ones((116,), bool)
                mask[:8] = False
                store.save(str(vid), "hs_clews_mask.npz", embeddings=mask)
        idx = tmp_path / "serve" / "test.npz"
        assert main(["index", "--config", str(cpath), "--split", "test",
                     "--out", str(idx)]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["indexed"] == 4 and out["fusion"] is True

        config = Config.from_dict(conf)
        eng = QueryEngine(config, str(idx), None)
        assert eng.fusion and eng.sets is None
        # query = the stored modalities of song 400 (what a cold audio
        # query would compute) -> rank-1 self-hit
        def mm_of(vid):
            with np.load(store.path(vid, "hs_last_seq.npz")) as d:
                seq = d["embeddings"]
            with np.load(store.path(vid, "hs_clews.npz")) as d:
                fc = d["embeddings"]
            with np.load(store.path(vid, "hs_clews_mask.npz")) as d:
                cm = d["embeddings"]
            return {"whisper_seq": seq, "full_clews": fc,
                    "avg_clews": fc.mean(0), "clews_mask": cm}

        outs = eng._search_many_mm([mm_of("400"), mm_of("501")], k=2)
        assert outs[0]["results"][0]["version_key"] == "400", outs[0]
        assert outs[1]["results"][0]["version_key"] == "501", outs[1]
        assert outs[0]["scoring"] == "fusion_cosine"

        # guard rails: quantize + embeddings-queries are chunk-set concepts
        with _pytest.raises(ValueError, match="quantize"):
            QueryEngine(config, str(idx), None, quantize="int8")
        qe = store.path("400", "hs_last_seq.npz")
        assert main(["query", "--config", str(cpath), "--index", str(idx),
                     "--query-embeddings", str(qe)]) == 2
        assert "raw-audio" in capsys.readouterr().err

    def test_wealy_fusion_audio_end_to_end(self, tmp_path, capsys):
        """wealy-clews, full cold path BOTH sides: wavs -> extract
        hs_wealy_concat (dev whisper + head) + hs_clews (CQT window
        encoder) -> fusion index -> raw-audio query -> rank-1 self-hit."""
        rows = {
            "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A")],
            "val": [],
            "test": [(4, 400, False, "o", "D"), (4, 401, True, "c", "D"),
                     (5, 500, False, "o", "E"), (5, 501, True, "c", "E")],
        }
        cpath, conf = self._conf(tmp_path, "wealy-clews", rows)
        base = tmp_path / "data" / "LyricCovers" / "audio"
        wavs = {}
        for (_, vid, *_r), freq in zip(
            [r for d in rows.values() for r in d], [220, 230, 330, 335, 440, 450]
        ):
            w = base / str(vid) / f"{vid}_audio.mp3"  # wav bytes, mp3 name
            _write_wav(w, seconds=8.0, freq=float(freq))
            wavs[str(vid)] = w
        for kinds in ("hs_wealy_concat", "hs_clews"):
            assert main(["extract", "--config", str(cpath), "--split", "test",
                         "--kinds", kinds, "--batched", "--batch-size", "8"]
                        if kinds != "hs_clews" else
                        ["extract", "--config", str(cpath), "--split", "test",
                         "--kinds", kinds]) == 0
        capsys.readouterr()
        idx = tmp_path / "serve" / "test.npz"
        assert main(["index", "--config", str(cpath), "--split", "test",
                     "--out", str(idx)]) == 0
        capsys.readouterr()
        assert main(["query", "--config", str(cpath), "--index", str(idx),
                     "--audio", str(wavs["400"]), "--k", "2"]) == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["results"][0]["version_key"] == "400", res
        assert res["scoring"] == "fusion_cosine"

    def test_fusion_trained_checkpoint_reaches_engine(self, tmp_path, capsys):
        """A trained fusion checkpoint flows into both `index` (recorded
        step) and the QueryEngine (restored params): train whisper-clews
        briefly, index, and verify the indexed vectors differ from a
        random-init rebuild (i.e. the checkpoint actually loaded)."""
        from wealy_tpu.cli.serve import QueryEngine
        from wealy_tpu.data.embedding_store import EmbeddingStore
        from wealy_tpu.train.config import Config

        rows = {
            "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A"),
                      (2, 200, False, "o", "B"), (2, 201, True, "c", "B"),
                      (3, 300, False, "o", "C"), (3, 301, True, "c", "C"),
                      (7, 700, False, "o", "G"), (7, 701, True, "c", "G")],
            "val": [],
            "test": [(4, 400, False, "o", "D"), (4, 401, True, "c", "D")],
        }
        cpath, conf = self._conf(tmp_path, "whisper-clews", rows)
        conf["path"]["checkpoints"] = str(tmp_path / "ckpt")
        # batch_size 4 x n_per_class 2 = 8 flat items: divisible by the
        # 8-virtual-device test mesh the train step shards over
        conf["train"] = {"batch_size": 4, "max_steps": 2, "lr": 1e-3,
                         "checkpoint_every": 1}
        cpath.write_text(json.dumps(conf))
        store = EmbeddingStore(tmp_path / "hs", "lyric-covers")
        rng = np.random.default_rng(0)
        for data in rows.values():
            for _, vid, *_r in data:
                store.save(str(vid), "hs_last_seq.npz",
                           embeddings=rng.normal(size=(12, 24)).astype(np.float32))
                store.save(str(vid), "hs_clews.npz",
                           embeddings=rng.normal(size=(116, 2048)).astype(np.float32))
                store.save(str(vid), "hs_clews_avg.npz",
                           embeddings=rng.normal(size=(2048,)).astype(np.float32))
                mask = np.ones((116,), bool)
                mask[:4] = False
                store.save(str(vid), "hs_clews_mask.npz", embeddings=mask)
        assert main(["train", "--config", str(cpath)]) == 0
        capsys.readouterr()
        idx = tmp_path / "serve" / "test.npz"
        assert main(["index", "--config", str(cpath), "--split", "test",
                     "--out", str(idx)]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["fusion"] is True and out["checkpoint_step"] == 2, out

        config = Config.from_dict(conf)
        eng = QueryEngine(config, str(idx), None)
        assert eng.checkpoint_step == 2

        # a random-init rebuild (no checkpoint dir) must differ
        conf2 = dict(conf)
        conf2["path"] = dict(conf["path"]); conf2["path"]["checkpoints"] = None
        c2 = tmp_path / "c2.json"; c2.write_text(json.dumps(conf2))
        idx2 = tmp_path / "serve" / "t2.npz"
        assert main(["index", "--config", str(c2), "--split", "test",
                     "--out", str(idx2)]) == 0
        capsys.readouterr()
        with np.load(idx) as a, np.load(idx2) as b:
            assert not np.allclose(a["vecs"], b["vecs"])

    def test_fusion_index_update_incremental(self, tmp_path, capsys):
        """fusion `index --update`: carries fused vectors byte-identically,
        embeds only new versions, refuses on checkpoint change."""
        from wealy_tpu.data.embedding_store import EmbeddingStore

        rows = {
            "train": [(1, 100, False, "o", "A"), (1, 101, True, "c", "A")],
            "val": [],
            "test": [(4, 400, False, "o", "D"), (4, 401, True, "c", "D")],
        }
        cpath, conf = self._conf(tmp_path, "whisper-clews", rows)
        store = EmbeddingStore(tmp_path / "hs", "lyric-covers")
        rng = np.random.default_rng(0)

        def save(vid):
            store.save(str(vid), "hs_last_seq.npz",
                       embeddings=rng.normal(size=(12, 24)).astype(np.float32))
            store.save(str(vid), "hs_clews.npz",
                       embeddings=rng.normal(size=(116, 2048)).astype(np.float32))
            store.save(str(vid), "hs_clews_avg.npz",
                       embeddings=rng.normal(size=(2048,)).astype(np.float32))
            m = np.ones((116,), bool)
            m[:4] = False
            store.save(str(vid), "hs_clews_mask.npz", embeddings=m)

        for d in rows.values():
            for _, vid, *_r in d:
                save(vid)
        idx = tmp_path / "serve" / "test.npz"
        assert main(["index", "--config", str(cpath), "--split", "test",
                     "--out", str(idx)]) == 0
        capsys.readouterr()
        with np.load(idx) as d:
            before = {str(k): v for k, v in
                      zip(d["version_keys"], d["vecs"])}

        rows["test"] = rows["test"] + [(5, 500, False, "o", "E"),
                                       (5, 501, True, "c", "E")]
        _write_csvs(tmp_path / "lc", rows)
        for vid in (500, 501):
            save(vid)
        assert main(["index", "--config", str(cpath), "--split", "test",
                     "--out", str(idx), "--update"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["indexed"] == 4 and out["new"] == 2 and out["fusion"]
        with np.load(idx) as d:
            keys = [str(k) for k in d["version_keys"]]
            assert set(keys) == {"400", "401", "500", "501"}
            for k, v in before.items():
                np.testing.assert_array_equal(d["vecs"][keys.index(k)], v)

        # a checkpoint-step mismatch invalidates the carry: mixing two
        # heads' vectors in one index must refuse
        with np.load(idx) as d:
            payload = {k: d[k] for k in d.files}
        meta = json.loads(str(payload["meta"]))
        meta["checkpoint_step"] = 7
        payload["meta"] = np.asarray(json.dumps(meta))
        np.savez(idx, **payload)
        conf["path"]["checkpoints"] = None
        cpath.write_text(json.dumps(conf))
        assert main(["index", "--config", str(cpath), "--split", "test",
                     "--out", str(idx), "--update"]) == 2
        assert "refused" in capsys.readouterr().err


@pytest.mark.slow
def test_int8_engine_init_memory_bounded(tmp_path):
    """Capacity discipline: QueryEngine(quantize="int8") at a 100K-song
    index (1 GB f16 chunk sets) must quantize BLOCKWISE — a naive full-f32
    temp copy alone would be 4 GB and push peak RSS past ~9 GB. Subprocess
    VmHWM probe (child-local, like tests/test_scale_eval.py)."""
    import os
    import subprocess
    import sys as _sys

    n, smax, zdim = 100_000, 10, 512
    rng = np.random.default_rng(0)
    sets = np.empty((n, smax, zdim), np.float16)
    for b in range(0, n, 16384):
        m = min(16384, n - b)
        sets[b : b + m] = rng.standard_normal(
            (m, smax, zdim), dtype=np.float32
        ).astype(np.float16)
    idx = tmp_path / "big.npz"
    np.savez(
        idx,
        version_keys=np.asarray([f"v{i}" for i in range(n)]),
        cliques=np.asarray([f"c{i // 2}" for i in range(n)]),
        labels=(np.arange(n) // 2).astype(np.int32),
        ids=np.arange(n, dtype=np.int64),
        vecs=sets.mean(axis=1, dtype=np.float32),
        sets=sets,
        set_mask=np.ones((n, smax), bool),
        meta=np.asarray(json.dumps({
            "index_version": 1, "model": "whisper", "zdim": zdim,
            "split": "t", "checkpoint_step": None,
            "embedding_file": "hs_last_seq.npz", "emb_dim": 24,
            "chunk_size": 8, "overlap": 0.9, "has_sets": True,
        })),
    )
    del sets
    script = (
        "import re, json\n"
        "import numpy as np\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from wealy_tpu.cli.serve import QueryEngine\n"
        "from wealy_tpu.train.config import Config\n"
        "config = Config.from_dict({'path': {'lyric_covers_data': '/n',"
        " 'hidden_states': '/n', 'cache': '/n'},"
        " 'data': {'dataset_name': 'lyric-covers',"
        " 'embedding_type': 'last_hidden_states',"
        " 'embedding_format': 'concat', 'chunk_size': 8},"
        " 'model': {'name': 'whisper', 'zdim': 512}})\n"
        f"eng = QueryEngine(config, {str(idx)!r}, None, quantize='int8')\n"
        "assert eng._quantized and eng._sets_dev.dtype == np.int8\n"
        "seq = np.random.default_rng(1).normal(size=(16, 24))"
        ".astype(np.float32)\n"
        "r = eng.search(seq, k=5, pooled=True)\n"
        "assert len(r['results']) == 5\n"
        "with open('/proc/self/status') as f:\n"
        "    rss = int(re.search(r'VmHWM:\\s+(\\d+) kB',"
        " f.read()).group(1)) / 1024.0\n"
        "print(json.dumps({'maxrss_mb': rss}))\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_cpu_max_isa=AVX2",
               PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))
    out = subprocess.run(
        [_sys.executable, "-c", script], capture_output=True, text=True,
        timeout=900, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-3000:]
    probe = json.loads(out.stdout.strip().splitlines()[-1])
    # measured ~5.6 GB: f16 load (1 GB) + int8 + cpu-"device" copies +
    # XLA arena/baseline. The guard catches the naive full-f32 quantize
    # (a +4 GB temp -> >9.5 GB) and any return of the padded-f16 copy
    assert probe["maxrss_mb"] < 6500, probe


class TestMicroBatcher:
    """Unit tests for the daemon's bounded-delay query collector."""

    def _make(self, calls, window_s=0.02, max_batch=32, fail=False):
        from wealy_tpu.cli.serve import MicroBatcher

        def dispatch(seqs, opts):
            calls.append((list(seqs), opts))
            if fail:
                raise RuntimeError("boom")
            return [f"r{s}" for s in seqs]

        return MicroBatcher(dispatch, window_s=window_s, max_batch=max_batch)

    def test_coalesces_concurrent_submits(self):
        import threading

        calls = []
        b = self._make(calls, window_s=0.05)
        outs = [None] * 6
        # hold the collector busy-free: submit 6 items from 6 threads
        # within one window -> they should coalesce into ONE dispatch
        ts = [
            threading.Thread(
                target=lambda i=i: outs.__setitem__(
                    i, b.submit_many([i], ("k",))[0]
                )
            )
            for i in range(6)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        assert outs == [f"r{i}" for i in range(6)]
        assert len(calls) <= 2  # coalesced (1 typical; 2 if scheduler split)
        assert sum(len(c[0]) for c in calls) == 6
        b.close()

    def test_groups_by_opts(self):
        import threading

        calls = []
        b = self._make(calls, window_s=0.05)
        outs = {}

        def go(i, opts):
            outs[i] = b.submit_many([i], opts)[0]

        ts = [threading.Thread(target=go, args=(i, ("a",) if i % 2 else ("b",)))
              for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        assert outs == {i: f"r{i}" for i in range(4)}
        # every dispatch is option-uniform
        for seqs, opts in calls:
            assert opts in (("a",), ("b",))
        b.close()

    def test_error_propagates_to_every_waiter(self):
        calls = []
        b = self._make(calls, fail=True, window_s=0.01)
        with pytest.raises(RuntimeError, match="boom"):
            b.submit_many([1, 2], ("k",))
        # the batcher survives a failed dispatch
        b._dispatch = lambda seqs, opts: [f"ok{s}" for s in seqs]
        assert b.submit_many([3], ("k",)) == ["ok3"]
        b.close()

    def test_max_batch_splits(self):
        calls = []
        b = self._make(calls, window_s=0.02, max_batch=3)
        assert b.submit_many(list(range(7)), ("k",)) == [
            f"r{i}" for i in range(7)
        ]
        assert all(len(c[0]) <= 3 for c in calls)
        b.close()


def test_serve_daemon_concurrent_clients(serve_project, tmp_path):
    """8 independent HTTP clients in parallel: all answered correctly via
    micro-batched dispatch (round-4 VERDICT #4 — clients used to serialize
    one-by-one on the search lock)."""
    import os
    import subprocess
    import sys as _sys
    import threading
    import urllib.request

    tmp_root, cpath, store = serve_project
    idx = tmp_root / "serve" / "test.npz"
    assert main(["index", "--config", str(cpath), "--split", "test",
                 "--out", str(idx)]) == 0

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [_sys.executable, "-m", "wealy_tpu.cli.main", "serve",
         "--config", str(cpath), "--index", str(idx), "--port", "0",
         "--batch-window-ms", "25"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env,
    )
    try:
        url = json.loads(proc.stdout.readline())["serving"]
        keys = ["400", "401", "500", "501"] * 2
        results = [None] * len(keys)

        def client(i, key):
            with np.load(store.path(key, "hs_last_seq.npz")) as d:
                seq = d["embeddings"].tolist()
            req = urllib.request.Request(
                f"{url}/query",
                data=json.dumps({"embeddings": seq, "k": 1}).encode(),
                headers={"Content-Type": "application/json"},
            )
            results[i] = json.loads(
                urllib.request.urlopen(req, timeout=180).read()
            )

        # warm one query first so the 8-way burst rides the compiled path
        client(0, keys[0])
        ts = [threading.Thread(target=client, args=(i, k))
              for i, k in enumerate(keys)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        for key, res in zip(keys, results):
            assert res is not None and "results" in res, res
            assert res["results"][0]["version_key"] == key, (key, res)
    finally:
        proc.terminate()
        proc.wait(timeout=30)
