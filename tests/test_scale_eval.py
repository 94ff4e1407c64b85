"""Corpus-scale memory-discipline proof for the round-2 VERDICT weak #1/#2:
fusion-model evaluate and the train-time val hook must run a ~30K-version
corpus with bounded RSS.

The corpus is pack-backed (one mmap binary per embedding kind — no 30K
per-version files), with a stored whisper sequence of (12, 256) that the
collate zero-pads to chunk_size=250. The OLD monolithic paths would have
materialized the whole split's collated whisper input — (30000, 250, 256)
f32 = 7.7 GB — in one host array and one jit call; the streamed paths hold
one --song-group / val_group batch at a time. Each scenario runs in its own
subprocess (so ru_maxrss is that run's high-water mark, not the test
session's) and asserts peak RSS < RSS_BOUND_MB, far below the monolithic
tensor alone.

Reference protocol being scaled: deterministic val collate + all-pairs
ranking (lib/embedding_dataset/collate_functions.py:573-696, SURVEY.md §3.4).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

N_CLIQUES = int(os.environ.get("WEALY_SCALE_CLIQUES", "15000"))  # x2 = 30K
CHUNK = 250
C_WHISPER = 256
RSS_BOUND_MB = 3000  # monolithic whisper input ALONE would be ~7700 MB


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("scale30k")
    return _build_corpus(root, N_CLIQUES)


def _build_corpus(root, n_cliques):
    import pandas as pd

    from wealy_tpu.data.packed_store import PackedStore

    lc = root / "lc"
    lc.mkdir()
    rng = np.random.default_rng(0)

    # 30K versions: 15K cliques x (original, cover). Metadata via one
    # vectorized DataFrame build per split.
    def split_frame(cliques):
        n = len(cliques)
        return pd.DataFrame(
            {
                "original_id": np.repeat(cliques, 2),
                "id": np.repeat(cliques * 10, 2) + np.tile([0, 1], n),
                "is_cover": np.tile([False, True], n),
                "song_text_type": np.tile(["o", "c"], n),
                "label": np.repeat([f"L{c}" for c in cliques], 2),
            }
        )

    big = split_frame(np.arange(1, n_cliques + 1))
    big.to_csv(lc / "test_no_dup.csv", index=False)
    big.to_csv(lc / "val_no_dup.csv", index=False)
    # small DISTINCT-clique train split (the overlap filter drops cliques
    # shared across splits) so `train` has sane batches
    small = split_frame(np.arange(n_cliques + 1, n_cliques + 17))
    small.to_csv(lc / "train_no_dup.csv", index=False)

    both = pd.concat([big, small])
    version_ids = [str(v) for v in both["id"]]
    labels = {str(v): l for v, l in zip(both["id"], both["label"])}

    def rows(shape):
        """Clique-clustered rows: same-label versions share a base vector
        (0.1 noise), so a random-projection model still ranks covers next to
        their originals — proves real signal flows end-to-end at scale."""
        import zlib

        for v in version_ids:
            seed = zlib.crc32(labels[v].encode())
            base = np.random.default_rng(seed).normal(size=shape[-1])
            yield v, (base + 0.1 * rng.normal(size=shape)).astype(np.float16)

    hs = root / "hs"
    ds = "lyric-covers"
    PackedStore.pack(hs, "hs_last_seq", rows((12, C_WHISPER)), dataset_name=ds)
    PackedStore.pack(hs, "hs_clews", rows((4, 8)), dataset_name=ds)
    PackedStore.pack(hs, "hs_clews_avg", rows((8,)), dataset_name=ds)

    def mask_rows():
        for v in version_ids:
            yield v, np.zeros((4,), np.float16)  # all-valid

    PackedStore.pack(hs, "hs_clews_mask", mask_rows(), dataset_name=ds)

    conf = {
        "path": {
            "lyric_covers_data": str(lc),
            "hidden_states": str(hs),
            "cache": str(root / "cache"),
        },
        "data": {
            "dataset_name": ds,
            "embedding_type": "last_hidden_states",
            "embedding_format": "concat",
            "chunk_size": CHUNK,
        },
        "model": {"name": "whisper-clews", "zdim": 16},
        "train": {
            "loss": "clews",
            "batch_size": 8,
            "lr": 1e-3,
            "warmup_steps": 1,
            "log_every": 0,
            "eval_every": 1,
        },
    }
    cpath = root / "conf.json"
    cpath.write_text(json.dumps(conf))
    return root, cpath


def _run_bounded(cpath, cli_args, timeout=1500):
    """Run a CLI command in a fresh subprocess; return (last json line,
    peak RSS in MB)."""
    # peak-RSS probe: /proc/self/status VmHWM, NOT getrusage ru_maxrss.
    # On this kernel ru_maxrss is INHERITED through fork+exec — a child
    # reports the pytest parent's historical peak (verified: a parent that
    # ballooned to 2.2 GB and freed it makes every later child report
    # 2.2 GB) — which made these tests fail in full-suite context only,
    # with all four reporting the parent's identical peak. VmHWM belongs
    # to the mm, which execve replaces, so it is child-local.
    script = (
        "import re, sys, json\n"
        "from wealy_tpu.cli.main import main\n"
        f"rc = main({cli_args!r})\n"
        "with open('/proc/self/status') as f:\n"
        "    rss = int(re.search(r'VmHWM:\\s+(\\d+) kB', f.read()).group(1)) / 1024.0\n"
        "print(json.dumps({'rc': rc, 'maxrss_mb': rss}))\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_cpu_max_isa=AVX2"
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    probe = json.loads(lines[-1])
    assert probe["rc"] == 0, out.stderr[-3000:]
    result = json.loads(lines[-2]) if len(lines) > 1 else {}
    return result, probe["maxrss_mb"]


@pytest.mark.slow
class TestScale30K:
    def test_fusion_evaluate_streaming_bounded(self, corpus):
        _, cpath = corpus
        metrics, rss = _run_bounded(
            cpath,
            ["evaluate", "--config", str(cpath), "--split", "test",
             "--streaming", "--song-group", "64"],
        )
        assert metrics["n_queries"] == 2 * N_CLIQUES
        # clustered fixture: covers rank near their originals
        assert metrics["MAP"] > 0.5
        assert rss < RSS_BOUND_MB, (
            f"fusion evaluate peaked at {rss:.0f} MB (monolithic input alone "
            f"would be ~7700 MB)"
        )

    def test_train_val_hook_bounded(self, corpus):
        root, cpath = corpus
        conf = json.loads(cpath.read_text())
        conf["train"]["metrics_jsonl"] = str(root / "m.jsonl")
        conf["model"] = {"name": "whisper", "zdim": 16}  # single-modal hook
        cpath2 = root / "conf_train.json"
        cpath2.write_text(json.dumps(conf))
        _, rss = _run_bounded(
            cpath2,
            ["train", "--config", str(cpath2), "--max-steps", "1", "--fresh"],
        )
        records = [
            json.loads(l) for l in (root / "m.jsonl").read_text().splitlines()
        ]
        val = [r for r in records if "val_MAP" in r]
        assert val and val[0]["val_MAP"] > 0.5
        assert rss < RSS_BOUND_MB, (
            f"train val hook peaked at {rss:.0f} MB (monolithic val collate "
            f"alone would be ~7700 MB)"
        )

    def test_auto_streaming_default_bounded(self, tmp_path_factory):
        """Round-3 VERDICT weak #5 'Done' criterion: `evaluate` WITHOUT
        --streaming above the auto-streaming threshold (5K songs here)
        switches to the streaming path by itself — bounded RSS, correct
        metrics — instead of defaulting to the monolithic (S, S) layout."""
        root = tmp_path_factory.mktemp("scale5k")
        _, cpath = _build_corpus(root, 2500)  # 5K versions
        metrics, rss = _run_bounded(
            cpath,
            ["evaluate", "--config", str(cpath), "--split", "test",
             "--song-group", "64"],  # note: NO --streaming flag
        )
        assert metrics["n_queries"] == 5000
        assert metrics["MAP"] > 0.5
        assert rss < RSS_BOUND_MB, (
            f"auto-streaming evaluate peaked at {rss:.0f} MB"
        )

    def test_train_val_hook_multimodal_bounded(self, corpus):
        """Round-3 VERDICT weak #3 'Done' criterion: `train` with
        model.name=whisper-clews emits val_MAP to the JSONL sink over the
        30K-version val split with bounded RSS (the fusion family trained
        blind before)."""
        root, cpath = corpus
        conf = json.loads(cpath.read_text())
        conf["train"]["metrics_jsonl"] = str(root / "m_mm.jsonl")
        conf["train"]["val_group"] = 256
        cpath2 = root / "conf_train_mm.json"
        cpath2.write_text(json.dumps(conf))
        _, rss = _run_bounded(
            cpath2,
            ["train", "--config", str(cpath2), "--max-steps", "1", "--fresh"],
        )
        records = [
            json.loads(l)
            for l in (root / "m_mm.jsonl").read_text().splitlines()
        ]
        val = [r for r in records if "val_MAP" in r]
        assert val and val[0]["val_MAP"] > 0.5
        assert rss < RSS_BOUND_MB, (
            f"fusion train val hook peaked at {rss:.0f} MB (monolithic val "
            f"collate alone would be ~7700 MB)"
        )
