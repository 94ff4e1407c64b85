"""Corpus-capacity benchmark for the serving engine: how large a corpus fits
device-resident on ONE chip, and what exact retrieval costs there.

The reference's largest corpus is Discogs-VI (~1M versions in the full
dataset; SURVEY.md §2.6). f16 chunk sets at (N, 10, 512) are ~10 GB at
N=1M — marginal against a 16 GB-HBM chip once workspace is counted —
while ``quantize="int8"`` halves residency (~5 GB + 2% scales), so the
full corpus serves exact from one chip. This script builds a synthetic
index at the requested sizes (blockwise f32->f16, no f64 temp) and
reports warm per-query latency for:

- pooled cosine (stage-1 signal / fast mode)
- exact chunk-set full scan over the resident corpus
- two-stage rerank=64 (pooled shortlist + exact re-score — the
  production shape at this scale)

    python benchmarks/bench_serve_capacity.py [sizes,...] [zdim] [quantize]
"""
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wealy_tpu.cli.main import _apply_platform_env

_apply_platform_env()

SMAX = 10


def build_index_big(path: Path, n: int, zdim: int) -> None:
    rng = np.random.default_rng(0)
    sets = np.empty((n, SMAX, zdim), np.float16)
    for b in range(0, n, 65536):
        m = min(65536, n - b)
        sets[b : b + m] = rng.standard_normal(
            (m, SMAX, zdim), dtype=np.float32
        ).astype(np.float16)
    vecs = sets.mean(axis=1, dtype=np.float32)
    np.savez(
        path,
        version_keys=np.asarray([f"v{i}" for i in range(n)]),
        cliques=np.asarray([f"c{i // 2}" for i in range(n)]),
        labels=(np.arange(n) // 2).astype(np.int32),
        ids=np.arange(n, dtype=np.int64),
        vecs=vecs,
        sets=sets,
        set_mask=np.ones((n, SMAX), bool),
        meta=np.asarray(json.dumps({
            "index_version": 1, "model": "whisper", "zdim": zdim,
            "split": "bench", "checkpoint_step": None,
            "embedding_file": "hs_last_seq.npz", "emb_dim": 24,
            "chunk_size": 8, "overlap": 0.9, "has_sets": True,
        })),
    )


def main(sizes=(200000, 1000000), zdim=512, quantize="int8"):
    from wealy_tpu.cli.serve import QueryEngine
    from wealy_tpu.train.config import Config

    config = Config.from_dict({
        "path": {"lyric_covers_data": "/nonexistent", "hidden_states": "/n",
                 "cache": "/n"},
        "data": {"dataset_name": "lyric-covers",
                 "embedding_type": "last_hidden_states",
                 "embedding_format": "concat", "chunk_size": 8},
        "model": {"name": "whisper", "zdim": zdim},
    })
    rng = np.random.default_rng(7)
    seq = rng.normal(size=(16, 24)).astype(np.float32)  # ~10 query chunks
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        for n in sizes:
            idx = Path(td) / f"idx{n}.npz"
            t0 = time.perf_counter()
            build_index_big(idx, n, zdim)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            eng = QueryEngine(config, str(idx), None, quantize=quantize)
            t_load = time.perf_counter() - t0
            gb = eng._sets_dev.nbytes / 1e9 + sum(
                s.nbytes for s in eng._scale_dev
            ) / 1e9
            for label, kw in (
                ("pooled_cosine", {"pooled": True}),
                ("exact_full_scan", {}),
                ("exact_rerank64", {"rerank": 64}),
            ):
                eng.search(seq, k=10, **kw)  # warmup/compile
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    eng.search(seq, k=10, **kw)
                    ts.append(time.perf_counter() - t0)
                print(json.dumps({
                    "corpus": n, "zdim": zdim, "quantize": quantize,
                    "scoring": label, "resident_gb": round(gb, 2),
                    "warm_ms_median": round(1e3 * sorted(ts)[len(ts) // 2], 1),
                    "warm_ms_best": round(1e3 * min(ts), 1),
                    "index_build_s": round(t_build, 1),
                    "engine_load_s": round(t_load, 1),
                }), flush=True)
            del eng
            idx.unlink()


if __name__ == "__main__":
    sizes = (
        tuple(int(s) for s in sys.argv[1].split(","))
        if len(sys.argv) > 1 else (200000, 1000000)
    )
    zd = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    qz = sys.argv[3] if len(sys.argv) > 3 else "int8"
    main(sizes, zd, None if qz in ("none", "f16") else qz)
