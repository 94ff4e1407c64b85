"""Serving-path latency: warm QueryEngine.search() against a synthetic
corpus index at several sizes, pooled-cosine vs exact chunk-set redux.

The engine and index are built in-process (the daemon's steady state); the
reported numbers are per-query wall times after one warmup, i.e. what a
`serve` daemon answers at. Query = a 10-chunk-set song (typical 4-5 min
track at 0.9-overlap chunking of a ~16-chunk sequence).

    python benchmarks/bench_serve.py [corpus_sizes,...] [zdim] [block_size]
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


def build_index(path: Path, n: int, zdim: int, smax: int = 10) -> None:
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(n, zdim)).astype(np.float32)
    np.savez(
        path,
        version_keys=np.asarray([f"v{i}" for i in range(n)]),
        cliques=np.asarray([f"c{i // 2}" for i in range(n)]),
        labels=(np.arange(n) // 2).astype(np.int32),
        ids=np.arange(n, dtype=np.int64),
        vecs=vecs,
        sets=rng.normal(size=(n, smax, zdim)).astype(np.float16),
        set_mask=np.ones((n, smax), bool),
        meta=np.asarray(json.dumps({
            "index_version": 1, "model": "whisper", "zdim": zdim,
            "split": "bench", "checkpoint_step": None,
            "embedding_file": "hs_last_seq.npz", "emb_dim": 24,
            "chunk_size": 8, "overlap": 0.9, "has_sets": True,
        })),
    )


def main(sizes=(1000, 10000, 50000), zdim=512, blk=512):
    from wealy_tpu.cli.serve import QueryEngine
    from wealy_tpu.train.config import Config

    config = Config.from_dict({
        "data": {"dataset_name": "lyric-covers",
                 "embedding_type": "last_hidden_states",
                 "embedding_format": "concat", "chunk_size": 8},
        "model": {"name": "whisper", "zdim": zdim},
    })
    rng = np.random.default_rng(1)
    seq = rng.normal(size=(16, 24)).astype(np.float32)  # -> ~10 chunks
    with tempfile.TemporaryDirectory(prefix="servebench_") as td:
        for n in sizes:
            idx = Path(td) / f"idx{n}.npz"
            build_index(idx, n, zdim)
            engine = QueryEngine(config, str(idx), None, block_size=blk)
            int8 = QueryEngine(config, str(idx), None, block_size=blk,
                               quantize="int8")
            host = QueryEngine(config, str(idx), None, block_size=blk,
                               resident=False)
            for label, eng, kw in (
                ("pooled_cosine", engine, {"pooled": True}),
                ("exact_resident_full_scan", engine, {}),
                ("exact_resident_rerank64", engine, {"rerank": 64}),
                ("exact_int8_full_scan", int8, {}),
                ("exact_host_full_scan", host, {}),
                ("exact_host_rerank64", host, {"rerank": 64}),
            ):
                if label == "exact_host_full_scan" and n > 10000:
                    # measured 15.6 s/query at 10K (per-query corpus upload
                    # scales linearly); skip the pointless quarter hour
                    print(json.dumps({"corpus": n, "scoring": label,
                                      "skipped": "O(N) upload per query"}),
                          flush=True)
                    continue
                eng.search(seq, k=10, **kw)  # warm/compile
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    eng.search(seq, k=10, **kw)
                    ts.append(time.perf_counter() - t0)
                print(json.dumps({
                    "corpus": n, "zdim": zdim, "scoring": label,
                    "block_size": blk,
                    "warm_ms_median": round(1e3 * sorted(ts)[len(ts) // 2], 1),
                    "warm_ms_best": round(1e3 * min(ts), 1),
                }), flush=True)
            # batched-query throughput: 16 queries per search_many dispatch
            # vs 16 sequential single-query searches (exact resident scan)
            seqs = [rng.normal(size=(16, 24)).astype(np.float32)
                    for _ in range(16)]
            engine.search_many(seqs, k=10)  # warm/compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                engine.search_many(seqs, k=10)
                ts.append(time.perf_counter() - t0)
            t_seq = []
            for _ in range(3):
                t0 = time.perf_counter()
                for s in seqs:
                    engine.search(s, k=10)
                t_seq.append(time.perf_counter() - t0)
            print(json.dumps({
                "corpus": n, "zdim": zdim,
                "scoring": "exact_resident_full_scan",
                "batch": len(seqs),
                "batched_qps": round(len(seqs) / min(ts), 1),
                "sequential_qps": round(len(seqs) / min(t_seq), 1),
            }), flush=True)


if __name__ == "__main__":
    sizes = (
        tuple(int(s) for s in sys.argv[1].split(","))
        if len(sys.argv) > 1 else (1000, 10000, 50000)
    )
    zd = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    bs = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    main(sizes, zd, bs)
