"""Concurrent-client daemon throughput: N independent HTTP clients at Q=1
each vs the serve daemon, micro-batching ON (--batch-window-ms) vs OFF (0).

The round-4 state of the daemon answered concurrent clients one-by-one under
the search lock, leaving the measured 7x batched-dispatch win (bench_serve
Q=16) reachable only by a client that composed its own batch; the
MicroBatcher composes it daemon-side. This bench reports:

  - concurrent arm: N parallel clients, R rounds each — aggregate q/s for
    window 0 (per-arrival dispatch) vs the batching window;
  - latency-floor arm: ONE idle client's per-query wall, both windows —
    the price an isolated query pays for the collection window.

    python benchmarks/bench_serve_concurrent.py [N_SONGS] [CLIENTS] [ROUNDS] [WINDOW_MS]

Runs against the default backend (the axon TPU chip here; functional off-TPU).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.bench_serve import build_index  # noqa: E402


def _start_daemon(cpath, idx, window_ms: float, max_batch: int = 32):
    proc = subprocess.Popen(
        [sys.executable, "-m", "wealy_tpu.cli.main", "serve",
         "--config", str(cpath), "--index", str(idx), "--port", "0",
         "--batch-window-ms", str(window_ms), "--max-batch", str(max_batch)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    url = json.loads(proc.stdout.readline())["serving"]
    return proc, url


def _query(url, seq, k=10, timeout=600):
    req = urllib.request.Request(
        f"{url}/query",
        data=json.dumps({"embeddings": seq, "k": k}).encode(),
        headers={"Content-Type": "application/json"},
    )
    return json.loads(urllib.request.urlopen(req, timeout=timeout).read())


def _query_batch(url, seqs, q, k=10, timeout=600):
    req = urllib.request.Request(
        f"{url}/query",
        data=json.dumps({
            "batch": [{"embeddings": seqs[i % len(seqs)]} for i in range(q)],
            "k": k,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    return json.loads(urllib.request.urlopen(req, timeout=timeout).read())


def _run_arm(url, seqs, clients: int, rounds: int) -> float:
    """Aggregate q/s: ``clients`` threads, each posting ``rounds`` single
    queries back-to-back (independent client behavior, no client batching)."""
    errs: list = []

    def client(i):
        try:
            for r in range(rounds):
                _query(url, seqs[(i + r) % len(seqs)])
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    if errs:
        raise errs[0]
    return clients * rounds / wall


def main() -> int:
    argv = sys.argv[1:]
    n_songs = int(argv[0]) if len(argv) > 0 else 10000
    clients = int(argv[1]) if len(argv) > 1 else 8
    rounds = int(argv[2]) if len(argv) > 2 else 6
    window_ms = float(argv[3]) if len(argv) > 3 else 10.0

    rng = np.random.default_rng(1)
    seqs = [rng.normal(size=(16, 24)).astype(np.float32).tolist()
            for _ in range(clients)]

    with tempfile.TemporaryDirectory(prefix="servecc_") as td:
        idx = Path(td) / "idx.npz"
        build_index(idx, n_songs, 512)
        cpath = Path(td) / "conf.json"
        cpath.write_text(json.dumps({
            "data": {"dataset_name": "lyric-covers",
                     "embedding_type": "last_hidden_states",
                     "embedding_format": "concat", "chunk_size": 8},
            "model": {"name": "whisper", "zdim": 512},
        }))

        out = {"corpus": n_songs, "clients": clients, "rounds": rounds,
               "window_ms": window_ms}
        # serialized arm = max_batch 1 (the pre-microbatcher behavior:
        # one query per locked dispatch); window=0 alone still coalesces
        # whatever queued during the previous dispatch
        for arm, w, mb in (("serialized", 0.0, 1),
                           ("microbatched", window_ms, 32)):
            proc, url = _start_daemon(cpath, idx, w, mb)
            try:
                # warm every Qp pad bucket the batched arm can hit
                # (search_many pads Q to {1, 4, 8, ...}: a cold shape mid-
                # run would charge a remote compile to the throughput arm)
                for q in ({1} if mb == 1 else {1, 4, 8, 12, 16, 20, 24, 32}):
                    _query_batch(url, seqs, min(q, len(seqs)))
                out[f"{arm}_qps"] = round(
                    _run_arm(url, seqs, clients, rounds), 1
                )
                # idle-latency floor: one lone client, warm path
                ts = []
                for _ in range(7):
                    t0 = time.perf_counter()
                    _query(url, seqs[0])
                    ts.append(time.perf_counter() - t0)
                out[f"{arm}_idle_ms_median"] = round(
                    1e3 * sorted(ts)[len(ts) // 2], 1
                )
                h = json.loads(urllib.request.urlopen(
                    f"{url}/healthz", timeout=30).read())
                st = h.get("batch_stats", {})
                if st.get("dispatches"):
                    out[f"{arm}_mean_batch"] = round(
                        st["queries"] / st["dispatches"], 2
                    )
            finally:
                proc.terminate()
                proc.wait(timeout=30)
        out["speedup"] = round(
            out["microbatched_qps"] / max(out["serialized_qps"], 1e-9), 2
        )
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
