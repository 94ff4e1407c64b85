"""A/B benchmark: fused Pallas bpwr redux vs the XLA knockout loop inside
corpus-scale chunk-set ranking (streaming_relevant_ranks).

Usage: python benchmarks/bench_fused_redux.py [N] [Q] [SMAX] [DIM] [BUDGET_MB]

Builds a clique-structured synthetic corpus of N chunk sets (variable valid
chunk counts up to SMAX), ranks Q of them as queries with exact chunk-set
bpwr scoring, and times the whole ranking wall-clock (the quantity the
`evaluate --streaming --chunk-sets` CLI pays) with the fused kernel ON vs
OFF. Asserts MAP/MR1 agreement between the arms. Runs on whatever backend is
default (the axon TPU in this environment; off-TPU the fused arm is the XLA
identity, so the A/B only makes sense on-chip)."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    argv = sys.argv[1:]
    N = int(argv[0]) if len(argv) > 0 else 8192
    Q = int(argv[1]) if len(argv) > 1 else 2048
    SMAX = int(argv[2]) if len(argv) > 2 else 18
    DIM = int(argv[3]) if len(argv) > 3 else 64
    BUDGET = float(argv[4]) if len(argv) > 4 else 64.0

    import jax

    from wealy_tpu.cli.main import _set_block_size
    from wealy_tpu.parallel.similarity import (
        map_from_ranks,
        streaming_relevant_ranks,
    )

    rng = np.random.default_rng(0)
    n_cliques = max(2, N // 4)
    labels = rng.integers(0, n_cliques, size=N)
    centers = rng.normal(size=(n_cliques, DIM)).astype(np.float32)
    sets = centers[labels][:, None, :] + 0.6 * rng.normal(
        size=(N, SMAX, DIM)
    ).astype(np.float32)
    n_chunks = rng.integers(max(1, SMAX // 3), SMAX + 1, size=N)
    mask = np.arange(SMAX)[None, :] < n_chunks[:, None]
    ids = np.arange(N)
    blk = _set_block_size(SMAX, budget_mb=BUDGET)
    print(
        f"backend={jax.default_backend()} N={N} Q={Q} smax={SMAX} dim={DIM} "
        f"block={blk}", file=sys.stderr,
    )

    out = {"N": N, "Q": Q, "smax": SMAX, "dim": DIM, "block": blk,
           "backend": jax.default_backend()}
    metrics = {}
    for fused in (True, False):
        arm = "fused" if fused else "xla"

        def run():
            return streaming_relevant_ranks(
                sets[:Q], sets, labels[:Q], labels,
                mode="cos", redux="bpwr",
                query_mask=mask[:Q], corpus_mask=mask,
                block_size=blk, query_block=blk,
                query_idx=ids[:Q], corpus_idx=ids,
                fused_redux=fused,
            )

        # cold call includes the (remote) jit compile; the warm second call
        # is the steady-state number production evaluate pays per slab
        t0 = time.perf_counter()
        ranks, n_rel = run()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        ranks, n_rel = run()
        warm = time.perf_counter() - t0
        m = map_from_ranks(ranks, n_rel)
        out[f"{arm}_cold_s"] = round(cold, 2)
        out[f"{arm}_s"] = round(warm, 2)
        metrics[arm] = m
        print(f"{arm}: cold {cold:.2f}s warm {warm:.2f}s "
              f"MAP={m['MAP']:.6f} MR1={m['MR1']:.2f}", file=sys.stderr)

    out["speedup"] = round(out["xla_s"] / max(out["fused_s"], 1e-9), 2)
    out["map_agree"] = bool(
        abs(metrics["fused"]["MAP"] - metrics["xla"]["MAP"]) < 1e-4
        and abs(metrics["fused"]["MR1"] - metrics["xla"]["MR1"]) < 1e-2
    )
    print(json.dumps(out))
    if not out["map_agree"]:
        print("FAIL: fused and XLA arms diverge on MAP/MR1", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
