"""Pack-on-extract IO A/B (round-2 VERDICT item 8): per-version npz write +
re-read repack (`extract --pack`) vs direct-to-packed streaming
(`extract --pack-direct`, PackWriter sink).

Pure-IO measurement with the model path mocked out: the write-side cost is
what the flag eliminates, everything else is identical. Run:

    python benchmarks/bench_pack_direct.py [n_versions] [rows] [dim]
"""

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wealy_tpu.data.embedding_store import EmbeddingStore
from wealy_tpu.data.packed_store import PackWriter, pack_from_store


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 1280
    rng = np.random.default_rng(0)
    embs = [rng.normal(size=(rows, dim)).astype(np.float32) for _ in range(64)]
    keys = [str(100000 + i) for i in range(n)]

    root = Path(tempfile.mkdtemp(prefix="packbench_"))
    try:
        # route A: per-version npz, then repack (re-reads every npz)
        store = EmbeddingStore(root / "a", "lyric-covers")
        t0 = time.perf_counter()
        for i, k in enumerate(keys):
            store.save(k, "hs_last_seq.npz", embeddings=embs[i % 64])
        t_npz = time.perf_counter() - t0
        t0 = time.perf_counter()
        packed_a = pack_from_store(
            store, keys, "hs_last_seq.npz", root / "a",
            dataset_name="lyric-covers",
        )
        t_repack = time.perf_counter() - t0

        # route B: direct-to-packed (the --pack-direct sink)
        t0 = time.perf_counter()
        writer = PackWriter(root / "b", "hs_last_seq", dataset_name="lyric-covers")
        for i, k in enumerate(keys):
            writer.add(k, embs[i % 64])
        packed_b = writer.close()
        t_direct = time.perf_counter() - t0

        assert len(packed_a) == len(packed_b) == n
        np.testing.assert_allclose(
            packed_a.load(keys[7]), packed_b.load(keys[7])
        )
        mb = n * rows * dim * 2 / 1e6
        print(json.dumps({
            "n_versions": n, "payload_mb_fp16": round(mb, 1),
            "npz_write_s": round(t_npz, 2),
            "repack_s": round(t_repack, 2),
            "npz_plus_repack_s": round(t_npz + t_repack, 2),
            "direct_pack_s": round(t_direct, 2),
            "speedup": round((t_npz + t_repack) / t_direct, 1),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
