"""REAL 2-process ``jax.distributed`` proof of the SURVEY §5.8 multi-host
path (round-4 VERDICT missing #3).

Everything else multi-device in this suite runs in ONE process on virtual
devices; the seams that cannot exercise — per-process host data feeding a
global mesh, the global-batch loss all_gather crossing a process boundary,
``host_shard`` work partitioning, primary-host-only sidecar writes, and the
orbax save/restore collective — are driven here by two genuine OS processes
(4 virtual CPU devices each -> one 8-device global mesh) joined through a
localhost coordinator. See tests/multihost_worker.py for the per-process
assertions; this file asserts the cross-process invariants on the reports.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = Path(__file__).parent / "multihost_worker.py"
_REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cluster(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4 --xla_cpu_max_isa=AVX2"
    )
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # keep worker compiles out of the suite's persistent cache stats but
    # shared between the two workers (atomic-rename safe)
    env["JAX_COMPILATION_CACHE_DIR"] = str(_REPO / ".jax_test_cache")

    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(pid), "2", str(port),
             str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-4000:]}"

    reports = [
        json.loads((tmp_path / f"report_{pid}.json").read_text())
        for pid in range(2)
    ]

    # cluster formed: 2 processes x 4 local devices = 8 global
    for r in reports:
        assert r["info"]["process_count"] == 2
        assert r["info"]["local_devices"] == 4
        assert r["info"]["global_devices"] == 8

    # global-batch CLEWS loss crossed the process boundary and matched the
    # single-process value on the same logical batch — on BOTH processes
    for r in reports:
        assert abs(r["global_loss"] - r["ref_loss"]) < 1e-5
        assert abs(r["global_l_cont"] - r["ref_l_cont"]) < 1e-4
    assert reports[0]["ref_loss"] == reports[1]["ref_loss"]

    # host_shard: disjoint union covers the version list exactly once
    all_versions = [f"v{i:03d}" for i in range(11)]
    s0, s1 = reports[0]["host_shard"], reports[1]["host_shard"]
    assert not set(s0) & set(s1)
    assert sorted(s0 + s1) == all_versions
    assert abs(len(s0) - len(s1)) <= 1  # balanced to within one item

    # checkpoint: restorable on every process, one sidecar (primary-only)
    for r in reports:
        assert r["restored_step"] == 3
        assert r["sidecar"] == {"epoch": 1, "next_batch": 7}
    sidecars = list((tmp_path / "ckpt").glob("data_state_*.json"))
    assert len(sidecars) == 1  # written once, by process 0
