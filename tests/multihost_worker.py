"""Worker process for the REAL 2-process jax.distributed multi-host test.

Launched by tests/test_multihost.py as two separate OS processes, each with
4 virtual CPU devices (``xla_force_host_platform_device_count=4``), joined
into one 8-device global mesh through ``jax.distributed`` — the DCN-boundary
semantics SURVEY.md §5.8 specifies, which a single-process virtual mesh
cannot exercise:

  1. per-process host data feeding a GLOBAL mesh
     (``jax.make_array_from_process_local_data``),
  2. global-batch CLEWS loss across processes == the single-process value
     on the same logical batch (the ``global_batch_loss`` all_gather rides
     the cross-process boundary for real),
  3. ``host_shard`` work partitioning covers the version list exactly once
     (disjoint union asserted by the parent),
  4. checkpoint save as a cross-process collective, sidecar written by the
     PRIMARY host only, restorable on every process.

Each process writes a JSON report to ``<outdir>/report_<pid>.json``; the
parent asserts the cross-process invariants on the pair of reports.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = Path(sys.argv[4])

    import jax

    # the axon sitecustomize pins the platform regardless of JAX_PLATFORMS;
    # override in-process (same pattern as tests/conftest.py), BEFORE
    # jax.distributed.initialize / first backend touch
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wealy_tpu.parallel.multihost import (
        host_shard,
        initialize_multihost,
        is_primary_host,
    )

    report: dict = {"pid": pid}

    # ---- 1. jax.distributed cluster formation -------------------------
    info = initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert info["process_count"] == nproc, info
    assert info["process_index"] == pid, info
    assert info["local_devices"] * nproc == info["global_devices"], info
    assert is_primary_host() == (pid == 0)
    report["info"] = info

    from wealy_tpu.losses import clews_loss
    from wealy_tpu.parallel.collectives import global_batch_loss
    from wealy_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()  # spans ALL global devices across both processes
    n_dev = info["global_devices"]

    # ---- 2. global-batch loss across processes ------------------------
    # The logical batch is a pure function of the seed, so every process
    # can materialize the FULL batch host-side for the reference value,
    # but feeds the mesh only its process-local shard.
    rng = np.random.default_rng(0)
    B, C = 32, 16
    labels = np.repeat(np.arange(B // 4), 4).astype(np.int32)
    idx = np.arange(B, dtype=np.int32)
    z = rng.normal(size=(B, C)).astype(np.float32)

    # single-process reference on local device 0 (no mesh involved)
    ref_loss, ref_ld = jax.jit(clews_loss)(labels, idx, z)
    report["ref_loss"] = float(ref_loss)

    # per-process host shard -> global sharded jax.Array on the data axis
    rows = B // nproc
    lo = pid * rows

    def globalize(a: np.ndarray) -> jax.Array:
        spec = P("data", *([None] * (a.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.ascontiguousarray(a[lo : lo + rows])
        )

    gl, gi, gz = globalize(labels), globalize(idx), globalize(z)
    gloss = jax.jit(global_batch_loss(clews_loss, mesh))
    loss, ld = gloss(gl, gi, gz)
    report["global_loss"] = float(loss)
    report["global_l_cont"] = float(ld["l_cont"])
    report["ref_l_cont"] = float(ref_ld["l_cont"])
    assert abs(float(loss) - float(ref_loss)) < 1e-5, (
        f"global-batch loss {float(loss)} != single-process {float(ref_loss)}"
    )

    # ---- 3. host_shard covers the work list exactly once --------------
    versions = [f"v{i:03d}" for i in range(11)]
    report["host_shard"] = host_shard(versions)  # real process_index/count

    # ---- 4. checkpoint: collective save, primary-only sidecar ---------
    from wealy_tpu.train.checkpoint import CheckpointManager
    from wealy_tpu.train.state import TrainState, make_optimizer

    ckdir = outdir / "ckpt"
    params = {"w": jnp.asarray(z[:4]), "b": jnp.zeros((C,), jnp.float32)}
    # replicate across the global mesh so every process is a data holder
    params = jax.device_put(params, NamedSharding(mesh, P()))
    tx = make_optimizer(max_steps=10, warmup_steps=1)
    # every leaf (opt moments included) must be a GLOBAL array for the
    # multi-host orbax save collective — replicate over the global mesh,
    # exactly what the CLI resume path does with replicated(mesh)
    state = TrainState(
        step=jnp.asarray(3, jnp.int32),
        params=params,
        opt_state=jax.device_put(tx.init(params), NamedSharding(mesh, P())),
        tx=tx,
    )
    mgr = CheckpointManager(ckdir)
    mgr.save_state(state, data_state={"epoch": 1, "next_batch": 7})

    # restore into a zeroed template on every process; values must round-trip
    zeroed = state.replace(
        step=jnp.asarray(0, jnp.int32),
        params=jax.device_put(
            jax.tree_util.tree_map(jnp.zeros_like, params),
            NamedSharding(mesh, P()),
        ),
    )
    restored = mgr.restore_state(zeroed)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(restored.params["w"])), z[:4], rtol=0, atol=0
    )
    assert int(restored.step) == 3
    ds = mgr.restore_data_state()
    assert ds == {"epoch": 1, "next_batch": 7}, ds
    report["restored_step"] = int(restored.step)
    report["sidecar"] = ds

    out = outdir / f"report_{pid}.json"
    out.write_text(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
