"""Multi-host initialization (SURVEY.md §5.8 — new vs the reference).

One call at program start on every host; afterwards ``jax.devices()`` spans
the full slice and the standard Mesh/pjit machinery in this package works
unchanged (collectives ride ICI within a slice, DCN across slices only at
host-input boundaries).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed when running multi-process; no-op (with a
    report) in single-process settings.

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly only for CPU/GPU multi-process testing.

    Must run BEFORE anything touches the XLA backend (jax.devices() etc.)
    — so the already-initialized probe reads jax.distributed's own client
    state instead of calling ``jax.process_count()`` (which would
    initialize the single-process backend and make the real initialize
    unreachable; caught by the 2-process test, tests/test_multihost.py).
    """
    try:
        from jax._src import distributed as _dist

        already = _dist.global_state.client is not None
    except Exception:  # private-API drift: fall back to re-init guard below
        already = False
    if not already and (coordinator_address or num_processes):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary_host() -> bool:
    return jax.process_index() == 0


def host_shard(seq, process_index: Optional[int] = None, process_count: Optional[int] = None):
    """Deterministic per-host work shard (round-robin, balanced to within
    one item): every host processes ``seq[process_index::process_count]``.

    The extraction drivers apply this to the version list so a pod-scale
    extract runs embarrassingly parallel per host; the embedding store is
    per-version files, so no write coordination is needed, and the
    missing-work census (store.verify) stays global.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(seq)[pi::pc]
