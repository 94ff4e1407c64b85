"""`wealy_tpu doctor`: one-shot environment + project diagnostics.

The reference's observability is verbose prints scattered through dataset
constructors (SURVEY.md §5.5); this is the operational complement for the
TPU deployment: answers "why is nothing happening" in one command —
including the failure mode where the remote TPU backend hangs in its
retry loop (the probe runs in a daemon thread with a deadline, so doctor
REPORTS a wedged tunnel instead of wedging with it).

Prints one JSON object; exit 0 if no check FAILED (warnings allowed).
"""

from __future__ import annotations

import json
import os
import sys
import threading


def _probe_backend(timeout_s: float) -> dict:
    """Initialize the JAX backend + run one tiny op, bounded by a deadline.

    Backend setup happens in a daemon thread: a wedged remote tunnel (e.g.
    axon retrying `UNAVAILABLE: TPU backend setup error` forever) cannot be
    interrupted, but the main thread can stop waiting and report it.
    """
    out: dict = {}

    def probe():
        try:
            import jax
            import jax.numpy as jnp

            devs = jax.devices()
            x = jnp.ones((8, 8))
            float((x @ x)[0, 0])  # one real dispatch, not just discovery
            out["devices"] = [f"{d.platform}:{d.id}" for d in devs]
            out["default_backend"] = jax.default_backend()
            out["ok"] = True
        except Exception as e:  # noqa: BLE001 — report, don't crash
            out["ok"] = False
            out["error"] = str(e)[:300]

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return {
            "ok": False,
            "error": (
                f"backend init/dispatch still hanging after {timeout_s:.0f}s "
                "— remote TPU tunnel down or unreachable? "
                "(JAX_PLATFORMS=cpu runs host-only)"
            ),
        }
    return out


def _check_project(config) -> dict:
    from pathlib import Path

    checks: dict = {}
    paths = {
        "lyric_covers_data": config.path.lyric_covers_data,
        "shs_data": getattr(config.path, "shs_data", None),
        "discogs_vi_data": getattr(config.path, "discogs_vi_data", None),
        "hidden_states": config.path.hidden_states,
        "data": config.path.data,
        "cache": config.path.cache,
        "checkpoints": config.path.checkpoints,
    }
    checks["paths"] = {
        k: ("ok" if v and Path(v).exists() else ("missing" if v else "unset"))
        for k, v in paths.items()
    }
    try:
        from wealy_tpu.data.dataset import build_clean_dataset

        md, _ = build_clean_dataset(config, check_audio=False)
        checks["splits"] = {
            s: sum(len(v) for v in md.splits.get(s, {}).values())
            for s in ("train", "val", "test")
        }
    except Exception as e:  # noqa: BLE001
        checks["splits"] = {"error": str(e)[:300]}
    try:
        from wealy_tpu.data.packed_store import PackedStore
        from wealy_tpu.data.paths import embedding_filename

        kind = embedding_filename(
            config.data.embedding_type, config.data.embedding_format
        ).removesuffix(".npz")
        pack = PackedStore(
            config.path.hidden_states, kind,
            dataset_name=config.data.dataset_name,
        )
        checks["pack"] = {
            "kind": kind,
            "available": bool(pack.available),
            "versions": len(pack._index) if pack.available else 0,
        }
    except Exception as e:  # noqa: BLE001
        checks["pack"] = {"error": str(e)[:300]}
    if config.path.checkpoints:
        try:
            from wealy_tpu.train.checkpoint import CheckpointManager

            step = CheckpointManager(config.path.checkpoints).latest_step()
            checks["checkpoint_step"] = step
        except Exception as e:  # noqa: BLE001
            checks["checkpoint_step"] = f"error: {str(e)[:200]}"
    return checks


def cmd_doctor(args) -> int:
    report: dict = {
        "python": sys.version.split()[0],
        "jax_platforms_env": os.environ.get("JAX_PLATFORMS"),
    }
    try:
        from wealy_tpu import native

        report["native"] = {
            "host_lib": native.available(),
            "mp3": native.mp3_available() if native.available() else False,
        }
    except Exception as e:  # noqa: BLE001
        report["native"] = {"error": str(e)[:200]}
    report["backend"] = _probe_backend(args.backend_timeout)
    if args.config:
        from wealy_tpu.cli.main import _load_config

        try:
            report["project"] = _check_project(_load_config(args.config))
        except Exception as e:  # noqa: BLE001
            report["project"] = {"error": str(e)[:300]}
    failed = not report["backend"].get("ok", False)
    report["ok"] = not failed
    print(json.dumps(report))
    return 0 if report["ok"] else 1
