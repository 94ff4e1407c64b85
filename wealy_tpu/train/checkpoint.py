"""Orbax checkpointing for model/optimizer state (new vs the reference, which
only persists dataset state — SURVEY.md §5.4).

Sharded layouts are first-class: saving accepts mesh-sharded jax.Arrays
(TP/DP param layouts) as-is, and ``restore_state`` rebuilds each leaf with
the SAME sharding as the live template state (abstract
``jax.ShapeDtypeStruct`` templates carrying shardings), so a
tensor-parallel run resumes into its sharded layout without a host-side
gather/rescatter round-trip."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: save/restore TrainState pytrees by step, keep_n."""

    def __init__(self, directory: str | Path, keep_n: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=keep_n, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    # -- full-TrainState convenience (params + optimizer + step) ----------
    def save_state(self, state, data_state: Optional[dict] = None) -> None:
        """Persist a TrainState's resumable parts (tx itself is code).

        ``data_state`` (JSON-able; e.g. ``{"epoch": e, "next_batch": b}``
        from the seekable sampler stream) is written as a sidecar so a
        resumed run continues the exact data order of the uninterrupted
        one.

        Multi-host: call from EVERY process (the orbax save is a
        collective — orbax coordinates so array data is written once); the
        JSON sidecar is written by the primary host only (two hosts
        replacing the same tmp path on a shared checkpoint FS would race).
        """
        payload = {
            "step": int(state.step),
            "params": state.params,
            "opt_state": state.opt_state,
        }
        if state.batch_stats is not None:
            payload["batch_stats"] = state.batch_stats
        self.save(int(state.step), payload)
        if data_state is not None and jax.process_index() == 0:
            import json

            p = self.directory / f"data_state_{int(state.step)}.json"
            tmp = p.with_suffix(".json.tmp")
            tmp.write_text(json.dumps(data_state))
            tmp.replace(p)

    def restore_data_state(self, step: Optional[int] = None) -> Optional[dict]:
        """The data-order sidecar saved with ``save_state``, or None (older
        checkpoints / callers that did not track data order)."""
        import json

        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        p = self.directory / f"data_state_{int(step)}.json"
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def restore_state(self, state):
        """Restore into an initialized TrainState, preserving each leaf's
        sharding (TP/DP layouts restore sharded — round 1 gap)."""
        import jax.numpy as jnp

        template = {
            "step": int(state.step),
            "params": _abstract_like(state.params),
            "opt_state": _abstract_like(state.opt_state),
        }
        if state.batch_stats is not None:
            template["batch_stats"] = _abstract_like(state.batch_stats)
        restored = self.restore(template=template)
        return state.replace(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=restored["params"],
            opt_state=restored["opt_state"],
            batch_stats=restored.get("batch_stats", state.batch_stats),
        )


def _abstract_like(tree):
    """Array leaves -> ShapeDtypeStruct carrying the leaf's sharding, so
    orbax restores directly into the live (possibly TP-sharded) layout."""

    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    return jax.tree_util.tree_map(leaf, tree)
