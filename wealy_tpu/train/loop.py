"""Training loop: sampler epochs -> collate -> device -> jitted step.

Host-side orchestration only; all math lives in the jitted step. Metrics go
through the ``(loss, logdict)`` channel to a pluggable writer (SURVEY.md §5.5:
"route logdicts to a real metrics writer").
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from wealy_tpu.data.chunking import collate_fixed_length
from wealy_tpu.data.sampler import CliqueSampler
from wealy_tpu.train.state import TrainState


class MetricsWriter:
    """Metrics sink for the (loss, logdict) channel: in-memory history,
    periodic printing, and optional JSONL persistence (one record per step)."""

    #: drain the deferred-logdict buffer whenever it reaches this many steps
    #: (bounds host memory; by then the oldest steps are long since done)
    DRAIN_EVERY = 64

    def __init__(
        self,
        log_every: int = 50,
        printer: Callable[[str], None] = print,
        jsonl_path: Optional[str] = None,
    ):
        self.log_every = log_every
        self._history: list[dict] = []
        self._pending: list[tuple[int, dict]] = []
        self.printer = printer
        self._jsonl = open(jsonl_path, "a") if jsonl_path else None

    def write(self, step: int, logdict: dict) -> None:
        # Defer float() materialization: logdict leaves are device scalars, and
        # converting one blocks the host on that step's execution — a full
        # host<->device round trip PER STEP on remote backends (the axon
        # tunnel pays ~100 ms RTT). Buffer the raw dicts and drain at
        # print/JSONL/accessor boundaries so steps stay in flight.
        import time

        # stamp at write() time (host dispatch of this step), NOT at drain
        # time — inter-record deltas in the JSONL then profile the input
        # pipeline's sustained rate even though materialization is deferred
        self._pending.append((step, time.time(), logdict))
        if (self.log_every and step % self.log_every == 0) or len(
            self._pending
        ) >= self.DRAIN_EVERY:
            self._drain()
            if self.log_every and step % self.log_every == 0:
                scalars = self._history[-1]
                parts = " ".join(
                    f"{k}={v:.4g}" for k, v in scalars.items()
                    if k not in ("step", "t")
                )
                self.printer(f"[step {step}] {parts}")

    def _drain(self) -> None:
        for step, t_write, logdict in self._pending:
            scalars = {
                k: float(v) for k, v in logdict.items() if np.ndim(v) == 0
            }
            scalars["step"] = step
            scalars["t"] = t_write
            self._history.append(scalars)
            if self._jsonl is not None:
                import json

                self._jsonl.write(json.dumps(scalars) + "\n")
        if self._pending and self._jsonl is not None:
            self._jsonl.flush()
        self._pending.clear()

    @property
    def history(self) -> list[dict]:
        """Materialized per-step scalar records (drains deferred logdicts)."""
        self._drain()
        return self._history

    def close(self) -> None:
        self._drain()
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None


def batch_to_device(batch, flatten: bool = True,
                    transfer_dtype=np.float16) -> dict:
    """Collated Batch -> the dict layout the train step consumes.

    ``emb`` ships as ``transfer_dtype`` (default float16 — the embedding
    store's DISK dtype, so the cast is bit-lossless for store-sourced values:
    load upcasts fp16->f32, collate only windows/pads, and the sampler's
    augment merely shuffles order). Halving the transfer bytes matters both
    through remote-dispatch tunnels and on the multi-chip host->HBM input
    path; the jitted step upcasts to f32 on device
    (:func:`wealy_tpu.train.step.upcast_batch`)."""
    labels, ids, emb, mask = batch.flatten_versions()
    return {
        "labels": np.asarray(labels, np.int32),
        "ids": np.asarray(ids, np.int32),
        "emb": np.asarray(emb, transfer_dtype),
        "mask": np.asarray(mask),
    }


def fit(
    state: TrainState,
    train_step: Callable,
    sampler: CliqueSampler,
    *,
    batch_size: int = 32,
    chunk_size: int = 1000,
    max_steps: int = 1000,
    epochs: Optional[int] = None,
    writer: Optional[MetricsWriter] = None,
    checkpoint_manager=None,
    checkpoint_every: int = 1000,
    rng: Optional[np.random.Generator] = None,
    make_batch: Optional[Callable] = None,
    eval_fn: Optional[Callable] = None,
    eval_every: int = 1000,
    mesh=None,
    prefetch_depth: int = 2,
    data_seed: Optional[int] = None,
    start_epoch: int = 0,
    start_batch: int = 0,
):
    """Run training until ``max_steps`` (or ``epochs``). Returns final state.

    ``make_batch(items) -> dict`` overrides the default single-modal collate
    (use wealy_tpu.train.multimodal adapters for the fusion models). It may
    take a second ``rng`` argument to receive the per-batch generator in
    seeded mode (below).

    ``mesh``: when given, every batch is ``shard_batch``-placed on the mesh's
    ``data`` axis before the step — multi-chip training is default-correct
    with no caller-side input wiring. Collation + device placement run on a
    background prefetch thread (``prefetch_depth`` batches ahead), so the
    host input path overlaps device steps.

    ``eval_fn(state) -> dict`` runs every ``eval_every`` steps; its scalars are
    written to the metrics stream prefixed ``val_`` (the conf.train.eval_every
    channel of the implied reference driver, SURVEY.md §5.6).

    ``data_seed``: when given, batches come from the sampler's seekable
    deterministic stream (``epoch_batches``: batch ``b`` of epoch ``e`` is a
    pure function of ``(seed, e, b)``), checkpoints carry a
    ``{"epoch", "next_batch"}`` data-state sidecar, and ``start_epoch`` /
    ``start_batch`` (from ``CheckpointManager.restore_data_state``) resume
    the exact data order of the uninterrupted run — loss trajectories match
    bit-for-bit. Without it, data order is the legacy stateful-rng stream
    and resume replays epochs from the top.

    Checkpoints (periodic AND a final one at loop exit) are written with
    ``save_state`` — ONE payload format ({step, params, opt_state
    [, batch_stats]}), restorable sharding-preserving via ``restore_state``.
    """
    import inspect

    from wealy_tpu.utils.prefetch import prefetch

    writer = writer or MetricsWriter()
    rng = rng or np.random.default_rng(data_seed or 0)
    if make_batch is None:

        def make_batch(items, brng=None):
            return batch_to_device(
                collate_fixed_length(
                    items, chunk_size=chunk_size, use_random_chunks=True,
                    rng=brng if brng is not None else rng,
                )
            )

        takes_rng = True
    else:
        try:
            takes_rng = len(inspect.signature(make_batch).parameters) >= 2
        except (TypeError, ValueError):
            takes_rng = False

    seeded = data_seed is not None
    if mesh is not None:
        from wealy_tpu.train.step import shard_batch

    def produce(entry):
        if seeded:
            _, brng, items = entry
            batch = make_batch(items, brng) if takes_rng else make_batch(items)
        else:
            batch = make_batch(entry, None) if takes_rng else make_batch(entry)
        if mesh is not None:
            return shard_batch(batch, mesh)
        # single-device: complete the host->device transfer ON the prefetch
        # thread so the step loop never waits for input bytes (with
        # prefetch_depth=2 the transfer of batch N+1 overlaps step N; through
        # a remote-dispatch tunnel the transfer, not the step, is the cost)
        import jax

        placed = jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x)), batch
        )
        jax.block_until_ready(placed)
        return placed

    step = int(state.step)
    epoch = int(start_epoch)
    first_start = int(start_batch)
    epochs_run = 0
    done = False
    saved_at = None
    data_state = None
    while not done and (epochs is None or epochs_run < epochs):
        if seeded:
            n_avail = sampler.n_batches(batch_size)
            if first_start >= n_avail > 0:
                # resumed exactly at an epoch boundary
                epoch += 1
                first_start = 0
                continue
            stream = sampler.epoch_batches(epoch, batch_size, first_start)
            b_iter = iter(sampler_b for sampler_b in range(first_start, n_avail))
        else:
            stream = sampler.epoch(shuffle=True, batch_size=batch_size)
            b_iter = None
        batches = prefetch(stream, depth=prefetch_depth, transform=produce)
        n_batches = 0
        for batch in batches:
            b = next(b_iter) if b_iter is not None else None
            n_batches += 1
            state, logdict = train_step(state, batch)
            step += 1
            writer.write(step, logdict)
            if eval_fn is not None and step % eval_every == 0:
                val = eval_fn(state)
                writer.write(step, {f"val_{k}": v for k, v in val.items()})
            if seeded:
                data_state = {"epoch": epoch, "next_batch": b + 1,
                              "data_seed": data_seed, "batch_size": batch_size}
            if checkpoint_manager is not None and step % checkpoint_every == 0:
                checkpoint_manager.save_state(state, data_state=data_state)
                saved_at = step
            if step >= max_steps:
                done = True
                break
        if n_batches == 0 and not done:
            # an empty epoch would otherwise spin this loop forever
            # (drop_last semantics: a dataset smaller than batch_size yields
            # zero batches) — fail loudly instead
            raise ValueError(
                f"sampler produced no batches: {len(sampler.versions)} items "
                f"with batch_size={batch_size} (incomplete batches are "
                f"dropped). Reduce train.batch_size or check dataset filters."
            )
        epoch += 1
        epochs_run += 1
        first_start = 0
    if checkpoint_manager is not None and saved_at != step:
        checkpoint_manager.save_state(state, data_state=data_state)
    return state, writer
