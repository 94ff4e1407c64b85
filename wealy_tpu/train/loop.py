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

    def __init__(
        self,
        log_every: int = 50,
        printer: Callable[[str], None] = print,
        jsonl_path: Optional[str] = None,
    ):
        self.log_every = log_every
        self.history: list[dict] = []
        self.printer = printer
        self._jsonl = open(jsonl_path, "a") if jsonl_path else None

    def write(self, step: int, logdict: dict) -> None:
        scalars = {
            k: float(v) for k, v in logdict.items() if np.ndim(v) == 0
        }
        scalars["step"] = step
        self.history.append(scalars)
        if self._jsonl is not None:
            import json

            self._jsonl.write(json.dumps(scalars) + "\n")
            self._jsonl.flush()
        if self.log_every and step % self.log_every == 0:
            parts = " ".join(
                f"{k}={v:.4g}" for k, v in scalars.items() if k != "step"
            )
            self.printer(f"[step {step}] {parts}")

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None


def batch_to_device(batch, flatten: bool = True) -> dict:
    """Collated Batch -> the dict layout the train step consumes."""
    labels, ids, emb, mask = batch.flatten_versions()
    return {
        "labels": np.asarray(labels, np.int32),
        "ids": np.asarray(ids, np.int32),
        "emb": np.asarray(emb, np.float32),
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
):
    """Run training until ``max_steps`` (or ``epochs``). Returns final state.

    ``make_batch(items) -> dict`` overrides the default single-modal collate
    (use wealy_tpu.train.multimodal adapters for the fusion models).

    ``mesh``: when given, every batch is ``shard_batch``-placed on the mesh's
    ``data`` axis before the step — multi-chip training is default-correct
    with no caller-side input wiring. Collation + device placement run on a
    background prefetch thread (``prefetch_depth`` batches ahead), so the
    host input path overlaps device steps.

    ``eval_fn(state) -> dict`` runs every ``eval_every`` steps; its scalars are
    written to the metrics stream prefixed ``val_`` (the conf.train.eval_every
    channel of the implied reference driver, SURVEY.md §5.6).
    """
    from wealy_tpu.utils.prefetch import prefetch

    writer = writer or MetricsWriter()
    rng = rng or np.random.default_rng(0)
    if make_batch is None:

        def make_batch(items):
            return batch_to_device(
                collate_fixed_length(
                    items, chunk_size=chunk_size, use_random_chunks=True, rng=rng
                )
            )

    if mesh is not None:
        from wealy_tpu.train.step import shard_batch

        def produce(items):
            return shard_batch(make_batch(items), mesh)
    else:
        produce = make_batch

    step = int(state.step)
    epoch = 0
    done = False
    while not done and (epochs is None or epoch < epochs):
        batches = prefetch(
            sampler.epoch(shuffle=True, batch_size=batch_size),
            depth=prefetch_depth,
            transform=produce,
        )
        n_batches = 0
        for batch in batches:
            n_batches += 1
            state, logdict = train_step(state, batch)
            step += 1
            writer.write(step, logdict)
            if eval_fn is not None and step % eval_every == 0:
                val = eval_fn(state)
                writer.write(step, {f"val_{k}": v for k, v in val.items()})
            if checkpoint_manager is not None and step % checkpoint_every == 0:
                checkpoint_manager.save(step, state)
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
    return state, writer
