"""Background-thread prefetching for host -> device input pipelines.

The reference's DataLoader never actually enables workers
(lib/audio_dataset/dataloader.py:229-248 drops num_workers on the floor);
this is the real equivalent: a bounded-queue thread that keeps ``depth``
batches decoded/collated ahead of the training step, optionally moving them
to device (``jax.device_put`` with a sharding) so the TPU never waits on the
host.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


_SENTINEL = object()


def prefetch(
    iterable: Iterable,
    depth: int = 2,
    transform: Optional[Callable] = None,
) -> Iterator:
    """Iterate ``iterable`` on a background thread, ``depth`` items ahead.

    ``transform`` runs on the background thread (use it for collation and
    jax.device_put). Exceptions on the worker propagate to the consumer.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list[BaseException] = []
    stop = threading.Event()  # consumer abandoned us (e.g. max_steps break)

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not _put(transform(item) if transform is not None else item):
                    return
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            _put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # GeneratorExit / early break: release the worker promptly instead of
        # leaking a thread blocked on q.put
        stop.set()
