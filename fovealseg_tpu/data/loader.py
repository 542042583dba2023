"""Host input pipeline: RAM cache + background prefetch to device.

TPU-native replacement for the reference's loading machinery: the
whole-dataset RAM cache of ``CustomDataLoader``
(/root/reference/DynamicFocus/e_preprocess_scripts/a_preprocess_tools.py:
44-91, parallel twin a_preprocess_tools_parallel.py:46-109 using
multiprocessing shared memory), the vendored torch-0.4 worker dataloader
(lib/utils/data/dataloader.py), and the CUDA-stream ``async_copy_to``
prefetch (lib/nn/parallel/data_parallel.py:13-24,82-96) — here a simple
thread that keeps N batches ahead, overlapping host prep with device steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


class AbstractDataset:
    """Minimal ABC mirroring a_preprocess_tools.AbstractDataset:25-42."""

    def __len__(self):  # pragma: no cover - interface
        raise NotImplementedError

    def __getitem__(self, idx):  # pragma: no cover - interface
        raise NotImplementedError


class CachedDataset(AbstractDataset):
    """Whole-dataset RAM cache (CustomDataLoader's cache semantics)."""

    def __init__(self, base):
        self.base = base
        self._cache: dict = {}

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx):
        if idx not in self._cache:
            self._cache[idx] = self.base[idx]
        return self._cache[idx]


def prefetch(iterable: Iterable, size: int = 2, transform: Callable | None = None) -> Iterator:
    """Run the iterable in a background thread, keeping ``size`` items ready
    (the async_copy_to spirit: host batch prep overlaps device compute)."""
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that aborts if the consumer abandoned the generator —
        # otherwise a `break` in the consumer leaves this thread blocked on
        # q.put forever, pinning size+1 prepared batches for the process life
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
                if not _put(transform(item) if transform else item):
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()  # unblock + terminate the worker on early exit
