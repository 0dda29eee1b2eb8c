"""Background-thread batch prefetcher.

The reference overlaps input work with compute via torch DataLoader
worker processes (`/root/reference/src/runner/trainer.py:49-58`). Here
a single daemon thread prepares the next raw canvas batch (numpy
assembly + host->device transfer) while the device executes the current
step — numpy/cv2 and the transfer release the GIL, so even a 1-core
host gets real overlap. Device-side augmentation means this is the ONLY
host work per step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


class Prefetcher:
    """Wraps an iterator of work-items with a producer thread.

    Args:
      items: iterable of work descriptors (e.g. (idx, valid) tuples).
      produce: callable turning a descriptor into a ready batch (host
        assembly + jax.device_put).
      depth: max batches staged ahead.
    """

    def __init__(self, items: Iterable, produce: Callable, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._items = list(items)
        self._produce = produce
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._items:
                if self._stop.is_set():
                    return
                batch = self._produce(item)
                # bounded put that stays responsive to close(): an
                # abandoned consumer must not leave this thread blocked
                # forever holding device buffers
                while not self._stop.is_set():
                    try:
                        self._q.put((batch, item), timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            # the end-of-items sentinel must be DELIVERED (a dropped
            # sentinel leaves the consumer blocked on q.get forever once
            # it drains the staged batches) — block like a normal put,
            # but stay responsive to close() (whose drain makes room)
            while not self._stop.is_set():
                try:
                    self._q.put((None, None), timeout=0.2)
                    break
                except queue.Full:
                    continue

    def close(self):
        """Stop producing and join the thread. Call when abandoning
        iteration early (consumer exception): otherwise the producer
        keeps staging batches and then blocks on the bounded queue for
        the process lifetime. Idempotent."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=10.0)

    def __iter__(self) -> Iterator:
        n = 0
        while True:
            batch, item = self._q.get()
            if batch is None:
                if self._err is not None:
                    raise self._err
                assert n == len(self._items), (n, len(self._items))
                return
            n += 1
            yield batch, item
