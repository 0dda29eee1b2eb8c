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
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._items:
                self._q.put((self._produce(item), item))
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put((None, None))

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
