"""Host-side input prefetching.

The reference overlaps input work with compute via DataLoader workers +
pin_memory (train_adv…:119-125). Here the equivalent is a small
background-thread pipeline: host batches are assembled ahead of time on a
queue while the device executes the (async-dispatched) previous step, so the
TPU never waits on numpy slice stacking.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


class PrefetchIterator:
    """Wrap an iterable of host batches with an N-deep background queue."""

    _SENTINEL = object()

    def __init__(self, iterable: Iterable, depth: int = 2,
                 transform: Optional[Callable] = None):
        self._iterable = iterable
        self._depth = depth
        self._transform = transform

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        err: list = []

        def producer():
            try:
                for item in self._iterable:
                    if self._transform is not None:
                        item = self._transform(item)
                    q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(self._SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._SENTINEL:
                if err:
                    raise err[0]
                return
            yield item


def prefetch(iterable: Iterable, depth: int = 2,
             transform: Optional[Callable] = None) -> PrefetchIterator:
    return PrefetchIterator(iterable, depth, transform)
