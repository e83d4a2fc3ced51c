"""Host-side input pipeline utilities (B3 tail: keep device batches in
flight).

The reference uses Chainer's MultiprocessIterator to overlap batch prep with
training (SURVEY.md §3.1). TPU-native equivalent on this single-core host:
a daemon-thread prefetcher that keeps `depth` host batches queued while the
device runs ahead asynchronously, so np.load/memcpy work overlaps device
execution instead of serializing with it.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator


class ThreadedPrefetcher:
    """Wraps any batch iterator; prefetches `depth` batches on a daemon
    thread. Iteration order is preserved. Exceptions propagate to the
    consumer."""

    _SENTINEL = object()

    def __init__(self, it: Iterator[Any], depth: int = 2):
        self._q: "queue.Queue[Any]" = queue.Queue(maxsize=max(1, depth))
        self._err: Exception | None = None
        self._stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that gives up once close() raised the stop flag
            (a plain blocking put can deadlock the worker forever when the
            consumer stops draining — e.g. depth=1 at close time)."""
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in it:
                    if not put_or_stop(item):
                        return
            except Exception as e:  # noqa: BLE001 — re-raised on consumer side
                self._err = e
            finally:
                put_or_stop(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # drain so a worker mid-put can finish; its next put sees the stop
        # flag and gives up, so the thread (and the iterator it holds —
        # mmap'd stores, open files) always terminates
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)
