"""Host-side batch prefetching.

JAX dispatch is asynchronous, so device compute already overlaps Python;
what does NOT overlap is the host-side collate work (padding, target
assembly in ``BatchFeed``) for the *next* batch.  ``prefetch_iter`` runs the
source iterator in a daemon thread with a small bounded queue so batch i+1
is collated while step i executes on the TPU — the standard input-pipeline
double buffer (the reference's analog is ``DataLoader(num_workers>0)``,
``train.py:28-29``, which it defaults to 0)."""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_END = object()


def prefetch_iter(source: Iterable, size: int = 2) -> Iterator:
    """Iterate ``source`` in a background thread, ``size`` items ahead.
    Exceptions in the source re-raise at the consuming site.  Abandoning the
    generator early (e.g. preemption mid-epoch) stops the producer rather
    than leaving it blocked forever on a full queue."""
    q: queue.Queue = queue.Queue(maxsize=max(size, 1))
    stop = threading.Event()

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
            for item in source:
                if not _put(item):
                    return
        except BaseException as e:  # noqa: BLE001 - propagate to consumer
            _put((_END, e))
            return
        _put((_END, None))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _END:
                if item[1] is not None:
                    raise item[1]
                return
            yield item
    finally:
        stop.set()
