"""Double-buffered host -> device feeding.

The reference hides host latency behind torch DataLoader workers
(``train_img_horo.py:292-302``); TPU-natively the equivalent is a small
prefetch ring: a background thread pulls host batches (from any iterator,
e.g. :class:`stainlib_tpu.data.wsi.WsiSampler`), optionally packs them to
the planar layout in C++, and ``jax.device_put``s them ahead of the consumer
so the chip never waits on the host (SURVEY.md section 7 step 7).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np


class DevicePrefetcher:
    """Wraps a host batch iterator with an N-deep device-side buffer."""

    _DONE = object()

    def __init__(self, host_iter: Iterator, depth: int = 2,
                 transform: Optional[Callable] = None,
                 sharding=None):
        """``transform(batch) -> array(s)`` runs on the host thread (e.g.
        ``native.pack_planar``); ``sharding`` is an optional NamedSharding
        for multi-device placement."""
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None

        def worker():
            try:
                for batch in host_iter:
                    if transform is not None:
                        batch = transform(batch)
                    batch = jax.tree.map(
                        lambda a: jax.device_put(np.asarray(a), sharding),
                        batch,
                    )
                    self._q.put(batch)
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
