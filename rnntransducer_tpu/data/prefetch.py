"""Host -> device prefetching.

Capability-equivalent of the reference's DataLoader worker + pin_memory feed
(``datamodule.py:198-220``) re-targeted at TPU: a background thread prepares
and `device_put`s the next batches (split over the data mesh when given) while
the current step runs, double/triple-buffering HBM (SURVEY.md §2.2 N8).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax

from rnntransducer_tpu.parallel.mesh import batch_sharding


class DevicePrefetcher:
    """Wrap a host batch iterator; yields device-resident batches."""

    _SENTINEL = object()

    def __init__(self, host_iter: Iterator, mesh=None, size: int = 2,
                 put_fn: Optional[Callable] = None):
        if put_fn is not None:
            self._put = put_fn
        elif mesh is not None:
            sharding = batch_sharding(mesh)
            if jax.process_count() > 1:
                # multi-host: each process holds its local slice of the
                # global batch; assemble the global array from local shards
                self._put = lambda b: jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        sharding, x), b)
            else:
                self._put = lambda b: jax.tree.map(
                    lambda x: jax.device_put(x, sharding), b)
        else:
            self._put = lambda b: jax.tree.map(jax.device_put, b)
        self._q: queue.Queue = queue.Queue(maxsize=size)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker,
                                        args=(host_iter,), daemon=True)
        self._thread.start()

    def _worker(self, host_iter):
        try:
            for batch in host_iter:
                self._q.put(self._put(batch))
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
