"""Host -> device prefetching.

Capability-equivalent of the reference's DataLoader worker + pin_memory feed
(``datamodule.py:198-220``) re-targeted at TPU: a background thread prepares
and `device_put`s the next batches (split over the data mesh when given) while
the current step runs, double/triple-buffering HBM (SURVEY.md §2.2 N8).
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional

import jax


def ordered_readahead(thunks: Iterable[Callable], workers: int = 2,
                      depth: int = 4) -> Iterator:
    """Execute ``thunks`` (zero-arg callables) on a small thread pool with
    at most ``depth`` in flight, yielding results IN ORDER.

    The shard-parallel feed stage (round-5, VERDICT r4 item 4): at
    100k-utterance scale each batch's Arrow fetch touches cold
    memory-mapped pages and the single prefetch thread serializes those
    page-fault IO waits with collate + device_put (BASELINE.md "Scaled
    Trainer soak": p50 333.7 ms vs 256.5 hot).  Arrow reads release the
    GIL and cold reads are IO-wait-bound, so even the 1-core host overlaps
    several batches' faults.  Results are yielded strictly in submission
    order, so downstream consumers (collate, the deterministic resume
    schedule) are unaffected; ``depth`` bounds host RAM to that many
    fetched batches.  A thunk's exception surfaces at ITS yield position,
    preserving the serial path's error semantics.

    ``workers <= 1`` degrades to plain serial iteration (no pool, no
    threads) — the pre-round-5 behavior.
    """
    if workers <= 1:
        for t in thunks:
            yield t()
        return
    it = iter(thunks)
    pool = ThreadPoolExecutor(max_workers=workers,
                              thread_name_prefix="readahead")
    try:
        pending: collections.deque = collections.deque()
        for t in it:
            pending.append(pool.submit(t))
            if len(pending) >= depth:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()
    finally:
        # cancel anything still queued; running fetches finish harmlessly
        for f in pending:
            f.cancel()
        pool.shutdown(wait=False)



class DevicePrefetcher:
    """Wrap a host batch iterator; yields device-resident batches."""

    _SENTINEL = object()

    def __init__(self, host_iter: Iterator, mesh=None, size: int = 2,
                 put_fn: Optional[Callable] = None):
        if put_fn is not None:
            self._put = put_fn
        elif mesh is not None:
            # shard_batch handles both single-host device_put and multi-host
            # global-array assembly from per-process local slices
            from rnntransducer_tpu.parallel.mesh import shard_batch
            self._put = lambda b: shard_batch(mesh, b)
        else:
            self._put = lambda b: jax.tree.map(jax.device_put, b)
        self._q: queue.Queue = queue.Queue(maxsize=size)
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker,
                                        args=(host_iter,), daemon=True)
        self._thread.start()

    def _qput(self, item) -> bool:
        """put() that a close() can interrupt — a worker blocked forever in
        Queue.put would outlive an abandoned iterator, pinning its queued
        device batches in HBM for the process lifetime."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self, host_iter):
        try:
            for batch in host_iter:
                if self._stop.is_set() or not self._qput(self._put(batch)):
                    return
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._qput(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self) -> None:
        """Release the worker and every queued device batch.  Call when
        abandoning the iterator before exhaustion (max_steps reached,
        preemption) — otherwise the worker stays blocked in put() holding
        2-3 device batches in HBM."""
        self._stop.set()
        for _ in range(2):  # drain; once more after the thread exits
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=5)
