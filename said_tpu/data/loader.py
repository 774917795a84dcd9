"""Minimal host-side data loader (maps indices → collated batches).

Replaces the torch DataLoader usage in the reference scripts: supports
sequential iteration and a with-replacement random sampler (the
reference trains with ``RandomSampler(replacement=True)``,
``script/train.py:525-529``). Single-process — the datasets preload to
RAM, so worker processes buy nothing here.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        sampler_replacement: bool = False,
        collate_fn: Optional[Callable] = None,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.sampler_replacement = sampler_replacement
        self.collate_fn = collate_fn or (lambda items: items)
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        n = len(self.dataset)
        if self.sampler_replacement:
            indices = self.rng.integers(0, n, size=n)
        elif self.shuffle:
            indices = self.rng.permutation(n)
        else:
            indices = np.arange(n)

        for start in range(0, n, self.batch_size):
            batch_idx = indices[start : start + self.batch_size]
            if self.drop_last and len(batch_idx) < self.batch_size:
                break
            yield self.collate_fn([self.dataset[int(i)] for i in batch_idx])


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Iterate ``iterable`` on a background thread, keeping up to
    ``depth`` items ready.

    The training loops are host-bound between dispatches (windowing +
    augmentation + collation happen per batch); producing the next batch
    on a thread while the device executes the current step removes that
    stall. ``depth`` bounds the RAM held in flight. Exceptions raised by
    the producer re-raise at the consumer's next pull.

    Abandoning the generator early (a ``break``, an exception in the
    loop body, or garbage collection) CLOSES it, which signals the
    producer to stop and drains the queue so the thread exits promptly
    instead of parking forever on the bounded ``q.put`` with ``depth``
    collated batches pinned (a long-lived process repeatedly abandoning
    epochs would otherwise accumulate threads and memory).
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(pair) -> bool:
        # bounded put that gives up once the consumer is gone
        while not stop.is_set():
            try:
                q.put(pair, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker() -> None:
        try:
            for item in iterable:
                if not _put((True, item)):
                    return
        except BaseException as e:  # propagate, don't kill the thread silently
            _put((False, e))
        else:
            _put((False, None))

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            ok, val = q.get()
            if not ok:
                if val is not None:
                    raise val
                return
            yield val
    finally:
        stop.set()
        try:  # unblock a producer parked on a full queue
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
