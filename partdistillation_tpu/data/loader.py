"""Per-host sharded data loader: items -> mapper -> fixed-shape batches.

Replaces detectron2's DataLoader + worker processes (SURVEY.md §3.1 "worker
procs (4/GPU)") with a thread-pool mapper and a bounded prefetch queue. Host
sharding is by ``jax.process_index()/process_count()`` — the single multi-host
program equivalent of the reference's SLURM job farms + per-GPU DDP samplers.

Batches are dicts of stacked numpy arrays with static shapes (mappers emit
fixed-capacity padded examples); the final partial batch of an epoch is padded
by repeating the last example, with a ``batch_valid`` bool vector marking real
rows — evaluators must respect it (the reference instead relied on
drop-last / uneven final batches, which XLA-compiled steps cannot take).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

__all__ = ["host_shard", "batch_iterator", "DataLoader"]


def host_shard(items: List[dict], process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> List[dict]:
    """Strided slice of the item list for this host."""
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    return items[process_index::process_count]


def _collate(examples: List[dict], target: int) -> Dict[str, np.ndarray]:
    n = len(examples)
    while len(examples) < target:
        examples = examples + [examples[-1]]
    batch: Dict[str, np.ndarray] = {}
    for key in examples[0]:
        vals = [ex[key] for ex in examples]
        if isinstance(vals[0], str):
            batch[key] = np.asarray(vals, dtype=object)
        else:
            arr = np.stack([np.asarray(v) for v in vals])
            if arr.dtype == bool and arr.ndim >= 3:
                # Mask stacks go to the device as f32: bool (pred) inputs get
                # a packed T(8,128)(4,1) TPU layout whose conversion copy
                # dominates the train step (profiled at ~1.9s for a
                # (8,8,640,640) batch); the losses cast to f32 anyway. Small
                # bool vectors (valid flags) stay bool.
                arr = arr.astype(np.float32)
            batch[key] = arr
    batch["batch_valid"] = np.arange(target) < n
    return batch


def batch_iterator(
    items: List[dict],
    mapper: Callable[[dict], Optional[dict]],
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    epochs: Optional[int] = 1,
    num_workers: int = 8,
    drop_last: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yields batches; skips items the mapper rejects (returns None).

    ``epochs=None`` repeats forever (training); per-epoch reshuffle keyed by
    (seed, epoch).
    """
    if not items:
        return
    import os

    # 0 = synchronous-ish: one worker thread; never more threads than cores
    # (on a 1-cpu host, extra threads only add GIL contention — measured
    # 58 img/s single-thread vs 14 img/s with 8 workers)
    num_workers = max(min(num_workers, os.cpu_count() or num_workers), 1)
    epoch = 0
    # pending carries across epochs: with fewer usable items than batch_size
    # (fewshot subsets, heavy mapper filtering) a batch still fills after
    # several epochs instead of spinning forever under drop_last.
    pending: List[dict] = []
    while epochs is None or epoch < epochs:
        order = np.arange(len(items))
        if shuffle:
            np.random.RandomState((seed, epoch)).shuffle(order)
        got_any = False
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            # Bounded in-flight window instead of pool.map: map() schedules
            # the WHOLE epoch eagerly and buffers every decoded example in
            # finished futures (no backpressure -> OOM at ~8 MB/example on
            # million-item epochs). _epoch is injected for per-item augment
            # RNG derivation (mappers._item_rng).
            ep = epoch

            def submit(i):
                return pool.submit(mapper, {**items[int(i)], "_epoch": ep})

            window = 2 * max(num_workers, 1)
            from collections import deque

            inflight = deque(submit(i) for i in order[:window])
            next_idx = window
            while inflight:
                example = inflight.popleft().result()
                if next_idx < len(order):
                    inflight.append(submit(order[next_idx]))
                    next_idx += 1
                if example is None:
                    continue
                got_any = True
                pending.append(example)
                if len(pending) == batch_size:
                    yield _collate(pending, batch_size)
                    pending = []
        if epochs is None and not got_any:
            return  # every item rejected: an infinite loader would spin forever
        epoch += 1
    if pending and not drop_last:
        yield _collate(pending, batch_size)


class DataLoader:
    """batch_iterator + a background prefetch thread (bounded queue)."""

    def __init__(self, items: List[dict], mapper, batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 epochs: Optional[int] = 1, num_workers: int = 8,
                 prefetch: int = 4, drop_last: bool = False):
        self._iter = batch_iterator(items, mapper, batch_size, shuffle, seed,
                                    epochs, num_workers, drop_last)
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._done = object()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        try:
            for batch in self._iter:
                self._q.put(batch)
        except BaseException as e:  # surface in the consumer, don't die silent
            self._error = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        while True:
            batch = self._q.get()
            if batch is self._done:
                if self._error is not None:
                    raise RuntimeError("DataLoader worker failed") from self._error
                return
            yield batch
