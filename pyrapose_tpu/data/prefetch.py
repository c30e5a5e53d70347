"""Asynchronous host input pipeline with device prefetch.

The reference overlaps data loading with the GPU through keras fit_generator
fork workers and a bounded queue (bin/train.py:373-390). The TPU-native
equivalent here:

- a thread pool decodes/augments batches ahead of the training loop into a
  bounded queue (PNG decode and numpy augmentation release the GIL for most
  of their time, so threads scale on multi-core hosts without the fork
  overhead and PRNG hazards of process workers — each worker draws indices
  from a deterministic per-epoch schedule instead);
- `device_prefetch` keeps N batches resident on device with the training
  sharding already applied (double buffering), so `jax.device_put` H2D
  transfer of batch k+1 overlaps step k's compute;
- target generation and image normalization are NOT done here at all: they
  are fused into the jitted train step (train/step.py make_fused_train_step)
  and run on the TPU, where the reference burned host CPU on them
  (generator.py:344-358).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator

import jax
import numpy as np

from pyrapose_tpu.parallel.mesh import batch_sharding


class HostPrefetcher:
    """Threaded batch producer over a dataset with .batch(indices).

    Yields batches in schedule order (workers fill out-of-order into slots;
    consumption is ordered, so training remains deterministic for a fixed
    seed and worker-count-independent).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        schedule: Iterable[list[int]] | None = None,
        num_workers: int = 2,
        queue_size: int = 4,
        with_depth: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(num_workers, 1)
        self.queue_size = max(queue_size, 2)
        self.with_depth = with_depth
        if schedule is None:
            order = np.arange(len(dataset))
            usable = len(order) - len(order) % batch_size
            schedule = [
                list(order[i : i + batch_size])
                for i in range(0, usable, batch_size)
            ]
        self.schedule = list(schedule)

    def __len__(self) -> int:
        return len(self.schedule)

    def __iter__(self) -> Iterator[Any]:
        n = len(self.schedule)
        if n == 0:
            return
        results: dict[int, Any] = {}
        lock = threading.Lock()
        ready = threading.Condition(lock)
        next_job = [0]
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                with lock:
                    j = next_job[0]
                    if j >= n:
                        return
                    # backpressure: stay at most queue_size ahead of the
                    # consumer (the smallest unconsumed slot)
                    if j - min(results, default=j) >= self.queue_size:
                        ready.wait(timeout=0.1)
                        continue
                    next_job[0] = j + 1
                try:
                    if self.with_depth:
                        batch = self.dataset.batch(
                            self.schedule[j], with_depth=True
                        )
                    else:
                        batch = self.dataset.batch(self.schedule[j])
                except Exception as exc:  # surface in the consumer
                    batch = exc
                with lock:
                    results[j] = batch
                    ready.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            for j in range(n):
                with lock:
                    while j not in results:
                        ready.wait(timeout=0.5)
                    batch = results.pop(j)
                    ready.notify_all()
                if isinstance(batch, Exception):
                    raise batch
                yield batch
        finally:
            stop.set()
            with lock:
                ready.notify_all()
            for t in threads:
                t.join(timeout=2.0)


def device_prefetch(
    iterator: Iterable[Any],
    mesh,
    depth: int = 2,
    transform: Callable[[Any], Any] | None = None,
) -> Iterator[Any]:
    """Keep `depth` batches resident on device with the batch sharding.

    Host arrays are placed with jax.device_put under the mesh's data-parallel
    sharding ahead of consumption, overlapping H2D transfer with compute
    (the prefetch_to_device pattern, done with explicit shardings).
    """
    sharding = batch_sharding(mesh)

    def place(batch):
        if transform is not None:
            batch = transform(batch)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), sharding), batch
        )

    it = iter(iterator)
    buf: list[Any] = []
    try:
        for _ in range(depth):
            buf.append(place(next(it)))
    except StopIteration:
        pass
    while buf:
        nxt = buf.pop(0)
        try:
            buf.append(place(next(it)))
        except StopIteration:
            pass
        yield nxt
