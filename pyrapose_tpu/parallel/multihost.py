"""Multi-host (multi-process) training support.

Greenfield TPU-native extension (SURVEY §2.3: the reference has no multi-node
code; its multi_gpu_model branch is dead, bin/train.py:80-86,355). Scaling
past one host (TPU pods / multi-slice) in JAX means:

- every process calls `jax.distributed.initialize` (coordinator rendezvous);
- ONE global mesh spans all processes' devices; the jitted train step is the
  SAME program as single-host — XLA routes the gradient all-reduce over ICI
  within a slice and DCN across slices from the sharding annotations;
- each process loads only its shard of every global batch (the epoch schedule
  is derived from the seed, so all processes agree on it without
  communication, and each takes its own row slice);
- process-local arrays are assembled into global batch-sharded jax.Arrays
  with `jax.make_array_from_process_local_data`;
- checkpoints/metrics are written by process 0 only (parameters are
  replicated, so its host copy is the global state).

CPU rehearsal: `initialize_distributed(..., cpu=True)` selects the gloo
collectives backend so an N-process × M-virtual-device cluster runs on one
machine (tests/test_multihost.py, __graft_entry__.dryrun_multihost).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator

import jax
import numpy as np

from pyrapose_tpu.parallel.mesh import batch_sharding


def initialize_distributed(
    coordinator_address: str,
    num_processes: int | None = None,
    process_id: int | None = None,
    cpu: bool = False,
) -> None:
    """Join the multi-process cluster (call once, before any device use).

    On Cloud TPU pods the three arguments are optional (auto-detected from
    the TPU metadata); `cpu=True` forces the CPU platform + gloo collectives
    for single-machine multi-process rehearsal.
    """
    if cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_schedule(
    schedule: list[list[int]],
    process_index: int | None = None,
    process_count: int | None = None,
) -> list[list[int]]:
    """Slice a GLOBAL per-step index schedule to this process's rows.

    All processes build the identical schedule from the seed (cli/train.py
    _epoch_schedule), then each keeps rows [pi*per : (pi+1)*per] of every
    step — the loader touches only local data, no cross-host coordination.
    """
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    out = []
    for step in schedule:
        if len(step) % pc:
            raise ValueError(
                f"global batch {len(step)} not divisible by {pc} processes"
            )
        per = len(step) // pc
        out.append(step[pi * per : (pi + 1) * per])
    return out


def make_global_batch(batch: Any, mesh, sharding=None) -> Any:
    """Process-local host arrays -> global batch-sharded jax.Arrays.

    Each leaf's leading (batch) axis is the sharded one: local shape
    (B_local, ...) becomes global (B_local * process_count, ...).
    """
    sharding = batch_sharding(mesh) if sharding is None else sharding
    pc = jax.process_count()

    def place(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * pc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(place, batch)


def device_prefetch_global(
    iterator: Iterable[Any],
    mesh,
    depth: int = 2,
    transform: Callable[[Any], Any] | None = None,
) -> Iterator[Any]:
    """Multi-host twin of data.prefetch.device_prefetch: keeps `depth`
    GLOBAL batches resident, assembled from each process's local loader
    output, overlapping H2D + cross-process assembly with compute."""

    def place(batch):
        if transform is not None:
            batch = transform(batch)
        return make_global_batch(batch, mesh)

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


def process_sum(x: np.ndarray) -> np.ndarray:
    """Elementwise sum of a same-shaped numpy array across all processes.

    Single-process: identity. Used to reduce per-process eval counters
    (EvalAccumulator fields) into the global tally every process agrees on."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils as mhu

    return np.asarray(mhu.process_allgather(x)).sum(axis=0).astype(x.dtype)


def process_concat(x: np.ndarray) -> np.ndarray:
    """Concatenate per-process 1-D float arrays of ARBITRARY (different)
    lengths across all processes, in process order.

    process_allgather needs equal shapes, so lengths are exchanged first and
    every contribution is zero-padded to the max before the gather."""
    x = np.asarray(x, np.float32).reshape(-1)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils as mhu

    lengths = np.asarray(
        mhu.process_allgather(np.asarray([x.shape[0]], np.int64))
    ).reshape(-1)
    m = int(lengths.max(initial=0))
    if m == 0:
        return x
    buf = np.zeros((m,), np.float32)
    buf[: x.shape[0]] = x
    rows = np.asarray(mhu.process_allgather(buf)).reshape(len(lengths), m)
    return np.concatenate(
        [rows[i, : int(lengths[i])] for i in range(len(lengths))]
    )


def is_primary() -> bool:
    """True on the process that owns checkpoint/metric writes."""
    return jax.process_index() == 0


def barrier(name: str, timeout_s: float = 1800.0) -> None:
    """Coordination-service barrier (NOT a device collective).

    Aligns processes across phases whose duration skews arbitrarily —
    above all per-process XLA compilation. Device collectives (gloo on the
    CPU rehearsal) have short rendezvous timeouts; if process A finishes
    compiling minutes before process B and enters the first all-reduce, the
    collective times out and the cluster dies. Compiling ahead-of-time and
    meeting at this barrier first absorbs any skew. No-op outside a
    distributed context."""
    from jax._src import distributed  # coordination client (no public API yet)

    client = distributed.global_state.client
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))
