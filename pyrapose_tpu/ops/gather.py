"""Pallas row gather: minibatch selection from the HBM dataset cache.

`make_cached_train_step` gathers B frames from the (D, H, W, 3) uint8
cache inside the jitted program (one dispatch per step). XLA lowers that
`jnp.take` to a serialized per-row dynamic-gather: measured on v5e, the
16-row gather from a 9.4 GB cache costs ~3 ms/step (~9 GB/s effective —
two orders below HBM bandwidth) and drops cached training from 183 to
115 img/s as the cache grows.

This kernel issues the row copies as pipelined HBM->VMEM->HBM DMAs via
scalar-prefetched block indices (`PrefetchScalarGridSpec`): the grid is
the batch, each step's input block index comes from the prefetched index
vector, and Pallas double-buffers block i+1's fetch behind block i's
write-out. Rows are viewed as (rows128, 128) lanes so the copy is
layout-native.

Single-device only by design: under GSPMD a pallas_call does not
partition, and on a multi-device mesh each device should gather only its
batch shard anyway (the XLA path with a sharding constraint does exactly
that). The cached-step wrapper picks per mesh size.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _copy_kernel(idx_ref, cache_ref, out_ref):
    del idx_ref  # consumed by the index maps
    out_ref[...] = cache_ref[...]


def gather_rows_pallas(
    cache: jnp.ndarray, idx: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """cache[idx] along axis 0 as a pipelined Pallas DMA program.

    Falls back to `jnp.take` when the row byte-size does not tile into
    128-lane vectors (never the case for image caches: H*W*3 of 480x640
    is 7200*128).
    """
    rest = cache.shape[1:]
    size = math.prod(rest)
    if size % 128:
        return jnp.take(cache, idx, axis=0)
    rows = size // 128
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b = idx.shape[0]
    d = cache.shape[0]
    view = cache.reshape(d, rows, 128)
    idx = jnp.asarray(idx, jnp.int32)

    # Mosaic's DMA addressing caps a pallas operand at 2^32 bytes (measured
    # on v5e: 3.4 GiB compiles, 5.2 GiB rejects). Bigger caches are viewed
    # as K segments, each gathered with clamped indices; rows are then
    # selected by owner segment. K extra row copies per batch are noise
    # (~1 ms of DMA) next to the 3 ms serialized-gather this replaces.
    max_bytes = (1 << 32) - (1 << 24)
    row_bytes = rows * 128 * cache.dtype.itemsize
    k = max(1, -(-(d * row_bytes) // max_bytes))
    seg = -(-d // k)
    out = None
    for s in range(k):
        lo, hi = s * seg, min((s + 1) * seg, d)
        local = jnp.clip(idx - lo, 0, hi - lo - 1)
        part = _gather_call(view[lo:hi], local, b, rows, interpret)
        if out is None:
            out = part
        else:
            owner = (idx >= lo)[:, None, None]
            out = jnp.where(owner, part, out)
    return out.reshape(b, *rest)


def _gather_call(view, local_idx, b, rows, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, 128), lambda i, idx_ref: (idx_ref[i], 0, 0))
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda i, idx_ref: (i, 0, 0)),
    )
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, 128), view.dtype),
        interpret=interpret,
    )(local_idx, view)
