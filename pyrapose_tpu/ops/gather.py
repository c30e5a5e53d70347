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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rest = cache.shape[1:]
    size = math.prod(rest)
    if size % 128:
        return jnp.take(cache, idx, axis=0)
    rows = size // 128
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b = idx.shape[0]
    view = cache.reshape(cache.shape[0], rows, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, 128), lambda i, idx_ref: (idx_ref[i], 0, 0))
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda i, idx_ref: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, 128), cache.dtype),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32), view)
    return out.reshape(b, *rest)
