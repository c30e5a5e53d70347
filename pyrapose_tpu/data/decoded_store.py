"""Memory-mapped decoded-frame store: PNG decode paid once, ever.

The HBM `DeviceCache` (--device-cache) is the fastest feed but caps the
set at device memory (~10k 480x640 frames on a 16 GB chip). Larger sets
fall back to the host loader, whose steady-state cost on few-core hosts is
PNG decode (~25-40 ms/frame). This store removes that cost for ANY set
size that fits on disk:

- `build_store` decodes + letterboxes every sample once (threaded, the
  same pipeline the loaders use) and writes `{prefix}_images.npy`
  (D, H, W, 3 uint8) + `{prefix}_gt.npz` (the padded GroundTruth);
- `DecodedStore` memory-maps the image array and serves
  `batch(indices)` as row copies: a 16-frame 480x640 batch is ~7 MB of
  memcpy (microseconds against page cache) instead of 16 PNG decodes.

Pairs with --device-augment: the store holds deterministic letterboxed
frames, both augmentation stages run inside the jitted step.
`pyrapose train --decoded-store PATH` wires it up (building the store on
first use); restarts and re-runs mmap the same file instantly.
"""

from __future__ import annotations

import os

import numpy as np

from pyrapose_tpu.data.pipeline import GroundTruth


def build_store(dataset, prefix: str, num_workers: int = 2,
                load_batch: int = 32, verbose: bool = True) -> None:
    """Decode every sample of an UN-augmented dataset into the store."""
    from pyrapose_tpu.data.prefetch import HostPrefetcher

    if getattr(dataset, "augment", None) is not None:
        raise ValueError(
            "decoded store must hold deterministic frames: build it from an "
            "un-augmented dataset (augment on device via --device-augment)"
        )
    n = len(dataset)
    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    order = np.arange(n)
    schedule = [
        list(order[i: min(i + load_batch, n)])
        for i in range(0, n, load_batch)
    ]
    loader = HostPrefetcher(
        dataset, load_batch, schedule=schedule, num_workers=num_workers
    )
    images_out = None
    gt_parts: list[GroundTruth] = []
    done = 0
    for images_u8, gt_b in loader:
        arr = np.asarray(images_u8)
        if images_out is None:
            # pre-size the on-disk array; rows are written as they decode
            images_out = np.lib.format.open_memmap(
                prefix + "_images.npy.tmp", mode="w+", dtype=np.uint8,
                shape=(n, *arr.shape[1:]),
            )
        images_out[done: done + arr.shape[0]] = arr
        gt_parts.append(gt_b)
        done += arr.shape[0]
        if verbose and (done % (load_batch * 32) == 0 or done == n):
            print(f"  decoded-store: {done}/{n} frames", flush=True)
    images_out.flush()
    del images_out
    gt = GroundTruth(
        *(
            np.concatenate([np.asarray(p[i]) for p in gt_parts], axis=0)
            for i in range(len(GroundTruth._fields))
        )
    )
    with open(prefix + "_gt.npz.tmp", "wb") as f:
        np.savez(f, **{k: np.asarray(v)
                       for k, v in zip(GroundTruth._fields, gt)})
    # atomic publish: a killed build never leaves a torn store
    os.replace(prefix + "_images.npy.tmp", prefix + "_images.npy")
    os.replace(prefix + "_gt.npz.tmp", prefix + "_gt.npz")
    if verbose:
        print(f"  decoded-store: wrote {prefix}_images.npy / _gt.npz",
              flush=True)


class DecodedStore:
    """Serve batches from a built store (mmap'd images, in-RAM GT)."""

    augment = None  # deterministic frames by construction

    def __init__(self, prefix: str):
        self.images = np.load(prefix + "_images.npy", mmap_mode="r")
        with np.load(prefix + "_gt.npz") as z:
            self.gt = GroundTruth(*(z[k] for k in GroundTruth._fields))

    @staticmethod
    def exists(prefix: str) -> bool:
        return (
            os.path.exists(prefix + "_images.npy")
            and os.path.exists(prefix + "_gt.npz")
        )

    def __len__(self) -> int:
        return int(self.images.shape[0])

    def batch(self, indices) -> tuple[np.ndarray, GroundTruth]:
        idx = np.asarray(indices, np.int64)
        images = np.ascontiguousarray(self.images[idx])
        gt = GroundTruth(*(leaf[idx] for leaf in self.gt))
        return images, gt
