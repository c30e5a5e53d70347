"""Per-dataset evaluation entry points.

The reference ships one ~600-1000-line eval script per dataset
(utils/{linemod,occlusion,ycbv,tless,homebrewed,coco}_eval.py) differing in
intrinsics, object subsets, symmetric-class handling, and report format.
Here those reduce to protocol dispatch over shared on-device machinery:

- linemod / occlusion / ycbv / homebrewed: the ADD(-S) < 0.1d protocol
  (eval/driver.py), with each dataset's symmetric classes carried by its
  DatasetSpec (linemod_eval.py:525-531, ycbv_eval.py:916-919,
  homebrewed_eval.py:622);
- tless: the IoU-matched detection-curve + ADI/reproj/VSD protocol
  (eval/tless.py, reference tless_eval.py);
- coco: detection-only mAP (eval/map.py, reference utils/coco_eval.py).

`load_model_points` replaces the reference's per-script PLY loading blocks
(linemod_eval.py:245-257): it samples each class's mesh to a fixed-size
cloud so every metric stays static-shape on device.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable

import numpy as np

from pyrapose_tpu.data.spec import DatasetSpec
from pyrapose_tpu.eval.driver import evaluate_dataset
from pyrapose_tpu.eval.tless import evaluate_tless

DEFAULT_MODEL_POINTS = 512


def load_model_points(
    data_root: str,
    spec: DatasetSpec,
    num_points: int = DEFAULT_MODEL_POINTS,
) -> np.ndarray | None:
    """(C, P, 3) sampled mesh clouds from {root}/models/obj_{id:06d}.ply.

    Follows the BOP layout the reference reads its meshes from
    (linemod_eval.py:220,245-257 `.../models/obj_{:02}.ply`); both the BOP
    6-digit and the reference 2-digit name patterns are probed. Returns None
    when no meshes are present (metrics then fall back to box corners).
    """
    from pyrapose_tpu.utils.ply import load_ply, sample_model_points

    model_dir = os.path.join(data_root, "models")
    if not os.path.isdir(model_dir):
        return None
    clouds = []
    for oid in spec.class_to_obj_id:
        path = None
        for pattern in (f"obj_{oid:06d}.ply", f"obj_{oid:02d}.ply"):
            cand = os.path.join(model_dir, pattern)
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            return None
        mesh = load_ply(path)
        pts = sample_model_points(mesh, num_points)
        # BOP meshes are in mm; the framework world unit is meters.
        if np.abs(pts).max() > 10.0:
            pts = pts * 1e-3
        clouds.append(pts)
    return np.stack(clouds).astype(np.float32)


def evaluate_linemod(spec, infer_fn, variables, batches, model_points=None,
                     verbose=True, icp=False) -> dict:
    """LineMOD ADD(-S) < 0.1d (linemod_eval.py:216-663); optional depth-ICP
    refinement (the reference's get_evaluation_kiru helper,
    linemod_eval.py:41-139)."""
    return evaluate_dataset(spec, infer_fn, variables, batches,
                            model_points=model_points, verbose=verbose,
                            icp=icp)


def evaluate_occlusion(spec, infer_fn, variables, batches, model_points=None,
                       verbose=True, icp=False) -> dict:
    """Occlusion-LineMOD ADD(-S) < 0.1d over the 8 LM-O objects
    (occlusion_eval.py:221-540). No ICP in the reference protocol, but the
    flag is honored for parity experiments."""
    return evaluate_dataset(spec, infer_fn, variables, batches,
                            model_points=model_points, verbose=verbose,
                            icp=icp)


def evaluate_ycbv(spec, infer_fn, variables, batches, model_points=None,
                  verbose=True, icp=False) -> dict:
    """YCB-Video ADD(-S) < 0.1d over the 5 trained objects
    (ycbv_eval.py:916-919; symmetric set via the spec). The reference's
    protocol refines with depth-mask ICP before scoring
    (ycbv_eval.py:841-870) — pass icp=True with depth batches for that
    variant. YCB-V's correspondence gate is looser: 0.015 m like the
    reference's open3d call."""
    return evaluate_dataset(spec, infer_fn, variables, batches,
                            model_points=model_points, verbose=verbose,
                            icp=icp, icp_max_corr_dist=0.015)


def evaluate_homebrewed(spec, infer_fn, variables, batches, model_points=None,
                        verbose=True, icp=False) -> dict:
    """HomebrewedDB ADD < 0.1d (homebrewed_eval.py:615-637; the spec carries
    no symmetric classes — plain ADD only)."""
    return evaluate_dataset(spec, infer_fn, variables, batches,
                            model_points=model_points, verbose=verbose,
                            icp=icp)


def evaluate_coco(detections, annotations, num_classes: int) -> dict:
    """COCO bbox AP (utils/coco_eval.py capability, native implementation)."""
    from pyrapose_tpu.eval.map import coco_map

    return coco_map(detections, annotations, num_classes)


_DRIVERS: dict[str, Callable] = {
    "linemod": evaluate_linemod,
    "occlusion": evaluate_occlusion,
    "ycbv": evaluate_ycbv,
    "tless": evaluate_tless,
    "homebrewed": evaluate_homebrewed,
    "synthetic": evaluate_linemod,
}


def evaluate_by_name(
    name: str,
    spec: DatasetSpec,
    infer_fn: Callable,
    variables,
    batches: Iterable,
    model_points: np.ndarray | None = None,
    verbose: bool = True,
    icp: bool = False,
) -> dict:
    """Dispatch to the dataset's protocol (bin/evaluate.py:224-242)."""
    if name not in _DRIVERS:
        raise ValueError(f"no eval driver for {name!r}")
    return _DRIVERS[name](
        spec, infer_fn, variables, batches, model_points=model_points,
        verbose=verbose, icp=icp,
    )
