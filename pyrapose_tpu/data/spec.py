"""Dataset specifications: intrinsics, classes, 3D box corners, symmetries.

The reference hard-codes these per dataset across eval scripts and loaders
(camera intrinsics at utils/linemod_eval.py:35-38, ycbv_eval.py:24-27,
homebrewed_eval.py:20-23; 3D boxes built from models_info.yml in each
generator, e.g. preprocessing/linemod.py:69-86; symmetric-class lists at
linemod_eval.py:525-531 and annotation_scripts/annotate_BOP.py:401-411).
Here they live in one structured spec that both the data pipeline and the
eval drivers consume, loadable from a BOP models_info file or from the
built-in constants below.
"""

from __future__ import annotations

import dataclasses
import json
import os
from functools import lru_cache

import numpy as np


def box_corners_from_extents(
    min_xyz: np.ndarray, size_xyz: np.ndarray
) -> np.ndarray:
    """8 corners of an axis-aligned box, in the reference's corner order.

    Order (+++, ++-, +--, +-+, -++, -+-, ---, --+), identical in the loaders
    and eval scripts (preprocessing/linemod.py:78-86,
    utils/linemod_eval.py:234-241).
    """
    x0, y0, z0 = min_xyz
    sx, sy, sz = size_xyz
    x1, y1, z1 = x0 + sx, y0 + sy, z0 + sz
    return np.array(
        [
            [x1, y1, z1], [x1, y1, z0], [x1, y0, z0], [x1, y0, z1],
            [x0, y1, z1], [x0, y1, z0], [x0, y0, z0], [x0, y0, z1],
        ],
        np.float32,
    )


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    """Static per-dataset metadata (units: meters)."""

    name: str
    num_classes: int
    intrinsics: tuple[float, float, float, float]  # (fx, fy, cx, cy)
    corners3d: np.ndarray  # (C, 8, 3) object-frame box corners
    diameters: np.ndarray  # (C,) model diameters
    symmetric: tuple[int, ...] = ()  # class ids evaluated with ADI
    class_to_obj_id: tuple[int, ...] = ()  # class index -> BOP object id
    image_shape: tuple[int, int] = (480, 640)
    # Stored-pose-translation -> meters factor applied at load: 1.0 for
    # meters-native annotations, 1e-3 for mm. None = auto-detect per
    # annotation, matching the reference's own guess (linemod.py:238-241) —
    # the right default for mixed-provenance BOP conversions.
    pose_unit_scale: float | None = None

    def is_symmetric(self, cls: int) -> bool:
        return cls in self.symmetric


def spec_from_models_info(
    name: str,
    models_info: dict,
    obj_ids: list[int],
    intrinsics: tuple[float, float, float, float],
    symmetric_obj_ids: tuple[int, ...] = (),
    unit_scale: float = 1e-3,  # BOP models_info is in mm
    image_shape: tuple[int, int] = (480, 640),
) -> DatasetSpec:
    """Build a spec from a BOP models_info dict (mm) for the given object ids."""
    corners = []
    diameters = []
    for oid in obj_ids:
        info = models_info[str(oid)] if str(oid) in models_info else models_info[oid]
        mn = np.array([info["min_x"], info["min_y"], info["min_z"]], np.float32)
        sz = np.array([info["size_x"], info["size_y"], info["size_z"]], np.float32)
        corners.append(box_corners_from_extents(mn * unit_scale, sz * unit_scale))
        diameters.append(float(info["diameter"]) * unit_scale)
    symmetric = tuple(i for i, oid in enumerate(obj_ids) if oid in symmetric_obj_ids)
    return DatasetSpec(
        name=name,
        num_classes=len(obj_ids),
        intrinsics=intrinsics,
        corners3d=np.stack(corners),
        diameters=np.array(diameters, np.float32),
        symmetric=symmetric,
        class_to_obj_id=tuple(obj_ids),
        image_shape=image_shape,
    )


def load_models_info(path: str) -> dict:
    """Load models_info.{json,yml}. YAML support covers the reference's
    models_info.yml files (linemod.py:69)."""
    if path.endswith(".json"):
        with open(path) as f:
            return json.load(f)
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


# ---------------------------------------------------------------------------
# Built-in specs. Numeric values from the BOP model metadata the reference
# repositories use; intrinsics cited per dataset.
# ---------------------------------------------------------------------------

# LineMOD (13 trained classes; objects 3 & 7 are absent from the benchmark,
# matching the reference loader). Kinect intrinsics: linemod_eval.py:35-38.
_LM_OBJ_IDS = [1, 2, 4, 5, 6, 8, 9, 10, 11, 12, 13, 14, 15]
# eggbox (obj 10, class 9... reference marks classes 10 & 11 of its 1-based
# scheme — objects 10 (eggbox) and 11 (glue) — as symmetric
# (linemod_eval.py:525-531): those are obj ids 10 and 11.
_LM_SYMMETRIC_OBJ = (10, 11)
_LM_INTRINSICS = (572.4114, 573.57043, 325.2611, 242.04899)

# Approximate LineMOD model boxes (mm), from BOP lm/models_info.json values.
_LM_MODELS_INFO = {
    1: dict(diameter=102.099, min_x=-37.93, min_y=-38.79, min_z=-45.88, size_x=75.87, size_y=77.58, size_z=91.76),
    2: dict(diameter=247.506, min_x=-107.83, min_y=-60.93, min_z=-109.70, size_x=215.67, size_y=121.86, size_z=219.41),
    4: dict(diameter=172.492, min_x=-83.78, min_y=-82.79, min_z=-37.73, size_x=167.56, size_y=165.59, size_z=75.47),
    5: dict(diameter=201.404, min_x=-68.88, min_y=-71.51, min_z=-50.63, size_x=137.77, size_y=143.03, size_z=101.25),
    6: dict(diameter=154.546, min_x=-50.39, min_y=-90.89, min_z=-96.87, size_x=100.79, size_y=181.79, size_z=193.73),
    8: dict(diameter=261.472, min_x=-129.11, min_y=-59.24, min_z=-70.57, size_x=258.23, size_y=118.49, size_z=141.14),
    9: dict(diameter=108.999, min_x=-51.36, min_y=-50.49, min_z=-35.16, size_x=102.72, size_y=100.98, size_z=70.32),
    10: dict(diameter=164.628, min_x=-33.50, min_y=-63.39, min_z=-58.73, size_x=67.01, size_y=126.77, size_z=117.46),
    11: dict(diameter=175.889, min_x=-46.04, min_y=-46.51, min_z=-86.72, size_x=92.08, size_y=93.01, size_z=173.44),
    12: dict(diameter=145.543, min_x=-56.26, min_y=-54.63, min_z=-45.50, size_x=112.52, size_y=109.26, size_z=91.00),
    13: dict(diameter=278.078, min_x=-114.39, min_y=-65.61, min_z=-46.86, size_x=228.77, size_y=131.21, size_z=93.72),
    14: dict(diameter=282.601, min_x=-52.20, min_y=-100.91, min_z=-106.71, size_x=104.41, size_y=201.82, size_z=213.42),
    15: dict(diameter=212.358, min_x=-75.09, min_y=-54.36, min_z=-25.29, size_x=150.18, size_y=108.72, size_z=50.58),
}

LINEMOD_SPEC = spec_from_models_info(
    "linemod", _LM_MODELS_INFO, _LM_OBJ_IDS, _LM_INTRINSICS, _LM_SYMMETRIC_OBJ
)

# YCB-Video: reference trains 5 of 21 objects with remap {5,8,9,10,21}->{1..5}
# (preprocessing/ycbv.py:92-105); intrinsics ycbv_eval.py:24-27.
_YCBV_INTRINSICS = (1066.778, 1067.487, 312.9869, 241.3109)
# HomebrewedDB intrinsics: homebrewed_eval.py:20-23.
_HB_INTRINSICS = (537.4799, 536.1447, 318.8965, 238.3781)
# T-LESS (Primesense) intrinsics from BOP camera_primesense.json.
_TLESS_INTRINSICS = (1075.65091572, 1073.90347929, 367.06888344, 247.72159802)

_BUILTIN_INTRINSICS = {
    "linemod": _LM_INTRINSICS,
    "occlusion": _LM_INTRINSICS,
    "ycbv": _YCBV_INTRINSICS,
    "tless": _TLESS_INTRINSICS,
    "homebrewed": _HB_INTRINSICS,
}

# Per-dataset trained object subsets. The reference trains YCB-V on 5 of 21
# objects with remap {5,8,9,10,21}->{1..5} (preprocessing/ycbv.py:92-105);
# Occlusion-LineMOD benchmarks the 8 LM-O objects (occlusion_eval.py per-class
# loop). None means "every object in models_info".
_DATASET_OBJ_IDS: dict[str, list[int] | None] = {
    "linemod": _LM_OBJ_IDS,
    "occlusion": [1, 5, 6, 8, 9, 10, 11, 12],
    "ycbv": [5, 8, 9, 10, 21],
    "tless": None,
    "homebrewed": None,
}

# Object ids scored with ADI (symmetric) per dataset:
# - linemod/occlusion: eggbox+glue (linemod_eval.py:525-531,
#   occlusion_eval.py:521-524);
# - ycbv: BOP symmetry sets, continuous {13,18} + discrete {1,19,20,21}
#   (annotation_scripts/annotate_BOP.py:401-407);
# - tless: the reference scores EVERY class with ADI (tless_eval.py:665), so
#   all 30 objects are listed;
# - homebrewed: ADD only (homebrewed_eval.py:622).
_DATASET_SYMMETRIC_OBJ: dict[str, tuple[int, ...]] = {
    "linemod": _LM_SYMMETRIC_OBJ,
    "occlusion": _LM_SYMMETRIC_OBJ,
    "ycbv": (1, 13, 18, 19, 20, 21),
    "tless": tuple(range(1, 31)),
    "homebrewed": (),
}


@lru_cache(maxsize=8)
def dataset_spec(name: str, data_root: str | None = None) -> DatasetSpec:
    """Resolve a dataset spec by name.

    With a data_root, builds from `{root}/annotations/models_info.{yml,json}`
    (the layout the reference loaders expect, linemod.py:69), restricted to
    the dataset's trained object subset; otherwise falls back to built-in
    constants (LineMOD only).
    """
    if data_root is not None:
        for fname in ("models_info.yml", "models_info.json"):
            path = os.path.join(data_root, "annotations", fname)
            if os.path.exists(path):
                info = load_models_info(path)
                available = sorted(int(k) for k in info)
                subset = _DATASET_OBJ_IDS.get(name)
                obj_ids = (
                    [o for o in subset if o in available] if subset else available
                )
                return spec_from_models_info(
                    name,
                    info,
                    obj_ids,
                    _BUILTIN_INTRINSICS.get(name, _LM_INTRINSICS),
                    _DATASET_SYMMETRIC_OBJ.get(name, ()),
                )
        raise FileNotFoundError(f"models_info not found under {data_root}/annotations")
    if name == "linemod":
        return LINEMOD_SPEC
    raise ValueError(
        f"no built-in spec for {name!r}; pass data_root with models_info"
    )
