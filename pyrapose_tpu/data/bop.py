"""BOP-converted COCO-style dataset loader.

Reads the annotation layout produced by the reference's offline annotation
tooling (annotation_scripts/annotate_BOP.py) and consumed by its generators
(preprocessing/linemod.py:37-88, 203-277):

    {root}/annotations/instances_{set}.json     COCO-style index
    {root}/annotations/models_info.yml          3D box + diameter metadata
    {root}/images/{set}/{file_name%.png}_rgb.png
    {root}/images/{set}/{file_name%.png}_mask.png   instance-id mask

Annotation fields: category_id (BOP object id), bbox (xywh), pose
(7 = xyz + wxyz quaternion, or 6 = xyz + euler for T-LESS,
preprocessing/tless.py:174-196), mask_id, feature_visibility. Per-image
intrinsics fx/fy/cx/cy ride on the image records (linemod.py:56-62).

Loader behaviours preserved: train-set visibility filter < 0.5 skips an
annotation (linemod.py:227-229); poses stored in mm are normalized — here to
meters, the framework's world unit (the reference normalizes the other way,
to mm, linemod.py:238-241 — projection and ADD thresholds are consistent
either way, we choose SI).

Output is the framework's fixed-shape GroundTruth (pipeline.py), with the
instance-id mask converted to P3-resolution slot indices on the host.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import numpy as np
from PIL import Image

from pyrapose_tpu.data.augment import AugmentConfig, augment_sample
from pyrapose_tpu.data.image import compute_resize_scale, resize_letterbox
from pyrapose_tpu.data.pipeline import GroundTruth, pad_ground_truth, stack_ground_truth
from pyrapose_tpu.data.spec import DatasetSpec, dataset_spec

try:  # cv2's SIMD PNG/JPEG decode beats PIL ~1.6x; PIL stays the fallback
    import cv2 as _cv2

    # one decode = one thread: frame-level parallelism comes from the
    # HostPrefetcher workers, and cv2's intra-image pool thrashes against
    # them (measured 20.7 ms/frame default-pool vs 7.5 ms pinned vs 12 PIL)
    _cv2.setNumThreads(1)
except Exception:  # pragma: no cover - cv2 is present in supported envs
    _cv2 = None


def _decode_rgb(path: str) -> np.ndarray:
    """uint8 RGB decode. cv2 when available (BGR->RGB flip is a cheap copy
    next to the decode itself); PIL otherwise. Masks/depth keep PIL — cv2
    expands palette PNGs to 3 channels, which would break mask-id reads."""
    if _cv2 is not None:
        bgr = _cv2.imread(path, _cv2.IMREAD_COLOR)
        if bgr is not None:
            return np.ascontiguousarray(bgr[:, :, ::-1])
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.uint8)


def _quat_to_mat_np(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / max(np.linalg.norm(q), 1e-12)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )


def _euler_to_mat_np(e: np.ndarray) -> np.ndarray:
    """Static-frame xyz euler (T-LESS pose convention, tless.py:189-196)."""
    cx, sx = np.cos(e[0]), np.sin(e[0])
    cy, sy = np.cos(e[1]), np.sin(e[1])
    cz, sz = np.cos(e[2]), np.sin(e[2])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (rz @ ry @ rx).astype(np.float32)


class BopDataset:
    """Host-side dataset over a BOP-converted directory."""

    dataset_name = "bop"
    # YCB-V applies the feature-visibility filter on every split, not just
    # train (preprocessing/ycbv.py:263-265 vs linemod.py:227-229).
    visibility_filter_all_splits = False

    def __init__(
        self,
        data_dir: str,
        set_name: str = "train",
        spec: DatasetSpec | None = None,
        name: str = "linemod",
        max_instances: int = 16,
        augment: AugmentConfig | None = None,
        visibility_threshold: float = 0.5,
        seed: int = 0,
        depth_scale: float = 1e-3,
        cache_bytes: int = 0,
    ):
        self.data_dir = data_dir
        self.set_name = set_name
        self.max_instances = max_instances
        self.augment = augment
        self.visibility_threshold = visibility_threshold
        self.rng = np.random.default_rng(seed)
        # uint16 depth PNG value -> meters (BOP stores mm)
        self.depth_scale = depth_scale
        # Decoded-frame cache: PNG decode is the host loader's hottest stage
        # on core-constrained hosts (the reference re-decodes every epoch in
        # its fork workers, generator.py:223-226). Filled on first touch up
        # to cache_bytes, then epochs serve RAM. Arrays are marked read-only
        # (the pipeline never mutates frames in place); worker threads may
        # race on the same fill — last write wins, both are identical.
        self._cache_limit = int(cache_bytes)
        self._cache: dict = {}
        self._cache_used = 0

        self.spec = spec if spec is not None else dataset_spec(name, data_dir)
        # BOP object id -> contiguous class label
        self.obj_to_label = {
            oid: i for i, oid in enumerate(self.spec.class_to_obj_id)
        }

        path = os.path.join(data_dir, "annotations", f"instances_{set_name}.json")
        with open(path) as f:
            data = json.load(f)
        self.images = data["images"]
        self.anns_by_image: dict = defaultdict(list)
        for ann in data["annotations"]:
            self.anns_by_image[ann["image_id"]].append(ann)

        h, w = self.spec.image_shape
        self.p3_shape = ((h + 7) // 8, (w + 7) // 8)

    def __len__(self) -> int:
        return len(self.images)

    def _image_path(self, info: dict, suffix: str) -> str:
        base = os.path.join(self.data_dir, "images", self.set_name, info["file_name"])
        stem, ext = os.path.splitext(base)
        if suffix == "_mask":
            return stem + "_mask.png"
        return stem + suffix + ext

    def _intrinsics(self, info: dict, ann: dict | None = None) -> np.ndarray:
        if ann is not None and "K" in ann:  # T-LESS per-annotation K
            k = np.asarray(ann["K"], np.float64).reshape(3, 3)
            return np.array([k[0, 0], k[1, 1], k[0, 2], k[1, 2]], np.float32)
        if "fx" in info:
            return np.array(
                [info["fx"], info["fy"], info["cx"], info["cy"]], np.float32
            )
        return np.asarray(self.spec.intrinsics, np.float32)

    def _cached(self, key, produce):
        if self._cache_limit <= 0:
            return produce()
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        arr = produce()
        if arr is not None and self._cache_used + arr.nbytes <= self._cache_limit:
            arr.setflags(write=False)
            self._cache[key] = arr
            self._cache_used += arr.nbytes
        return arr

    def load_image(self, index: int) -> np.ndarray:
        """RGB uint8 (the reference loads BGR for Caffe; we keep RGB and use
        an RGB-ordered mean, data/pipeline.py)."""

        def produce():
            info = self.images[index]
            return _decode_rgb(self._image_path(info, "_rgb"))

        return self._cached(("rgb", index), produce)

    def load_mask(self, index: int) -> np.ndarray | None:
        def produce():
            info = self.images[index]
            path = self._image_path(info, "_mask")
            if not os.path.exists(path):
                return None
            return np.asarray(Image.open(path))

        return self._cached(("mask", index), produce)

    def load_depth(self, index: int) -> np.ndarray | None:
        """(H, W) float32 depth in meters, or None when absent.

        Probes the `_dep` then `_dep_raw` file conventions of the reference
        loader (preprocessing/linemod.py:178-201); uint16 PNG values are
        scaled by depth_scale (BOP convention: mm -> m).
        """
        info = self.images[index]
        for suffix in ("_dep", "_dep_raw"):
            path = self._image_path(info, suffix)
            if os.path.exists(path):
                raw = np.asarray(Image.open(path))
                return raw.astype(np.float32) * self.depth_scale
        return None

    def has_depth(self) -> bool:
        if not self.images:
            return False
        return any(
            os.path.exists(self._image_path(self.images[0], s))
            for s in ("_dep", "_dep_raw")
        )

    def _parse_pose(self, pose: list[float]) -> tuple[np.ndarray, np.ndarray]:
        pose = np.asarray(pose, np.float64)
        trans = pose[:3]
        scale = self.spec.pose_unit_scale
        if scale is None:
            # Auto unit detection, matching the reference's own guess
            # (preprocessing/linemod.py:238-241 scales poses whose z is
            # implausibly small for mm). Datasets with a declared unit set
            # spec.pose_unit_scale instead.
            if abs(trans[2]) > 10.0:  # stored in mm -> meters
                trans = trans / 1000.0
        else:
            trans = trans * scale
        if len(pose) == 7:
            rot = _quat_to_mat_np(pose[3:7])
        else:
            rot = _euler_to_mat_np(pose[3:6])
        return rot, trans.astype(np.float32)

    def sample(self, index: int, augment: bool | None = None) -> tuple[np.ndarray, GroundTruth]:
        info = self.images[index]
        image = self.load_image(index)
        mask_img = self.load_mask(index)

        boxes, rots, transs, labels, mask_ids = [], [], [], [], []
        # Per-image intrinsics: the FIRST annotation carrying a K wins (all
        # annotations of one image share the physical camera; T-LESS's
        # per-annotation K exists because its train images are per-object
        # crops — one object per image, preprocessing/tless.py:174). A
        # mixed-K image would be malformed data; warn rather than silently
        # keep the last one.
        cam = self._intrinsics(info)
        cam_from_ann = False
        for ann in self.anns_by_image.get(info["id"], []):
            if (
                self.set_name == "train" or self.visibility_filter_all_splits
            ) and ann.get("feature_visibility", 1.0) < self.visibility_threshold:
                continue
            oid = ann["category_id"]
            if oid not in self.obj_to_label:
                continue
            x, y, bw, bh = ann["bbox"]
            rot, trans = self._parse_pose(ann["pose"])
            boxes.append([x, y, x + bw, y + bh])
            rots.append(rot)
            transs.append(trans)
            labels.append(self.obj_to_label[oid])
            mask_ids.append(ann.get("mask_id", -1))
            if "K" in ann:
                ann_cam = self._intrinsics(info, ann)
                if not cam_from_ann:
                    cam = ann_cam
                    cam_from_ann = True
                elif not np.allclose(ann_cam, cam):
                    import warnings

                    warnings.warn(
                        f"image {info['id']}: annotations carry differing K; "
                        "using the first"
                    )

        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        rots = np.asarray(rots, np.float32).reshape(-1, 3, 3)
        transs = np.asarray(transs, np.float32).reshape(-1, 3)
        labels = np.asarray(labels, np.int32).reshape(-1)

        # Native-resolution frames are scale-letterboxed to the static
        # spec.image_shape (the TPU equivalent of the reference's min/max-side
        # variable resize, utils/image.py:281-323 + generator.py:278-294):
        # boxes and intrinsics scale with the image, poses are untouched —
        # fx,fy,cx,cy absorb the scale so reprojection stays consistent.
        if image.shape[:2] != tuple(self.spec.image_shape):
            image, cam_adj, scale = resize_letterbox(
                image, self.spec.image_shape, cam
            )
            cam = cam_adj
            boxes = boxes * scale
            if mask_img is not None:
                mask_img = self._letterbox_nearest(mask_img, scale)

        do_aug = self.augment is not None if augment is None else augment
        if do_aug and len(boxes):
            # the affine is folded into `cam` (augment.transform_cam);
            # poses come back unchanged and stay exactly consistent with
            # the warped pixels under projection with the new intrinsics
            image, boxes, transs, mask_img, keep, cam = augment_sample(
                self.rng, image, boxes, transs, cam, mask_img, self.augment
            )
            boxes, rots, transs = boxes[keep], rots[keep], transs[keep]
            labels = labels[keep]
            mask_ids = [m for m, k in zip(mask_ids, keep) if k]

        mask_slots = self._mask_to_slots(mask_img, mask_ids)
        gt = pad_ground_truth(
            boxes, rots, transs, labels, cam, mask_slots, self.max_instances
        )
        return image, gt

    def _letterbox_nearest(self, plane: np.ndarray, scale: float) -> np.ndarray:
        """Nearest-neighbour letterbox of an id/depth plane onto the spec
        canvas with the SAME scale used for the RGB image (zero-fill pad)."""
        th, tw = self.spec.image_shape
        h, w = plane.shape[:2]
        nh = min(max(int(round(h * scale)), 1), th)
        nw = min(max(int(round(w * scale)), 1), tw)
        resized = np.asarray(
            Image.fromarray(plane).resize((nw, nh), Image.NEAREST)
        )
        out = np.zeros((th, tw), plane.dtype)
        out[:nh, :nw] = resized
        return out

    def _mask_to_slots(self, mask_img: np.ndarray | None, mask_ids: list) -> np.ndarray:
        """Instance-id mask -> P3-resolution slot-index map (-1 background)."""
        p3h, p3w = self.p3_shape
        if mask_img is None or not mask_ids:
            return np.full((p3h * p3w,), -1, np.int32)
        small = np.asarray(
            Image.fromarray(mask_img).resize((p3w, p3h), Image.NEAREST)
        )
        slots = np.full((p3h, p3w), -1, np.int32)
        for slot, mid in enumerate(mask_ids[: self.max_instances]):
            if mid < 0:
                continue
            slots[small == mid] = slot
        return slots.reshape(-1)

    def batch(self, indices: list[int], with_depth: bool = False):
        """(images, gt[, depth]) stacked over indices.

        with_depth adds a (B, H, W) float32 meter depth array (zeros where a
        frame has no depth file) — the eval-side input for VSD and ICP
        refinement (reference tless_eval.py:659-662, ycbv_eval.py:841-870).
        Depth is never augmented: it is a test-time signal only.
        """
        images, gts = zip(*(self.sample(i) for i in indices))
        out = (np.stack(images), stack_ground_truth(list(gts)))
        if not with_depth:
            return out
        if self.augment is not None:
            raise ValueError("with_depth requires an un-augmented dataset")
        h, w = self.spec.image_shape
        depth = np.zeros((len(indices), h, w), np.float32)
        for j, i in enumerate(indices):
            d = self.load_depth(i)
            if d is None:
                continue
            if d.shape[:2] != (h, w):
                # same letterbox scale as the RGB frame (depth values stay
                # metric; the scaled intrinsics keep backprojection exact)
                scale = min(
                    compute_resize_scale(d.shape[:2], min(h, w), max(h, w)),
                    h / d.shape[0], w / d.shape[1],
                )
                d = self._letterbox_nearest(d, scale)
            depth[j] = d
        return out + (depth,)

    def epoch_batches(
        self, batch_size: int, shuffle: bool = True, with_depth: bool = False
    ):
        """Yield (images, gt[, depth]) batches covering the dataset once."""
        order = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(order)
        usable = len(order) - len(order) % batch_size
        for i in range(0, usable, batch_size):
            yield self.batch(list(order[i : i + batch_size]), with_depth=with_depth)
