"""Per-dataset loaders and the dataset registry.

The reference ships one generator per dataset (preprocessing/{linemod,
occlusion,ycbv,tless,homebrewed,coco}.py), all near-clones of a base COCO-JSON
reader with small per-dataset deltas. Here the shared machinery lives in
`BopDataset` (data/bop.py) and this module captures only the deltas:

- LineMOD (preprocessing/linemod.py): 13 classes, train-time
  feature_visibility >= 0.5 filter (linemod.py:227-229).
- Occlusion / LM-O (preprocessing/occlusion.py): byte-identical clone of the
  LineMOD generator in the reference; here it differs only in its spec's
  8-object subset.
- YCB-Video (preprocessing/ycbv.py): trains 5 of 21 objects with remap
  {5,8,9,10,21}->{1..5} (ycbv.py:92-105); the visibility filter applies to
  every split, not just train (ycbv.py:263-265).
- T-LESS (preprocessing/tless.py): 6-dof xyz+euler poses (tless.py:189-196)
  and per-annotation intrinsics `K` (tless.py:174) — both handled by
  BopDataset's pose/intrinsics parsing.
- HomebrewedDB (preprocessing/homebrewed.py): linemod-style, 33 objects.
- COCO (preprocessing/coco.py): detection-only — bboxes + labels, no poses —
  backed by a plain-JSON reader (no pycocotools in this environment).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import numpy as np
from PIL import Image

from pyrapose_tpu.data.augment import AugmentConfig
from pyrapose_tpu.data.bop import BopDataset
from pyrapose_tpu.data.spec import DatasetSpec, dataset_spec


class LinemodDataset(BopDataset):
    dataset_name = "linemod"


class OcclusionDataset(BopDataset):
    dataset_name = "occlusion"


class YcbvDataset(BopDataset):
    """YCB-Video: 5-object subset; visibility filter on every split
    (preprocessing/ycbv.py:263-265)."""

    dataset_name = "ycbv"
    visibility_filter_all_splits = True


class TlessDataset(BopDataset):
    dataset_name = "tless"


class HomebrewedDataset(BopDataset):
    dataset_name = "homebrewed"


_DATASETS = {
    "linemod": LinemodDataset,
    "occlusion": OcclusionDataset,
    "ycbv": YcbvDataset,
    "tless": TlessDataset,
    "homebrewed": HomebrewedDataset,
}


def create_dataset(
    name: str,
    data_dir: str,
    set_name: str = "train",
    spec: DatasetSpec | None = None,
    max_instances: int = 16,
    augment: AugmentConfig | None = None,
    seed: int = 0,
    cache_bytes: int = 0,
) -> BopDataset:
    """Instantiate a pose dataset by name (reference: bin/train.py:158-265
    per-dataset generator dispatch)."""
    if name not in _DATASETS:
        raise ValueError(f"unknown dataset {name!r}; choose from {sorted(_DATASETS)}")
    cls = _DATASETS[name]
    if spec is None:
        spec = dataset_spec(name, data_dir)
    return cls(
        data_dir,
        set_name=set_name,
        spec=spec,
        name=name,
        max_instances=max_instances,
        augment=augment,
        seed=seed,
        cache_bytes=cache_bytes,
    )


class CocoDetectionDataset:
    """Detection-only COCO loader (reference preprocessing/coco.py, minus
    pycocotools). Yields images plus fixed-shape padded 2D boxes/labels for
    the detection path (2D AABB decode + NMS + mAP)."""

    def __init__(
        self,
        data_dir: str,
        set_name: str = "train2017",
        max_instances: int = 64,
        seed: int = 0,
    ):
        self.data_dir = data_dir
        self.set_name = set_name
        self.max_instances = max_instances
        self.rng = np.random.default_rng(seed)

        path = os.path.join(data_dir, "annotations", f"instances_{set_name}.json")
        with open(path) as f:
            data = json.load(f)
        self.images = data["images"]
        cats = sorted(data["categories"], key=lambda c: c["id"])
        self.cat_to_label = {c["id"]: i for i, c in enumerate(cats)}
        self.label_names = [c["name"] for c in cats]
        self.num_classes = len(cats)
        self.anns_by_image = defaultdict(list)
        for ann in data["annotations"]:
            if ann.get("iscrowd", 0):
                continue
            self.anns_by_image[ann["image_id"]].append(ann)

    def __len__(self) -> int:
        return len(self.images)

    def load_image(self, index: int) -> np.ndarray:
        info = self.images[index]
        path = os.path.join(self.data_dir, "images", self.set_name, info["file_name"])
        from pyrapose_tpu.data.bop import _decode_rgb

        return _decode_rgb(path)

    def sample(self, index: int) -> tuple[np.ndarray, dict]:
        """(image, {boxes (K,4), labels (K,), valid (K,)}) fixed shapes."""
        info = self.images[index]
        image = self.load_image(index)
        k = self.max_instances
        boxes = np.zeros((k, 4), np.float32)
        labels = np.zeros((k,), np.int32)
        valid = np.zeros((k,), bool)
        anns = self.anns_by_image.get(info["id"], [])[:k]
        for i, ann in enumerate(anns):
            x, y, w, h = ann["bbox"]
            boxes[i] = (x, y, x + w, y + h)
            labels[i] = self.cat_to_label[ann["category_id"]]
            valid[i] = True
        return image, {"boxes": boxes, "labels": labels, "valid": valid}

    def batch(
        self, indices: list[int], image_shape: tuple[int, int] = (480, 640)
    ) -> tuple[np.ndarray, dict]:
        """Letterboxed fixed-shape batch: COCO frames vary per image, so
        each is scale-letterboxed to `image_shape` (the reference resizes
        min/max-side per image, bin/evaluate.py:154-155) with GT boxes
        scaled to match."""
        from pyrapose_tpu.data.image import resize_letterbox

        images, gts = [], []
        for i in indices:
            img, gt = self.sample(i)
            img, _cam, scale = resize_letterbox(img, image_shape)
            gt = dict(gt, boxes=gt["boxes"] * scale)
            images.append(img)
            gts.append(gt)
        return np.stack(images), {
            key: np.stack([g[key] for g in gts]) for key in gts[0]
        }
