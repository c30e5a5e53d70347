"""Offline BOP -> COCO-style annotation conversion.

Re-implementation of the reference's offline data tool
(/root/reference/annotation_scripts/annotate_BOP.py): walks a BOP-format
dataset (scene_camera.json / scene_gt.json / scene_gt_info.json, rgb/,
depth/, mask_visib/), canonicalizes symmetric-object rotations, and writes
the training layout every loader consumes:

    {out}/annotations/instances_{set}.json
    {out}/annotations/models_info.json
    {out}/images/{set}/{id:08d}_rgb.png / _dep.png / _mask.png

Annotation schema matches annotate_BOP.py:460-474: bbox (xywh), pose
(xyz mm + wxyz quaternion), segmentation = 16 projected corner coordinates,
mask_id, feature_visibility (= BOP visib_fract).

Symmetry canonicalization (annotate_BOP.py:45-87):
- continuous: rotate about the object's symmetry axis so the camera
  direction in object frame has a fixed azimuth;
- discrete: apply the symmetry transform when the transformed z-axis is
  closer to the base orientation (> 90 deg test).
Symmetry data comes from BOP models_info (symmetries_continuous /
symmetries_discrete) instead of the reference's hard-coded tables.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
from PIL import Image

from pyrapose_tpu.data.spec import load_models_info

# The reference remaps YCB-V to its 5 trained objects at annotation time
# (annotate_BOP.py:455-465); this framework remaps in the loader instead
# (data/spec.py), so the converter keeps BOP object ids.


def canonicalize_continuous(
    rot: np.ndarray, trans: np.ndarray, axis: np.ndarray
) -> np.ndarray:
    """Continuous-symmetry canonicalization (annotate_BOP.py:45-65).

    Rotates `rot` about the object-frame symmetry axis so the camera center
    direction (in object frame) lands at a canonical azimuth. axis: unit
    {x,y,z} one-hot.
    """
    pose = np.eye(4, dtype=np.float64)
    pose[:3, :3] = rot
    pose[:3, 3] = trans
    cam_in_obj = np.linalg.inv(pose) @ np.array([0.0, 0.0, 0.0, 1.0])

    def rot_about(axis_idx: int, alpha: float) -> np.ndarray:
        c, s = np.cos(alpha), np.sin(alpha)
        m = np.eye(3)
        i, j = [(1, 2), (2, 0), (0, 1)][axis_idx]
        m[i, i] = c
        m[j, j] = c
        m[i, j] = -s
        m[j, i] = s
        return m

    if axis[0]:
        alpha = np.arctan2(cam_in_obj[2], cam_in_obj[1])
        return rot @ rot_about(0, alpha)
    if axis[1]:
        alpha = np.arctan2(cam_in_obj[0], cam_in_obj[2])
        return rot @ rot_about(1, alpha)
    alpha = np.arctan2(cam_in_obj[1], cam_in_obj[0])
    return rot @ rot_about(2, alpha)


def canonicalize_discrete(
    rot: np.ndarray, trans: np.ndarray, sym: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Discrete-symmetry canonicalization (annotate_BOP.py:68-87).

    sym: 4x4 symmetry transform in object frame. Applies it when it brings
    the pose's z-direction within 90 deg of the symmetry base direction.
    """
    pose = np.eye(4)
    pose[:3, :3] = rot
    pose[:3, 3] = trans
    rot_sym = pose @ sym
    base_dir = sym[:3, :3] @ np.array([0.0, 0.0, 1.0])
    pose_dir = rot_sym[:3, :3] @ np.array([0.0, 0.0, 1.0])
    ang = np.arccos(np.clip(np.dot(pose_dir, base_dir), -1.0, 1.0))
    if ang > np.pi * 0.5:
        return rot_sym[:3, :3], rot_sym[:3, 3]
    return rot, trans


def _mat_to_quat(m: np.ndarray) -> np.ndarray:
    """Rotation matrix -> wxyz quaternion."""
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [0.25 * s, (m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
             (m[1, 0] - m[0, 1]) / s]
        )
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(1.0 + m[i, i] - m[j, j] - m[k, k], 1e-12)) * 2
    q = np.zeros(4)
    q[0] = (m[k, j] - m[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (m[j, i] + m[i, j]) / s
    q[1 + k] = (m[k, i] + m[i, k]) / s
    return q


def _box_corners(info: dict) -> np.ndarray:
    from pyrapose_tpu.data.spec import box_corners_from_extents

    mn = np.array([info["min_x"], info["min_y"], info["min_z"]], np.float64)
    sz = np.array([info["size_x"], info["size_y"], info["size_z"]], np.float64)
    return box_corners_from_extents(mn, sz)


def _symmetries(info: dict):
    """Per-object (continuous_axis | None, discrete_4x4 | None)."""
    axis = None
    disc = None
    for s in info.get("symmetries_continuous", []):
        axis = np.asarray(s["axis"], np.float64)
        break
    for s in info.get("symmetries_discrete", []):
        disc = np.asarray(s, np.float64).reshape(4, 4)
        break
    return axis, disc


def annotate_bop(
    bop_root: str,
    out_root: str,
    set_name: str = "train",
    scenes: list[str] | None = None,
    min_visib: float = 0.0,
    copy_depth: bool = True,
) -> dict:
    """Convert BOP scene directories under bop_root into the training layout.

    bop_root must contain models_info.json (or models/models_info.json) and
    scene directories with scene_gt.json etc. Returns the COCO dict written.
    """
    mi_path = None
    for cand in ("models_info.json", os.path.join("models", "models_info.json"),
                 "models_info.yml"):
        p = os.path.join(bop_root, cand)
        if os.path.exists(p):
            mi_path = p
            break
    if mi_path is None:
        raise FileNotFoundError(f"models_info not found under {bop_root}")
    models_info = load_models_info(mi_path)
    models_info = {int(k): v for k, v in models_info.items()}
    corners = {oid: _box_corners(v) for oid, v in models_info.items()}
    sym = {oid: _symmetries(v) for oid, v in models_info.items()}

    ann_dir = os.path.join(out_root, "annotations")
    img_dir = os.path.join(out_root, "images", set_name)
    os.makedirs(ann_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    with open(os.path.join(ann_dir, "models_info.json"), "w") as f:
        json.dump({str(k): v for k, v in models_info.items()}, f)

    if scenes is None:
        scenes = sorted(
            d for d in os.listdir(bop_root)
            if os.path.isdir(os.path.join(bop_root, d)) and d.isdigit()
        )

    out = {"images": [], "annotations": [], "categories": []}
    for oid, info in sorted(models_info.items()):
        out["categories"].append(
            {"id": oid, "name": f"obj_{oid:06d}", "supercategory": "object"}
        )

    img_id = 0
    ann_id = 0
    for scene in scenes:
        sdir = os.path.join(bop_root, scene)
        with open(os.path.join(sdir, "scene_camera.json")) as f:
            scene_cam = json.load(f)
        with open(os.path.join(sdir, "scene_gt.json")) as f:
            scene_gt = json.load(f)
        gt_info = {}
        info_path = os.path.join(sdir, "scene_gt_info.json")
        if os.path.exists(info_path):
            with open(info_path) as f:
                gt_info = json.load(f)

        for frame_key in sorted(scene_gt, key=int):
            cam = scene_cam[frame_key]
            k_mat = np.asarray(cam["cam_K"], np.float64).reshape(3, 3)
            fx, fy, cx, cy = k_mat[0, 0], k_mat[1, 1], k_mat[0, 2], k_mat[1, 2]

            stem = f"{img_id:08d}"
            # locate the rgb frame (BOP: rgb/{frame:06d}.png or .jpg)
            src_rgb = None
            for ext in (".png", ".jpg"):
                p = os.path.join(sdir, "rgb", f"{int(frame_key):06d}{ext}")
                if os.path.exists(p):
                    src_rgb = p
                    break
            if src_rgb is None:
                continue
            rgb = Image.open(src_rgb).convert("RGB")
            w, h = rgb.size
            rgb.save(os.path.join(img_dir, stem + "_rgb.png"))
            if copy_depth:
                src_dep = os.path.join(sdir, "depth", f"{int(frame_key):06d}.png")
                if os.path.exists(src_dep):
                    shutil.copyfile(
                        src_dep, os.path.join(img_dir, stem + "_dep.png")
                    )

            mask_img = np.zeros((h, w), np.uint8)
            out["images"].append(
                {
                    "id": img_id,
                    "file_name": stem + ".png",
                    "width": w,
                    "height": h,
                    "fx": float(fx), "fy": float(fy),
                    "cx": float(cx), "cy": float(cy),
                }
            )

            for gi, gt in enumerate(scene_gt[frame_key]):
                oid = int(gt["obj_id"])
                rot = np.asarray(gt["cam_R_m2c"], np.float64).reshape(3, 3)
                trans = np.asarray(gt["cam_t_m2c"], np.float64)  # mm

                axis, disc = sym.get(oid, (None, None))
                if axis is not None:
                    rot = canonicalize_continuous(rot, trans, axis)
                elif disc is not None:
                    rot, trans = canonicalize_discrete(rot, trans, disc)

                info_rec = (gt_info.get(frame_key) or [{}] * (gi + 1))[gi] if gt_info else {}
                visib = float(info_rec.get("visib_fract", 1.0))
                if visib < min_visib:
                    continue
                bbox = info_rec.get("bbox_obj", None)
                pts = corners[oid] @ rot.T + trans
                u = pts[:, 0] * fx / pts[:, 2] + cx
                v = pts[:, 1] * fy / pts[:, 2] + cy
                box3d = np.stack([u, v], axis=1).reshape(16)
                if bbox is None:
                    x1, y1 = float(u.min()), float(v.min())
                    bbox = [x1, y1, float(u.max()) - x1, float(v.max()) - y1]

                # merge visib mask with per-annotation mask id
                mask_id = gi + 1
                mpath = os.path.join(
                    sdir, "mask_visib", f"{int(frame_key):06d}_{gi:06d}.png"
                )
                if os.path.exists(mpath):
                    m = np.asarray(Image.open(mpath)) > 0
                    mask_img[m] = mask_id

                quat = _mat_to_quat(rot)
                out["annotations"].append(
                    {
                        "id": ann_id,
                        "image_id": img_id,
                        "category_id": oid,
                        "bbox": [float(b) for b in bbox],
                        "pose": [float(x) for x in (*trans, *quat)],
                        "segmentation": [float(x) for x in box3d],
                        "mask_id": mask_id,
                        "area": float(bbox[2] * bbox[3]),
                        "iscrowd": 0,
                        "feature_visibility": visib,
                    }
                )
                ann_id += 1

            Image.fromarray(mask_img).save(
                os.path.join(img_dir, stem + "_mask.png")
            )
            img_id += 1

    with open(os.path.join(ann_dir, f"instances_{set_name}.json"), "w") as f:
        json.dump(out, f)
    return out
