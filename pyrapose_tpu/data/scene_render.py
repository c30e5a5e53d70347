"""Offline synthetic scene rendering: meshes -> training images.

Capability match of the reference's synthetic data scripts
(annotation_scripts/render_custom_from_mesh.py:66-120: `bop_renderer` draws
BOP meshes in random poses over COCO backgrounds, then annotations are
derived per object; misc.py:54-90 computes per-corner feature visibility by
depth z-test). This module is the framework-native equivalent:

- a numpy triangle rasterizer with z-buffer and Lambertian shading (no GL /
  external renderer dependency — this is offline data prep, host-side by
  design; the training hot path never touches it);
- scene composition over a background image (or procedural noise), with
  instance-id masks, depth, per-object bbox and corner-visibility
  annotations;
- a dataset writer producing the exact BOP-converted layout the training
  loader consumes (data/bop.py: instances_{set}.json + {stem}_rgb/_dep/_mask
  + models_info.json), so `pyrapose train <ds> <out_dir>` runs directly on
  the rendered data.
"""

from __future__ import annotations

import json
import os

import numpy as np

from pyrapose_tpu.utils.ply import load_ply


def rasterize_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    rot: np.ndarray,
    trans: np.ndarray,
    cam: np.ndarray,
    shape: tuple[int, int],
    base_color: tuple[float, float, float] = (0.7, 0.7, 0.7),
    light_dir: tuple[float, float, float] = (0.3, -0.5, -0.8),
) -> tuple[np.ndarray, np.ndarray]:
    """Render one posed mesh: returns (rgb float (H,W,3) in [0,1], depth (H,W)).

    Painter-free z-buffer rasterization with per-face Lambertian shading.
    Triangles are processed in batches of bounding-box scanline fills —
    vectorized barycentric coverage per face.
    """
    h, w = shape
    fx, fy, cx, cy = [float(v) for v in cam]
    v_cam = vertices @ np.asarray(rot, np.float64).T + np.asarray(trans, np.float64)
    z = v_cam[:, 2]
    # project
    u = v_cam[:, 0] * fx / np.maximum(z, 1e-9) + cx
    v = v_cam[:, 1] * fy / np.maximum(z, 1e-9) + cy
    pts = np.stack([u, v], axis=1)

    depth = np.full((h, w), np.inf, np.float64)
    rgb = np.zeros((h, w, 3), np.float64)

    tri = faces.astype(np.int64)
    p0, p1, p2 = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]
    z0, z1, z2 = z[tri[:, 0]], z[tri[:, 1]], z[tri[:, 2]]

    # face normals (camera frame) for shading + backface culling
    e1 = v_cam[tri[:, 1]] - v_cam[tri[:, 0]]
    e2 = v_cam[tri[:, 2]] - v_cam[tri[:, 0]]
    n = np.cross(e1, e2)
    n_norm = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(n_norm, 1e-12)
    ld = np.asarray(light_dir, np.float64)
    ld = ld / np.linalg.norm(ld)
    shade = 0.35 + 0.65 * np.abs(n @ ld)  # two-sided lambert + ambient

    front = (z0 > 1e-6) & (z1 > 1e-6) & (z2 > 1e-6)
    base = np.asarray(base_color, np.float64)

    for f in np.nonzero(front)[0]:
        a, b, c = p0[f], p1[f], p2[f]
        xmin = max(int(np.floor(min(a[0], b[0], c[0]))), 0)
        xmax = min(int(np.ceil(max(a[0], b[0], c[0]))), w - 1)
        ymin = max(int(np.floor(min(a[1], b[1], c[1]))), 0)
        ymax = min(int(np.ceil(max(a[1], b[1], c[1]))), h - 1)
        if xmin > xmax or ymin > ymax:
            continue
        xs = np.arange(xmin, xmax + 1)
        ys = np.arange(ymin, ymax + 1)
        gx, gy = np.meshgrid(xs, ys)
        # barycentric coordinates
        d = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if abs(d) < 1e-12:
            continue
        l0 = ((b[1] - c[1]) * (gx - c[0]) + (c[0] - b[0]) * (gy - c[1])) / d
        l1 = ((c[1] - a[1]) * (gx - c[0]) + (a[0] - c[0]) * (gy - c[1])) / d
        l2 = 1.0 - l0 - l1
        cover = (l0 >= -1e-9) & (l1 >= -1e-9) & (l2 >= -1e-9)
        if not cover.any():
            continue
        # perspective-correct-enough depth (screen-space barycentric over
        # 1/z would be exact; linear z is fine at object scale)
        zf = l0 * z0[f] + l1 * z1[f] + l2 * z2[f]
        sub_depth = depth[ymin : ymax + 1, xmin : xmax + 1]
        closer = cover & (zf < sub_depth)
        sub_depth[closer] = zf[closer]
        rgb[ymin : ymax + 1, xmin : xmax + 1][closer] = base * shade[f]

    depth = np.where(np.isfinite(depth), depth, 0.0)
    return rgb, depth


class SceneRenderer:
    """Composites several posed meshes over a background into one training
    sample (render_custom_from_mesh.py:66-120 capability)."""

    def __init__(self, meshes: dict[int, dict], cam, shape=(480, 640)):
        """meshes: {obj_id: {'pts': (V,3) meters, 'faces': (F,3)}}."""
        self.meshes = meshes
        self.cam = np.asarray(cam, np.float64)
        self.shape = shape

    def render(
        self,
        instances: list[tuple[int, np.ndarray, np.ndarray]],
        background: np.ndarray | None = None,
        rng: np.random.Generator | None = None,
    ) -> dict:
        """instances: [(obj_id, rot (3,3), trans (3,))]. Returns a dict with
        rgb (H,W,3 u8), depth (H,W float m), mask (H,W u8 instance ids,
        0 = background), and per-instance annotation records."""
        rng = rng or np.random.default_rng()
        h, w = self.shape
        depth = np.full((h, w), np.inf)
        rgb = np.zeros((h, w, 3))
        mask = np.zeros((h, w), np.uint8)

        per_inst_depth = []
        for i, (oid, rot, trans) in enumerate(instances):
            mesh = self.meshes[oid]
            color = tuple(rng.uniform(0.35, 0.9, 3))
            obj_rgb, obj_depth = rasterize_mesh(
                mesh["pts"], mesh["faces"], rot, trans, self.cam, self.shape,
                base_color=color,
            )
            od = np.where(obj_depth > 0, obj_depth, np.inf)
            closer = od < depth
            depth[closer] = od[closer]
            rgb[closer] = obj_rgb[closer]
            mask[closer] = i + 1
            per_inst_depth.append(od)

        depth = np.where(np.isfinite(depth), depth, 0.0)
        if background is None:
            background = rng.integers(
                0, 255, (h, w, 3), dtype=np.uint8
            ).astype(np.float64) / 255.0
        else:
            background = np.asarray(background, np.float64) / 255.0
            if background.shape[:2] != (h, w):
                from PIL import Image

                background = np.asarray(
                    Image.fromarray(
                        (background * 255).astype(np.uint8)
                    ).resize((w, h))
                ).astype(np.float64) / 255.0
        fg = mask > 0
        out = np.where(fg[..., None], rgb, background)
        out_u8 = np.clip(out * 255.0, 0, 255).astype(np.uint8)

        annotations = []
        for i, (oid, rot, trans) in enumerate(instances):
            inst = mask == (i + 1)
            if not inst.any():
                continue
            ys, xs = np.nonzero(inst)
            bbox = [
                float(xs.min()), float(ys.min()),
                float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1),
            ]
            visible_frac = float(inst.sum()) / max(
                float((per_inst_depth[i] < np.inf).sum()), 1.0
            )
            annotations.append(
                dict(
                    obj_id=oid, mask_id=i + 1, bbox=bbox, rot=rot, trans=trans,
                    visibility=visible_frac,
                )
            )
        return dict(rgb=out_u8, depth=depth, mask=mask, annotations=annotations)


def _mat_to_quat(m: np.ndarray) -> np.ndarray:
    from pyrapose_tpu.data.annotate import _mat_to_quat as f

    return f(np.asarray(m, np.float64))


def generate_synthetic_dataset(
    models_dir: str,
    out_dir: str,
    n_images: int = 100,
    set_name: str = "train",
    obj_ids: list[int] | None = None,
    backgrounds_dir: str | None = None,
    cam=(572.4114, 573.57043, 325.2611, 242.04899),
    shape=(480, 640),
    instances_per_image=(1, 3),
    max_mesh_faces: int = 4000,
    seed: int = 0,
    workers: int = 1,
    worker_index: int = 0,
) -> dict | None:
    """Render a BOP-converted synthetic training set from a models directory.

    models_dir must hold obj_{id:06d}.ply (or obj_{id:02d}.ply) meshes and a
    models_info.json/yml (BOP layout). Output = the training layout
    data/bop.py consumes. Reference counterpart:
    annotation_scripts/render_custom_from_mesh.py + annotate_BOP.py.

    workers/worker_index: stripe the image indices over `workers`
    cooperating processes (each renders idx % workers == worker_index and
    writes only the per-image sidecars — every image's content depends
    solely on (seed, idx), so stripes compose). Worker processes return
    None; a final run with workers=1 assembles instances_{set}.json from
    the sidecars, skipping all finished images.
    """
    from PIL import Image

    from pyrapose_tpu.data.annotate import (
        _symmetries,
        canonicalize_continuous,
        canonicalize_discrete,
    )
    from pyrapose_tpu.data.spec import load_models_info

    rng = np.random.default_rng(seed)

    info_path = None
    for cand in ("models_info.json", "models_info.yml"):
        p = os.path.join(models_dir, cand)
        if os.path.exists(p):
            info_path = p
            break
    if info_path is None:
        raise FileNotFoundError(f"models_info not found in {models_dir}")
    models_info = {
        int(k): v for k, v in load_models_info(info_path).items()
    }

    available = sorted(int(k) for k in models_info)
    obj_ids = obj_ids or available

    meshes = {}
    for oid in obj_ids:
        path = None
        for pattern in (f"obj_{oid:06d}.ply", f"obj_{oid:02d}.ply"):
            cand = os.path.join(models_dir, pattern)
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            raise FileNotFoundError(f"mesh for object {oid} not in {models_dir}")
        mesh = load_ply(path)
        pts = np.asarray(mesh["pts"], np.float64)
        if np.abs(pts).max() > 10.0:  # BOP meshes are mm
            pts = pts * 1e-3
        faces = np.asarray(mesh.get("faces"), np.int64)
        if faces is None or len(faces) == 0:
            raise ValueError(f"mesh {path} has no faces")
        if len(faces) > max_mesh_faces:  # decimate by uniform face subsample
            keep = rng.choice(len(faces), max_mesh_faces, replace=False)
            faces = faces[keep]
        meshes[oid] = {"pts": pts, "faces": faces}

    backgrounds = []
    if backgrounds_dir and os.path.isdir(backgrounds_dir):
        backgrounds = sorted(
            os.path.join(backgrounds_dir, f)
            for f in os.listdir(backgrounds_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )

    os.makedirs(os.path.join(out_dir, "annotations"), exist_ok=True)
    img_dir = os.path.join(out_dir, "images", set_name)
    os.makedirs(img_dir, exist_ok=True)
    # pass models_info through so dataset_spec() resolves on the output
    with open(os.path.join(out_dir, "annotations", "models_info.json"), "w") as f:
        json.dump({str(k): v for k, v in models_info.items()}, f)

    renderer = SceneRenderer(meshes, cam, shape)
    fx, fy, cx, cy = cam
    h, w = shape

    # Restartable rendering: each image gets its own RNG stream derived from
    # (seed, idx), and its annotations are flushed to an atomic per-image
    # sidecar right after the PNGs. A rerun of the same command skips every
    # image whose sidecar + PNG trio already exist, so a killed render (VM
    # preemption, OOM) loses at most the in-flight image.
    images, annotations = [], []
    ann_id = 0
    for idx in range(n_images):
        if workers > 1 and idx % workers != worker_index:
            continue
        stem = os.path.join(img_dir, f"{idx:08d}")
        sidecar = stem + "_ann.json"
        image_rec = dict(id=idx, file_name=f"{idx:08d}.png", width=w, height=h,
                         fx=fx, fy=fy, cx=cx, cy=cy)
        if os.path.exists(sidecar) and all(
            os.path.exists(stem + s) for s in ("_rgb.png", "_mask.png", "_dep.png")
        ):
            with open(sidecar) as f:
                cached = json.load(f)
        else:
            img_rng = np.random.default_rng([seed, idx])
            k = int(img_rng.integers(
                instances_per_image[0], instances_per_image[1] + 1))
            chosen = img_rng.choice(
                obj_ids, size=min(k, len(obj_ids)), replace=False)
            instances = []
            for oid in chosen:
                # random rotation via quaternion sample
                q = img_rng.normal(size=4)
                q /= np.linalg.norm(q)
                w_, x_, y_, z_ = q
                rot = np.array([
                    [1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - z_ * w_), 2 * (x_ * z_ + y_ * w_)],
                    [2 * (x_ * y_ + z_ * w_), 1 - 2 * (x_ * x_ + z_ * z_), 2 * (y_ * z_ - x_ * w_)],
                    [2 * (x_ * z_ - y_ * w_), 2 * (y_ * z_ + x_ * w_), 1 - 2 * (x_ * x_ + y_ * y_)],
                ])
                zdist = img_rng.uniform(0.55, 1.4)
                xr = (img_rng.uniform(0.15, 0.85) * w - cx) * zdist / fx
                yr = (img_rng.uniform(0.15, 0.85) * h - cy) * zdist / fy
                trans = np.array([xr, yr, zdist])
                # Symmetric-object pose canonicalization, exactly as the
                # offline BOP converter does it (annotate_BOP.py:45-87 via
                # data/annotate.py): without it, symmetric classes feed
                # contradictory corner targets for visually identical views.
                axis, disc = _symmetries(models_info[int(oid)])
                if axis is not None:
                    rot = canonicalize_continuous(rot, trans, axis)
                if disc is not None:
                    rot, trans = canonicalize_discrete(rot, trans, disc)
                instances.append((int(oid), rot, trans))

            background = None
            if backgrounds:
                background = np.asarray(
                    Image.open(
                        backgrounds[int(img_rng.integers(len(backgrounds)))])
                    .convert("RGB")
                )
            sample = renderer.render(
                instances, background=background, rng=img_rng)

            Image.fromarray(sample["rgb"]).save(stem + "_rgb.png")
            Image.fromarray(sample["mask"]).save(stem + "_mask.png")
            dep_mm = np.clip(sample["depth"] * 1000.0, 0, 65535).astype(np.uint16)
            Image.fromarray(dep_mm).save(stem + "_dep.png")

            cached = []
            for ann in sample["annotations"]:
                quat = _mat_to_quat(ann["rot"])
                cached.append(
                    dict(
                        category_id=int(ann["obj_id"]),
                        bbox=[float(v) for v in ann["bbox"]],
                        pose=[float(v) for v in ann["trans"]]
                        + [float(v) for v in quat],
                        mask_id=int(ann["mask_id"]),
                        feature_visibility=float(ann["visibility"]),
                    )
                )
            tmp = sidecar + ".tmp"
            with open(tmp, "w") as f:
                json.dump(cached, f)
            os.replace(tmp, sidecar)

        images.append(image_rec)
        for ann in cached:
            annotations.append(dict(id=ann_id, image_id=idx, **ann))
            ann_id += 1

    if workers > 1:
        return None  # stripe worker: sidecars only, no (partial) index
    index = dict(images=images, annotations=annotations)
    with open(
        os.path.join(out_dir, "annotations", f"instances_{set_name}.json"), "w"
    ) as f:
        json.dump(index, f)
    return index
