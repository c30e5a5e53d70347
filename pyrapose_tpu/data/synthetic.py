"""Synthetic pose dataset for tests, benchmarks, and smoke training.

The reference has no test data story at all (SURVEY.md section 4); this module
provides the fixed-seed fake-data backend of the test pyramid: random rigid
poses of a spec's 3D boxes, projected to ground-truth corner/bbox/mask
annotations, with cheap procedurally "rendered" images (textured quad per
object over noise) so that an end-to-end train loop has learnable signal.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation as _ScipyRot

from pyrapose_tpu.data.pipeline import GroundTruth, pad_ground_truth, stack_ground_truth
from pyrapose_tpu.data.spec import DatasetSpec


class SyntheticPoseDataset:
    """Deterministic synthetic scenes for a DatasetSpec."""

    def __init__(
        self,
        spec: DatasetSpec,
        num_images: int = 64,
        max_instances: int = 8,
        instances_per_image: tuple[int, int] = (1, 3),
        seed: int = 0,
    ):
        self.spec = spec
        self.num_images = num_images
        self.max_instances = max_instances
        self.instances_per_image = instances_per_image
        self.seed = seed
        h, w = spec.image_shape
        self.p3_shape = ((h + 7) // 8, (w + 7) // 8)
        # Scale the spec intrinsics to the (possibly reduced) image size so
        # the principal point stays centered and objects stay in frame.
        fx, fy, cx, cy = spec.intrinsics
        sx, sy = w / 640.0, h / 480.0
        self.intrinsics = (fx * sx, fy * sy, cx * sx, cy * sy)

    def __len__(self) -> int:
        return self.num_images

    def _sample_pose(self, rng: np.random.Generator):
        rot = _ScipyRot.random(random_state=int(rng.integers(1 << 30))).as_matrix()
        trans = np.array(
            [rng.uniform(-0.15, 0.15), rng.uniform(-0.1, 0.1), rng.uniform(0.6, 1.4)],
            np.float32,
        )
        return rot.astype(np.float32), trans

    def _project_corners(self, cls: int, rot: np.ndarray, trans: np.ndarray):
        fx, fy, cx, cy = self.intrinsics
        pts = self.spec.corners3d[cls] @ rot.T + trans
        u = pts[:, 0] * fx / pts[:, 2] + cx
        v = pts[:, 1] * fy / pts[:, 2] + cy
        return np.stack([u, v], axis=1)

    def sample(self, index: int) -> tuple[np.ndarray, GroundTruth]:
        """One synthetic image + padded ground truth."""
        rng = np.random.default_rng(self.seed * 100003 + index)
        h, w = self.spec.image_shape
        # background: a quarter-res noise block tiled to full size — visually
        # equivalent clutter at 1/16th the RNG cost (RNG was the dominant
        # per-sample cost on single-core hosts)
        bh, bw = max(h // 4, 1), max(w // 4, 1)
        block = rng.integers(0, 60, (bh, bw, 3), dtype=np.uint8)
        image = np.tile(block, (-(-h // bh), -(-w // bw), 1))[:h, :w].copy()
        p3h, p3w = self.p3_shape
        mask_p3 = np.full((p3h, p3w), -1, np.int32)

        n = int(rng.integers(self.instances_per_image[0], self.instances_per_image[1] + 1))
        n = min(n, self.spec.num_classes)
        # distinct classes per image: the ADD(-S) protocol scores one pose per
        # class per image (reference linemod_eval.py single-instance loop)
        classes = rng.choice(self.spec.num_classes, n, replace=False)
        boxes, rots, transs, labels = [], [], [], []
        slot = 0
        for cls in classes:
            cls = int(cls)
            for _ in range(8):  # retry until the object is fully in view
                rot, trans = self._sample_pose(rng)
                pix = self._project_corners(cls, rot, trans)
                x1, y1 = pix.min(axis=0)
                x2, y2 = pix.max(axis=0)
                if x1 >= 0 and y1 >= 0 and x2 < w and y2 < h and (x2 - x1) > 12 and (y2 - y1) > 12:
                    break
            else:
                continue
            # "render": textured rectangle with class-dependent colour
            xi1, yi1, xi2, yi2 = int(x1), int(y1), int(x2) + 1, int(y2) + 1
            color = np.array(
                [80 + 12 * (cls % 13), 60 + 9 * ((cls * 5) % 17), 70 + 7 * ((cls * 3) % 19)],
                np.uint8,
            )
            patch = rng.integers(-20, 20, (yi2 - yi1, xi2 - xi1, 3))
            image[yi1:yi2, xi1:xi2] = np.clip(color[None, None] + patch, 0, 255).astype(np.uint8)
            # P3 mask of the instance footprint
            mask_p3[yi1 // 8 : max(yi2 // 8, yi1 // 8 + 1), xi1 // 8 : max(xi2 // 8, xi1 // 8 + 1)] = slot

            boxes.append([x1, y1, x2, y2])
            rots.append(rot)
            transs.append(trans)
            labels.append(cls)
            slot += 1

        cam = np.asarray(self.intrinsics, np.float32)
        gt = pad_ground_truth(
            np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(rots, np.float32).reshape(-1, 3, 3),
            np.asarray(transs, np.float32).reshape(-1, 3),
            np.asarray(labels, np.int32).reshape(-1),
            cam,
            mask_p3.reshape(-1),
            self.max_instances,
        )
        return image, gt

    def _box_surface_points(self, cls: int, n: int = 16) -> np.ndarray:
        """Dense grid on the 6 faces of the class's 3D box (object frame)."""
        c = self.spec.corners3d[cls]
        lo, hi = c.min(axis=0), c.max(axis=0)
        t = np.linspace(0.0, 1.0, n)
        u, v = np.meshgrid(t, t, indexing="ij")
        u, v = u.ravel(), v.ravel()
        faces = []
        for axis in range(3):
            a, b = (axis + 1) % 3, (axis + 2) % 3
            for val in (lo[axis], hi[axis]):
                pts = np.empty((n * n, 3), np.float32)
                pts[:, axis] = val
                pts[:, a] = lo[a] + u * (hi[a] - lo[a])
                pts[:, b] = lo[b] + v * (hi[b] - lo[b])
                faces.append(pts)
        return np.concatenate(faces, axis=0)

    def render_depth(self, index: int) -> np.ndarray:
        """(H, W) float32 meter depth of the scene: z-buffer splat of dense
        box-surface points under the GT poses (0 = no data). Test-grade
        stand-in for a real sensor depth image, enough to drive the VSD and
        ICP paths end-to-end."""
        _, gt = self.sample(index)
        h, w = self.spec.image_shape
        fx, fy, cx, cy = self.intrinsics
        depth = np.zeros((h, w), np.float32)
        zbuf = np.full((h, w), np.inf, np.float32)
        for k in range(self.max_instances):
            if not gt.valid[k]:
                continue
            pts = self._box_surface_points(int(gt.labels[k]))
            pc = pts @ np.asarray(gt.rot[k]).T + np.asarray(gt.trans[k])
            z = pc[:, 2]
            ok = z > 1e-6
            u = np.clip((pc[ok, 0] * fx / z[ok] + cx).astype(int), 0, w - 1)
            v = np.clip((pc[ok, 1] * fy / z[ok] + cy).astype(int), 0, h - 1)
            zo = z[ok]
            order = np.argsort(-zo)  # far first so near overwrites
            u, v, zo = u[order], v[order], zo[order]
            closer = zo < zbuf[v, u]
            zbuf[v[closer], u[closer]] = zo[closer]
            depth[v[closer], u[closer]] = zo[closer]
        return depth

    def batch(self, indices: list[int], with_depth: bool = False):
        """Stacked batch of images (B, H, W, 3 uint8) and GroundTruth
        (+ synthetic depth when with_depth)."""
        images, gts = zip(*(self.sample(i) for i in indices))
        out = (np.stack(images), stack_ground_truth(list(gts)))
        if not with_depth:
            return out
        depth = np.stack([self.render_depth(i) for i in indices])
        return out + (depth,)
