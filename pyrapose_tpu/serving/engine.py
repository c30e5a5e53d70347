"""Serving engine: one-call image -> per-class 6D poses (+ masks, + ICP).

The core of both serving frontends (HTTP and ROS). Capability match of the
reference ROS node's run_estimation (PyraPose_ROS_wrapper/pyrapose_node.py:
552-770): preprocess, network, per-class pose recovery, P3-mask upsampling,
and optional depth-based ICP refinement — except the whole image->pose path
is one jitted program on device, and the ICP is the fixed-iteration
point-to-plane JAX solver (pose/icp.py) instead of cv2.ppf_match_3d_ICP.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pyrapose_tpu.data.spec import DatasetSpec
from pyrapose_tpu.inference import build_inference_fn
from pyrapose_tpu.models import ModelConfig, PyraPose
from pyrapose_tpu.pose import RansacConfig
from pyrapose_tpu.pose.icp import (
    depth_to_points,
    estimate_normals_host,
    icp_point_to_plane,
)


@dataclasses.dataclass
class ServingConfig:
    score_threshold: float = 0.5  # pyrapose_node.py threshold semantics
    mask_threshold: float = 0.5  # mask > 0.5 (pyrapose_node.py:602-611)
    icp: bool = False
    icp_iterations: int = 10
    icp_max_corr_dist: float = 0.02
    icp_min_mask_area: int = 3000  # reference gate (pyrapose_node.py:662)
    depth_stride: int = 4
    int8: bool = False  # PTQ int8 conv stack (models/quantize.py)


class PoseEstimator:
    """Stateful serving wrapper: load once, estimate many."""

    def __init__(
        self,
        spec: DatasetSpec,
        variables: Any,
        config: ServingConfig = ServingConfig(),
        model_config: ModelConfig | None = None,
        model_points: np.ndarray | None = None,
    ):
        self.spec = spec
        self.config = config
        self.variables = variables
        mc = model_config or ModelConfig(num_classes=spec.num_classes)
        self.model = PyraPose(config=mc)
        qtable = None
        if config.int8:
            from pyrapose_tpu.models.quantize import quantize_variables

            qtable = quantize_variables(variables)
        self.infer = build_inference_fn(
            self.model,
            spec.corners3d,
            spec.image_shape,
            RansacConfig(score_threshold=config.score_threshold),
            qtable=qtable,
        )
        if config.icp and model_points is None:
            # Refining against the 8 virtual box corners corrupts poses
            # (they are not surface points; nearest-neighbor matches to the
            # depth cloud are meaningless). Callers must supply sampled mesh
            # clouds (eval.drivers.load_model_points) to enable ICP.
            import warnings

            warnings.warn(
                "ICP requested without model_points (mesh surface samples); "
                "disabling ICP — box corners are not a valid ICP target"
            )
            config = dataclasses.replace(config, icp=False)
            self.config = config
        if model_points is None:
            model_points = spec.corners3d
        self.model_points = np.asarray(model_points, np.float32)
        self._normals = None
        if config.icp:
            self._normals = np.stack(
                [estimate_normals_host(p) for p in self.model_points]
            ).astype(np.float32)
            self._icp = jax.jit(
                lambda rot, trans, mp, mn, sp, sv: icp_point_to_plane(
                    rot, trans, mp, mn, sp, sv,
                    iterations=config.icp_iterations,
                    max_corr_dist=config.icp_max_corr_dist,
                )
            )

    def estimate(
        self,
        image_u8: np.ndarray,
        cam: np.ndarray | None = None,
        depth: np.ndarray | None = None,
    ) -> list[dict]:
        """One RGB frame -> detections.

        Returns a list of dicts {class_id, obj_id, score, rot (3,3),
        trans (3,), quat (wxyz), mask (H, W) bool} for every class passing
        the detection gates, mirroring the reference node's published
        PoseArray + confidence + mask outputs (pyrapose_node.py:319-334).
        """
        if cam is None:
            cam = np.asarray(self.spec.intrinsics, np.float32)
        images = jnp.asarray(image_u8[None])
        cams = jnp.asarray(np.asarray(cam, np.float32)[None])
        poses, aux = self.infer(self.variables, images, cams)

        valid = np.asarray(poses.valid[0])
        rot = np.asarray(poses.rot[0])
        trans = np.asarray(poses.trans[0])
        score = np.asarray(poses.score[0])
        masks = np.asarray(aux["masks"][0])  # (P3, C)

        h, w = self.spec.image_shape
        p3h, p3w = (h + 7) // 8, (w + 7) // 8
        results = []
        for c in range(self.spec.num_classes):
            if not valid[c]:
                continue
            # P3 (60x80) mask -> full-resolution boolean mask
            # (pyrapose_node.py:602-611)
            m_small = masks[:, c].reshape(p3h, p3w) > self.config.mask_threshold
            mask_full = np.kron(m_small, np.ones((8, 8), bool))[:h, :w]
            r, t = rot[c], trans[c]
            if (
                self.config.icp
                and depth is not None
                and mask_full.sum() > self.config.icp_min_mask_area
            ):
                # mask the depth to the detected object before ICP
                # (pyrapose_node.py:667-672 crops the cloud by mask)
                sp, sv = depth_to_points(
                    jnp.asarray(np.where(mask_full, depth, 0.0), jnp.float32),
                    jnp.asarray(cam, jnp.float32),
                    stride=self.config.depth_stride,
                )
                r_j, t_j, _rmse = self._icp(
                    jnp.asarray(r), jnp.asarray(t),
                    jnp.asarray(self.model_points[c]),
                    jnp.asarray(self._normals[c]),
                    sp, sv,
                )
                r, t = np.asarray(r_j), np.asarray(t_j)
            results.append(
                {
                    "class_id": c,
                    "obj_id": (
                        self.spec.class_to_obj_id[c]
                        if self.spec.class_to_obj_id
                        else c
                    ),
                    "score": float(score[c]),
                    "rot": r,
                    "trans": t,
                    "quat": _mat_to_quat_np(r),
                    "mask": mask_full,
                }
            )
        return results


def _mat_to_quat_np(m: np.ndarray) -> np.ndarray:
    from pyrapose_tpu.data.annotate import _mat_to_quat

    return np.asarray(_mat_to_quat(np.asarray(m, np.float64)), np.float32)
