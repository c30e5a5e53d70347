"""End-to-end on-device inference: image -> per-class 6D poses.

This is the pipeline the reference spreads across GPU prediction plus a
host-side per-class OpenCV loop (utils/linemod_eval.py:264-534); here
preprocessing, the network, corner decoding, and RANSAC-PnP are one jitted
XLA program — images in, poses out, nothing leaves the device in between.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pyrapose_tpu.data.pipeline import preprocess_images
from pyrapose_tpu.geometry import anchors_for_shape, decode_box3d
from pyrapose_tpu.models import ModelConfig, PyraPose
from pyrapose_tpu.pose import (
    RansacConfig,
    class_multi_poses_from_dense,
    class_poses_from_dense,
)
from pyrapose_tpu.pose.ransac import PoseResult


def build_inference_fn(
    model: PyraPose,
    corners3d: np.ndarray,
    image_shape: tuple[int, int] = (480, 640),
    ransac: RansacConfig = RansacConfig(),
    with_pose: bool = True,
):
    """Returns jit(fn(variables, images_u8, cam) -> (PoseResult, aux)).

    Args:
        model: a PyraPose module.
        corners3d: (C, 8, 3) object-frame box corners per class.
        image_shape: static input resolution.
        with_pose: if False, stop after dense decode (detection-only path).
    """
    from pyrapose_tpu.pose.ransac import precompute_class_solvers

    corners = jnp.asarray(corners3d)
    anchors = jnp.asarray(anchors_for_shape(image_shape, model.config.anchors))
    # per-class EPnP constants hoisted to the host (corners are static)
    precomp = precompute_class_solvers(corners3d)

    @jax.jit
    def infer(variables: Any, images_u8: jnp.ndarray, cam: jnp.ndarray):
        images = preprocess_images(images_u8)
        out = model.apply(variables, images, train=False)
        boxes3d = decode_box3d(anchors[None], out["box3d"])
        scores = jax.nn.sigmoid(out["cls_logits"])
        masks = jax.nn.sigmoid(out["mask_logits"])
        aux = {"boxes3d": boxes3d, "scores": scores, "masks": masks}
        if not with_pose:
            return None, aux
        # max_instances > 1 recovers several poses per class (multi-copy
        # scenes); the result gains an instance axis (MultiPoseResult).
        recover = (
            class_multi_poses_from_dense
            if ransac.max_instances > 1
            else class_poses_from_dense
        )
        poses = jax.vmap(
            partial(
                recover,
                corners_3d=corners,
                config=ransac,
                precomp=precomp,
            )
        )(boxes3d, scores, cam=cam)
        return poses, aux

    return infer


def poses_to_host(result: PoseResult) -> list[dict]:
    """Convert a batched PoseResult to a list of per-image dicts (host)."""
    rot = np.asarray(result.rot)
    trans = np.asarray(result.trans)
    valid = np.asarray(result.valid)
    score = np.asarray(result.score)
    out = []
    for b in range(rot.shape[0]):
        out.append(
            {
                "rot": rot[b],
                "trans": trans[b],
                "valid": valid[b],
                "score": score[b],
            }
        )
    return out
