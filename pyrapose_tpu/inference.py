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
from pyrapose_tpu.pose.ransac import (
    MultiPoseResult,
    PoseResult,
    class_multi_poses_select,
)


def build_inference_fn(
    model: PyraPose,
    corners3d: np.ndarray,
    image_shape: tuple[int, int] = (480, 640),
    ransac: RansacConfig = RansacConfig(),
    with_pose: bool = True,
    mesh=None,
    qtable=None,
):
    """Returns jit(fn(variables, images_u8, cam) -> (PoseResult, aux)).

    Args:
        model: a PyraPose module.
        corners3d: (C, 8, 3) object-frame box corners per class.
        image_shape: static input resolution.
        with_pose: if False, stop after dense decode (detection-only path).
        mesh: optional jax.sharding.Mesh — batch-shards inference over the
            mesh's 'data' axis via shard_map (params replicated, every
            per-image stage including the Pallas refine kernel runs locally
            per device; zero collectives — serving-style throughput scaling
            over ICI). Batch must divide the data-axis size.
        qtable: optional int8 table from models.quantize.quantize_variables —
            runs the conv stack on the int8 MXU path (models/quantize.py).
    """
    from pyrapose_tpu.pose.ransac import precompute_class_solvers

    # keep build-time tables as HOST (numpy) arrays: a closed-over jax.Array
    # is committed to the device at build and then fetched back during MLIR
    # lowering to embed as a program constant — on a remote-attached TPU
    # that is a tunnel round-trip per constant (a cold evaluate was observed
    # blocked >20 min in _array_mlir_constant_handler). numpy constants
    # embed directly from host memory; the compiled program is identical.
    corners = np.asarray(corners3d, np.float32)
    anchors = anchors_for_shape(image_shape, model.config.anchors)
    # per-class EPnP constants hoisted to the host (corners are static)
    precomp = precompute_class_solvers(corners3d)

    def infer(variables: Any, images_u8: jnp.ndarray, cam: jnp.ndarray):
        images = preprocess_images(images_u8)
        if qtable is not None:
            from pyrapose_tpu.models.quantize import quantized_apply

            out = quantized_apply(model, variables, qtable, images, train=False)
        else:
            out = model.apply(variables, images, train=False)
        boxes3d = decode_box3d(anchors[None], out["box3d"])
        scores = jax.nn.sigmoid(out["cls_logits"])
        masks = jax.nn.sigmoid(out["mask_logits"])
        aux = {"boxes3d": boxes3d, "scores": scores, "masks": masks}
        if not with_pose:
            return None, aux
        if use_pallas:
            poses = _poses_pallas(boxes3d, scores, cam)
        else:
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

    use_pallas = ransac.pallas_refine
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    use_pallas_epnp = ransac.pallas_epnp
    if use_pallas_epnp is None:
        use_pallas_epnp = use_pallas
    # forcing the kernel on a non-TPU backend runs it in the interpreter
    # (tests); native Mosaic lowering happens on TPU only
    pallas_interpret = jax.devices()[0].platform != "tpu"

    # per-class constants for the fused EPnP kernel (host, build time)
    from pyrapose_tpu.pose.pallas_epnp import (
        epnp_batched_pallas,
        epnp_kernel_constants,
    )

    kc = epnp_kernel_constants(precomp)

    def _poses_pallas(boxes3d, scores, cam):
        """Selection per image (vmapped) with the per-vote EPnP solves
        batched through ONE fused Pallas kernel (pose/pallas_epnp.py), then
        ONE fused Pallas GN kernel over every (image, class, instance) —
        pose/pallas_refine.py."""
        from pyrapose_tpu.pose.pallas_refine import refine_pose_batched_pallas
        from pyrapose_tpu.pose.ransac import class_votes_topk

        hyp = None
        if use_pallas_epnp:
            tk = jax.vmap(partial(class_votes_topk, config=ransac))(
                boxes3d, scores
            )
            bb, cc, kk = tk["votes"].shape[:3]
            tot = bb * cc * kk

            def bcast_const(x):
                x = jnp.asarray(x)
                return jnp.broadcast_to(
                    x[None, :, None], (bb, cc, kk) + x.shape[1:]
                ).reshape(tot, x.shape[-1])

            cams_e = jnp.broadcast_to(
                cam[:, None, None, :], (bb, cc, kk, 4)
            ).reshape(tot, 4)
            rot_h, trans_h = epnp_batched_pallas(
                tk["votes"].reshape(tot, 8, 2),
                bcast_const(kc["alphas"]),
                bcast_const(kc["amat"]),
                bcast_const(kc["dw6"]),
                bcast_const(kc["p3c"]),
                bcast_const(kc["cw"]),
                cams_e,
                interpret=pallas_interpret,
            )
            hyp = (
                rot_h.reshape(bb, cc, kk, 3, 3),
                trans_h.reshape(bb, cc, kk, 3),
            )

        def select_refine(cfg):
            # the per-vote EPnP hypotheses (`hyp`) are gate-independent:
            # the cascade's second pass reuses them, re-running only the
            # tournament + the fused GN kernel
            sel = jax.vmap(
                partial(
                    class_multi_poses_select,
                    corners_3d=corners,
                    config=cfg,
                    precomp=precomp,
                )
            )(boxes3d, scores, cam=cam, hyp=hyp)
            b, c, n = sel["rot0"].shape[:3]
            k = cfg.top_k
            i_total = b * c * n
            pts2d = jnp.broadcast_to(
                sel["votes"].reshape(b, c, 1, k * 8, 2), (b, c, n, k * 8, 2)
            ).reshape(i_total, k * 8, 2)
            pts3d = jnp.broadcast_to(
                jnp.tile(corners, (1, k, 1)).reshape(1, c, 1, k * 8, 3),
                (b, c, n, k * 8, 3),
            ).reshape(i_total, k * 8, 3)
            cams = jnp.broadcast_to(
                cam.reshape(b, 1, 1, 4), (b, c, n, 4)
            ).reshape(i_total, 4)
            rot, trans = refine_pose_batched_pallas(
                sel["rot0"].reshape(i_total, 3, 3),
                sel["trans0"].reshape(i_total, 3),
                pts2d,
                pts3d,
                sel["weights"].reshape(i_total, k * 8),
                cams,
                iterations=cfg.refine_iterations,
                interpret=pallas_interpret,
            )
            return sel, MultiPoseResult(
                rot=rot.reshape(b, c, n, 3, 3),
                trans=trans.reshape(b, c, n, 3),
                valid=sel["valid"],
                num_votes=sel["num_votes"],
                score=sel["score"],
                inlier_frac=sel["inlier_frac"],
            )

        sel, multi = select_refine(ransac)
        if ransac.fallback_inlier_px > 0.0:
            import dataclasses as _dc

            from pyrapose_tpu.pose.ransac import cascade_select

            wide_cfg = _dc.replace(
                ransac,
                inlier_px=ransac.fallback_inlier_px,
                fallback_inlier_px=0.0,
            )
            _, wide = select_refine(wide_cfg)
            multi = jax.vmap(
                lambda bm, wm, v, ts, cm: cascade_select(
                    bm, wm, v, ts, corners, cm, ransac
                )
            )(multi, wide, sel["votes"], sel["top_scores"], cam)
        if ransac.max_instances > 1:
            return multi
        return PoseResult(
            rot=multi.rot[:, :, 0],
            trans=multi.trans[:, :, 0],
            valid=multi.valid[:, :, 0],
            num_votes=multi.num_votes,
            score=multi.score[:, :, 0],
            inlier_frac=multi.inlier_frac[:, :, 0],
        )

    if mesh is None:
        return jax.jit(infer)

    from jax.sharding import PartitionSpec as P

    from pyrapose_tpu.parallel.mesh import DATA_AXIS

    data = P(DATA_AXIS)
    # out_specs as pytree prefixes: every output carries a leading batch
    # axis (the detection-only path's leading None is an empty subtree).
    mapped = jax.shard_map(
        infer,
        mesh=mesh,
        in_specs=(P(), data, data),
        out_specs=(data, data),
        check_vma=False,
    )
    return jax.jit(mapped)


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
