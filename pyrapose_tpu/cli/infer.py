"""Infer command: image directory -> poses JSON (BOP-style records)."""

from __future__ import annotations

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pyrapose_tpu.data.spec import dataset_spec
from pyrapose_tpu.inference import build_inference_fn
from pyrapose_tpu.models import ModelConfig, PyraPose
from pyrapose_tpu.pose import RansacConfig
from pyrapose_tpu.train.checkpoint import restore_variables


def run_infer(args) -> int:
    spec = dataset_spec(args.dataset, args.data_path)
    image_shape = (
        getattr(args, "image_min_side", 480), getattr(args, "image_max_side", 640)
    )
    if spec.image_shape != image_shape:
        import dataclasses

        spec = dataclasses.replace(spec, image_shape=image_shape)
    config = ModelConfig(
        num_classes=spec.num_classes,
        backbone=getattr(args, "backbone", "resnet50"),
    )
    model = PyraPose(config=config)
    params, batch_stats = restore_variables(
        args.snapshot, config=config, image_shape=spec.image_shape
    )
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    ransac = RansacConfig(score_threshold=args.score_threshold)
    # multi-chip: batch-shard over the data mesh when possible (the same
    # shard_map DP path the evaluate CLI uses)
    mesh = None
    if jax.device_count() > 1 and args.batch_size % jax.device_count() == 0:
        from pyrapose_tpu.parallel import create_mesh

        mesh = create_mesh()
        print(f"devices: {jax.device_count()} (batch-sharded inference)")
    qtable = None
    if getattr(args, "int8", False):
        from pyrapose_tpu.models.quantize import quantize_variables

        qtable = quantize_variables(variables)
        print(f"int8: quantized {len(qtable)} convs")
    infer = build_inference_fn(
        model, spec.corners3d, spec.image_shape, ransac, mesh=mesh,
        qtable=qtable,
    )

    paths = sorted(
        glob.glob(os.path.join(args.image_dir, "*.png"))
        + glob.glob(os.path.join(args.image_dir, "*.jpg"))
    )
    if not paths:
        print(f"no images found in {args.image_dir}")
        return 1

    from pyrapose_tpu.data.image import resize_letterbox

    h, w = spec.image_shape
    cam_single = np.asarray(spec.intrinsics, np.float32)
    results = []
    bs = args.batch_size
    for i in range(0, len(paths), bs):
        chunk = paths[i : i + bs]
        images = []
        cams = []
        for p in chunk:
            img = np.asarray(Image.open(p).convert("RGB"), np.uint8)
            # aspect-preserving min/max-side resize + letterbox, intrinsics
            # scaled along (reference utils/image.py:281-323 scale rule)
            img, cam_adj, _scale = resize_letterbox(img, (h, w), cam_single)
            images.append(img)
            cams.append(cam_adj if cam_adj is not None else cam_single)
        # pad the final chunk to full batch for a single compiled shape
        pad = bs - len(images)
        batch_imgs = np.stack(images + [images[-1]] * pad)
        cam = jnp.asarray(np.stack(cams + [cams[-1]] * pad))
        poses, _ = infer(variables, jnp.asarray(batch_imgs), cam)
        rot = np.asarray(poses.rot)
        trans = np.asarray(poses.trans)
        valid = np.asarray(poses.valid)
        score = np.asarray(poses.score)
        save_dir = getattr(args, "save_images", None)
        if save_dir:
            from pyrapose_tpu.utils.visualization import render_pose_overlay

            os.makedirs(save_dir, exist_ok=True)
            for b, path in enumerate(chunk):
                overlay = render_pose_overlay(
                    batch_imgs[b], spec, rot[b], trans[b], valid[b],
                    score[b], np.asarray(cams[b]),
                )
                Image.fromarray(overlay).save(
                    os.path.join(save_dir, os.path.basename(path))
                )
        for b, path in enumerate(chunk):
            for c in range(spec.num_classes):
                if not valid[b, c]:
                    continue
                results.append(
                    {
                        "image": os.path.basename(path),
                        "obj_id": int(spec.class_to_obj_id[c]),
                        "score": float(score[b, c]),
                        "R": rot[b, c].reshape(-1).tolist(),
                        "t": trans[b, c].tolist(),
                    }
                )
    if args.output.endswith(".csv"):
        # BOP-challenge result format: scene_id,im_id,obj_id,score,R,t,time
        # (R row-major space-separated, t in mm)
        with open(args.output, "w") as f:
            f.write("scene_id,im_id,obj_id,score,R,t,time\n")
            for r in results:
                stem = os.path.splitext(r["image"])[0].split("_")[0]
                im_id = int(stem) if stem.isdigit() else 0
                rr = " ".join(f"{v:.6f}" for v in r["R"])
                tt = " ".join(f"{v * 1000.0:.6f}" for v in r["t"])
                f.write(f"0,{im_id},{r['obj_id']},{r['score']:.6f},{rr},{tt},-1\n")
    else:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {len(results)} poses for {len(paths)} images to {args.output}")
    return 0
