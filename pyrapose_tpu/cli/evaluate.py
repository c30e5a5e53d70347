"""Evaluate command: ADD(-S) protocol over a dataset split."""

from __future__ import annotations

import dataclasses

import jax

from pyrapose_tpu.data.spec import dataset_spec
from pyrapose_tpu.eval.drivers import evaluate_by_name, load_model_points
from pyrapose_tpu.inference import build_inference_fn
from pyrapose_tpu.models import ModelConfig, PyraPose
from pyrapose_tpu.pose import RansacConfig
from pyrapose_tpu.train.checkpoint import restore_params, restore_variables


def run_evaluate(args) -> int:
    if args.dataset == "coco":
        return run_evaluate_coco(args)
    spec = dataset_spec(
        args.dataset if args.dataset != "synthetic" else "linemod", args.data_path
    )
    image_shape = (
        getattr(args, "image_min_side", 480), getattr(args, "image_max_side", 640)
    )
    if spec.image_shape != image_shape:
        spec = dataclasses.replace(spec, image_shape=image_shape)
    model_kwargs = dict(num_classes=spec.num_classes, backbone=args.backbone)
    if getattr(args, "config", None):
        from pyrapose_tpu.utils.config import anchor_config_from_file

        model_kwargs["anchors"] = anchor_config_from_file(args.config)
    config = ModelConfig(**model_kwargs)
    model = PyraPose(config=config)

    if args.snapshot:
        # orbax directory or keras .h5 (the reference's inline
        # --convert-model, bin/evaluate.py:214-215)
        params, batch_stats = restore_variables(
            args.snapshot, config=config, image_shape=spec.image_shape
        )
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
    else:
        import jax.numpy as jnp

        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, *spec.image_shape, 3), jnp.float32),
        )
        print("WARNING: no snapshot given, evaluating random weights")

    ransac = RansacConfig(
        score_threshold=args.score_threshold,
        top_k=getattr(args, "ransac_top_k", 32),
        max_instances=max(getattr(args, "max_instances", 1), 1),
        approx_top_k=not getattr(args, "exact_topk", False),
        inlier_px=getattr(args, "ransac_inlier_px", 5.0),
        fallback_inlier_px=getattr(args, "ransac_fallback_px", 0.0),
    )
    # multi-chip: batch-shard inference over the data mesh when the batch
    # divides the device count (serving-style DP over ICI, zero collectives)
    mesh = None
    if jax.device_count() > 1 and args.batch_size % jax.device_count() == 0:
        from pyrapose_tpu.parallel import create_mesh

        mesh = create_mesh()
        print(f"devices: {jax.device_count()} (batch-sharded inference)")
    qtable = None
    if getattr(args, "int8", False):
        from pyrapose_tpu.models.quantize import quantize_variables

        qtable = quantize_variables(variables)
        print(f"int8: quantized {len(qtable)} convs (PTQ, models/quantize.py)")
    infer = build_inference_fn(
        model, spec.corners3d, spec.image_shape, ransac, mesh=mesh,
        qtable=qtable,
    )

    use_icp = bool(getattr(args, "icp", False))
    want_depth = not getattr(args, "no_depth", False)

    if args.dataset == "synthetic":
        from pyrapose_tpu.data.synthetic import SyntheticPoseDataset

        ds = SyntheticPoseDataset(spec, num_images=64, seed=1)
        with_depth = use_icp and want_depth

        def batches():
            # full batches only (matches epoch_batches; keeps shapes static
            # for the jitted — possibly mesh-sharded — inference fn)
            for i in range(0, 64 - 64 % args.batch_size, args.batch_size):
                yield ds.batch(
                    list(range(i, i + args.batch_size)),
                    with_depth=with_depth,
                )

    else:
        from pyrapose_tpu.data.datasets import create_dataset

        ds = create_dataset(args.dataset, args.data_path, args.set_name, spec=spec)
        # depth drives VSD (tless) and --icp refinement; load it whenever the
        # split ships _dep images (reference tless_eval.py:659-662)
        with_depth = want_depth and ds.has_depth()
        if use_icp and not with_depth:
            print("WARNING: --icp requested but the split has no depth images; "
                  "skipping ICP")
            use_icp = False

        def batches():
            limit = getattr(args, "eval_samples", None)
            n_batches = None if not limit else max(limit // args.batch_size, 1)
            for j, batch in enumerate(ds.epoch_batches(
                args.batch_size, shuffle=False, with_depth=with_depth
            )):
                if n_batches is not None and j >= n_batches:
                    break
                yield batch

    model_points = (
        load_model_points(args.data_path, spec) if args.data_path else None
    )
    report = evaluate_by_name(
        args.dataset, spec, infer, variables, batches(),
        model_points=model_points, verbose=True, icp=use_icp,
    )
    report_json = getattr(args, "report_json", None)
    if report_json:
        # machine-readable twin of the printed report (CI gates, sweep
        # tooling); numpy scalars/arrays coerced to plain JSON types
        import json

        def _py(v):
            if isinstance(v, dict):
                return {k: _py(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [_py(x) for x in v]
            if hasattr(v, "tolist"):
                return v.tolist()
            if isinstance(v, (str, int, float, bool)) or v is None:
                return v
            return None  # live objects (e.g. the accumulator) don't serialize

        with open(report_json, "w") as f:
            json.dump(_py(report), f, indent=1)
        print(f"report written to {report_json}")
    return 0


def run_evaluate_coco(args) -> int:
    """Detection-only COCO mAP path (reference bin/evaluate.py coco branch
    -> utils/coco_eval.py bbox AP)."""
    import functools

    import jax.numpy as jnp
    import numpy as np

    from pyrapose_tpu.data.datasets import CocoDetectionDataset
    from pyrapose_tpu.eval.detection import DetectionConfig, filter_detections
    from pyrapose_tpu.eval.map import coco_map, evaluate_detections

    set_name = args.set_name if args.set_name != "val" else "val2017"
    ds = CocoDetectionDataset(args.data_path, set_name=set_name)
    image_shape = (
        getattr(args, "image_min_side", 480), getattr(args, "image_max_side", 640)
    )
    config = ModelConfig(num_classes=ds.num_classes, backbone=args.backbone)
    model = PyraPose(config=config)

    if args.snapshot:
        params, batch_stats = restore_params(args.snapshot)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
    else:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, *image_shape, 3), jnp.float32)
        )
        print("WARNING: no snapshot given, evaluating random weights")

    # detection-only inference: dense decode, no pose recovery
    corners_dummy = np.zeros((ds.num_classes, 8, 3), np.float32)
    infer = build_inference_fn(
        model, corners_dummy, image_shape, with_pose=False
    )
    det_cfg = DetectionConfig(score_threshold=args.score_threshold)
    filt = jax.jit(
        jax.vmap(
            functools.partial(
                filter_detections, image_shape=image_shape, config=det_cfg
            )
        )
    )

    detections, annotations = [], []
    n = len(ds) - len(ds) % args.batch_size
    for i in range(0, n, args.batch_size):
        images, gt = ds.batch(
            list(range(i, i + args.batch_size)), image_shape
        )
        cam = jnp.ones((len(images), 4), jnp.float32)
        _, aux = infer(variables, jnp.asarray(images), cam)
        det = filt(aux["boxes3d"], aux["scores"])
        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        for b in range(len(images)):
            keep = labels[b] >= 0
            detections.append(
                dict(boxes=boxes[b][keep], scores=scores[b][keep],
                     labels=labels[b][keep].astype(np.int64))
            )
            v = gt["valid"][b]
            annotations.append(
                dict(boxes=gt["boxes"][b][v],
                     labels=gt["labels"][b][v].astype(np.int64))
            )

    voc = evaluate_detections(detections, annotations, ds.num_classes)
    coco = coco_map(detections, annotations, ds.num_classes)
    print(f"coco evaluation ({set_name}, {len(detections)} images):")
    print(f"  mAP@0.5 (VOC): {voc['mAP']:.4f}")
    print(
        f"  AP@[.5:.95]: {coco['AP']:.4f}  AP50: {coco['AP50']:.4f}"
        f"  AP75: {coco['AP75']:.4f}"
    )
    return 0
