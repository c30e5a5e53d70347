"""COCO detection-only evaluate CLI (reference bin/evaluate.py coco branch).

Drives `pyrapose evaluate coco` end-to-end on a tiny fixture tree with the
small backbone: letterboxed variable-size frames, dense decode, fixed-shape
NMS, VOC + COCO mAP report.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from pyrapose_tpu.cli.main import build_parser, main


def _make_coco_tree(root, n_images=4):
    os.makedirs(os.path.join(root, "annotations"))
    img_dir = os.path.join(root, "images", "val2017")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 0
    for i in range(n_images):
        h, w = (96, 128) if i % 2 == 0 else (64, 64)  # variable sizes
        fname = f"{i:06d}.png"
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(os.path.join(img_dir, fname))
        images.append(dict(id=i, file_name=fname, width=w, height=h))
        annotations.append(
            dict(id=ann_id, image_id=i, category_id=3,
                 bbox=[10.0, 10.0, 30.0, 20.0])
        )
        ann_id += 1
    data = dict(
        images=images,
        annotations=annotations,
        categories=[dict(id=3, name="car"), dict(id=18, name="dog")],
    )
    with open(os.path.join(root, "annotations", "instances_val2017.json"), "w") as f:
        json.dump(data, f)


def test_evaluate_coco_cli(tmp_path, capsys):
    _make_coco_tree(str(tmp_path))
    rc = main([
        "evaluate", "coco", str(tmp_path),
        "--backbone", "resnet10", "--batch-size", "2",
        "--image-min-side", "64", "--image-max-side", "64",
        "--score-threshold", "0.05",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "coco evaluation" in out
    assert "AP@[.5:.95]" in out
    assert "mAP@0.5" in out


def test_coco_choice_in_parser():
    p = build_parser()
    args = p.parse_args(["evaluate", "coco", "/tmp/x"])
    assert args.dataset == "coco"
    with pytest.raises(SystemExit):
        p.parse_args(["train", "coco", "/tmp/x"])  # detection-only: no train


def test_ransac_top_k_flag():
    """--ransac-top-k reaches RansacConfig (vote-pool size, cli/evaluate.py)."""
    p = build_parser()
    args = p.parse_args(["evaluate", "linemod", "/tmp/x", "--ransac-top-k", "64"])
    assert args.ransac_top_k == 64
    assert p.parse_args(["evaluate", "linemod", "/tmp/x"]).ransac_top_k == 32
