#!/usr/bin/env python3
"""GT-vs-pixels consistency: for each annotation, compare the projected
3D-model CENTER (annotated pose + per-image K) against the centroid of its
instance-mask pixels. A systematic per-split offset = annotation bug;
small scatter = GT consistent with the rendering. (The mask centroid is
not exactly the projected origin — shape/occlusion offsets it — so judge
the SPLIT DIFFERENCE, not the absolute value.)

Usage: python tools/gt_pixel_check.py DATA [--split valmid] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("--split", default="valmid")
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()

    import cv2

    ann_path = os.path.join(args.data_root, "annotations",
                            f"instances_{args.split}.json")
    idx = json.load(open(ann_path))
    imgs = {im["id"]: im for im in idx["images"]}
    by_img: dict[int, list] = {}
    for a in idx["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a)

    offs = []
    for img_id in sorted(by_img)[: args.n]:
        im = imgs[img_id]
        stem = os.path.splitext(im["file_name"])[0]
        mask_path = os.path.join(args.data_root, "images", args.split,
                                 stem + "_mask.png")
        mask = cv2.imread(mask_path, cv2.IMREAD_UNCHANGED)
        if mask is None:
            print("no mask at", mask_path)
            continue
        for a in by_img[img_id]:
            t = np.asarray(a["pose"][:3], np.float64) * 1000.0  # m -> mm
            u = im["fx"] * t[0] / t[2] + im["cx"]
            v = im["fy"] * t[1] / t[2] + im["cy"]
            m = mask == a["mask_id"]
            if not m.any():
                continue
            ys, xs = np.nonzero(m)
            offs.append((u - xs.mean(), v - ys.mean()))
    if not offs:
        print("no (annotation, mask) pairs matched")
        return 1
    o = np.asarray(offs)
    print(f"{args.split}: {len(o)} annotations")
    print("mean offset (u-mask_cx, v-mask_cy):", np.round(o.mean(0), 2))
    print("offset std:", np.round(o.std(0), 2))
    print("median |offset|:",
          round(float(np.median(np.linalg.norm(o, axis=1))), 2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
