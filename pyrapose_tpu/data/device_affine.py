"""Geometric (affine) augmentation ON DEVICE, fused into the train step.

The host affine path (data/augment.py, matching reference utils/image.py:
150-213 + utils/transform.py:172-223) warps each frame with cv2 on a worker
thread. With --device-cache the host never touches pixels after staging, so
that path is unavailable — and training WITHOUT geometric augmentation
overfits the pose head badly (each of a few thousand cached frames keeps one
fixed geometry; per-coordinate regression error was measured at 0.22 on
train vs 2.73 on val after 200 epochs). This module runs the same
scale+translate augmentation inside the jitted cached step.

TPU mapping: the reference affine has NO rotation (rotation is disabled
upstream because pose compensation only exists for scale+translation,
image.py:238-240), so the warp is axis-separable and is expressed with
`jax.image.scale_and_translate` — two small dense matmuls (H_out x H_in) @
img @ (W_in x W_out) on the MXU, ~0.5 GFLOP per 480x640 frame, noise next
to the conv stack. No gathers, no scatters.

Ground-truth transforms mirror data/augment.py exactly:
- boxes: x' = s*x + bx (axis-aligned, s > 0, so the AABB map is exact);
- object translation: z' = z/s, x' = x + ((bx + cx(s-1)) z')/fx, likewise y
  (reference image.py:230-248; cx/cy here are CAMERA intrinsics while the
  warp is centered on the IMAGE center — the reference distinguishes them
  the same way);
- annotations whose warped box leaves the canvas are dropped by clearing
  `valid` (reference filter_annotations, generator.py:163-221); target
  generation already neutralizes mask pixels of invalid slots
  (geometry/targets.py:125), so no slot remap is needed;
- the P3 instance-slot raster is warped nearest-neighbour with -1 fill by
  the SAME affine scaled to P3 stride (the host warps the full-res mask and
  then downsamples; warping the P3 map directly commutes because the affine
  is a pure scale+translate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pyrapose_tpu.data.augment import AugmentConfig
from pyrapose_tpu.data.pipeline import GroundTruth


def sample_affine(
    key: jax.Array, image_shape: tuple[int, int], config: AugmentConfig
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample (s, bx, by): dst = s * src + (bx, by), centered like the host.

    Matches data/augment.py random_affine: isotropic scale in
    [min_scaling, max_scaling], translation uniform in +-max_translation
    (relative to width/height), applied about the image center.
    """
    h, w = image_shape
    ks, kx, ky = jax.random.split(key, 3)
    s = jax.random.uniform(
        ks, (), minval=config.min_scaling, maxval=config.max_scaling
    )
    tx = jax.random.uniform(
        kx, (), minval=config.min_translation[0], maxval=config.max_translation[0]
    ) * w
    ty = jax.random.uniform(
        ky, (), minval=config.min_translation[1], maxval=config.max_translation[1]
    ) * h
    cx, cy = 0.5 * w, 0.5 * h
    return s, cx - s * cx + tx, cy - s * cy + ty


def warp_image(img: jnp.ndarray, s, bx, by) -> jnp.ndarray:
    """Bilinear warp of one (H, W, C) float image by dst = s*src + b.

    cv2.warpAffine samples integer pixel centers: src = (dst - b)/s.
    jax.image.scale_and_translate uses the half-pixel convention
    u(o) = (o + 0.5 - t)/s - 0.5, so t = b + 0.5*(1 - s) reproduces the
    cv2 grid. Out-of-range taps contribute zero (BORDER_CONSTANT 0).
    """
    h, w = img.shape[:2]
    t = jnp.stack([by + 0.5 * (1.0 - s), bx + 0.5 * (1.0 - s)])
    return jax.image.scale_and_translate(
        img,
        shape=img.shape,
        spatial_dims=(0, 1),
        scale=jnp.stack([s, s]),
        translation=t,
        method="linear",
        antialias=False,
    )


def warp_slots(
    slots_flat: jnp.ndarray, p3_shape: tuple[int, int], s, bx, by
) -> jnp.ndarray:
    """Nearest-neighbour warp of the flat (H3*W3,) slot raster, -1 fill.

    P3 stride is 8: dst_p3 = (s*src_full + b)/8 = s*src_p3 + b/8. The warp
    is separable, so it is two 1-D clamped takes (row gather, col gather)
    plus bound masks — no 2-D gather.
    """
    h3, w3 = p3_shape
    grid = slots_flat.reshape(h3, w3)
    src_y = jnp.round((jnp.arange(h3) - by / 8.0) / s).astype(jnp.int32)
    src_x = jnp.round((jnp.arange(w3) - bx / 8.0) / s).astype(jnp.int32)
    ok_y = (src_y >= 0) & (src_y < h3)
    ok_x = (src_x >= 0) & (src_x < w3)
    out = jnp.take(grid, jnp.clip(src_y, 0, h3 - 1), axis=0)
    out = jnp.take(out, jnp.clip(src_x, 0, w3 - 1), axis=1)
    out = jnp.where(ok_y[:, None] & ok_x[None, :], out, -1)
    return out.reshape(-1)


def transform_gt(
    gt: GroundTruth, image_shape: tuple[int, int], p3_shape: tuple[int, int],
    s, bx, by,
) -> GroundTruth:
    """Apply the sampled affine to one image's GroundTruth.

    The warp is folded into the INTRINSICS, not the pose: an affine
    dst = s*src + b of a pinhole image is exactly the image rendered with
    fx' = s*fx, cx' = s*cx + bx (same for y) and an UNCHANGED pose —
    u' = fx'*X/Z + cx' = s*(fx*X/Z + cx) + bx = s*u + bx for every point.
    Downstream target generation projects corners with gt.cam (which is
    per-image anyway), so the 16-coordinate targets land exactly on the
    warped pixels.

    The reference instead compensates the object TRANSLATION for the warp
    (image.py:230-248) and recomputes targets from that pose; translation
    cannot express the viewpoint change (its own comment notes the missing
    rotation compensation, image.py:238-240), which mis-places corner
    targets by up to ~18 px at the aug extremes (measured median 7.6 px on
    rendered LineMOD — the r2 flagship's ~30 px corner-error floor). The
    exact 2D corner transform the reference left commented out
    (generator.py:257 transform_box3d) is equivalent to this intrinsics
    fold, so this is the same quantity computed exactly, TPU-side.
    """
    h, w = image_shape
    fx, fy, cx, cy = gt.cam[0], gt.cam[1], gt.cam[2], gt.cam[3]

    x1 = s * gt.boxes[:, 0] + bx
    y1 = s * gt.boxes[:, 1] + by
    x2 = s * gt.boxes[:, 2] + bx
    y2 = s * gt.boxes[:, 3] + by
    boxes = jnp.stack([x1, y1, x2, y2], axis=1)

    cam = jnp.stack([fx * s, fy * s, cx * s + bx, cy * s + by])

    keep = (
        (x2 > x1) & (y2 > y1)
        & (x1 >= 0.0) & (y1 >= 0.0) & (x2 <= w) & (y2 <= h)
    )
    valid = gt.valid & keep
    slots = warp_slots(gt.mask_slots, p3_shape, s, bx, by)
    return gt._replace(boxes=boxes, cam=cam, valid=valid, mask_slots=slots)


def affine_batch(
    key: jax.Array,
    images_f32: jnp.ndarray,
    gt: GroundTruth,
    config: AugmentConfig = AugmentConfig(),
) -> tuple[jnp.ndarray, GroundTruth]:
    """Per-sample random affine over a (B, H, W, 3) float batch + its GT."""
    b, h, w = images_f32.shape[:3]
    p3 = (h // 8, w // 8)
    keys = jax.random.split(key, b)

    def one(k, img, g):
        s, bx, by = sample_affine(k, (h, w), config)
        return warp_image(img, s, bx, by), transform_gt(g, (h, w), p3, s, bx, by)

    return jax.vmap(one)(keys, images_f32, gt)
