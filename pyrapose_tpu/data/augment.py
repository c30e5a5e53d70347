"""Host-side training augmentation: affine + photometric, numpy/cv2.

Distribution-matched replacement for the reference's imgaug pipeline + affine
warp (utils/image.py:150-213) and transform builders (utils/transform.py):

- random affine: translation +-0.2 (relative), scale 0.8-1.2, applied about
  the image center (bin/train.py:172-177, transform.py:172-223);
- photometric soup: blur / brightness / multiply / hue-sat / gamma-contrast /
  grayscale-mix, each applied with probability ~0.5 in random order — imgaug's
  exact stochastic graph cannot be bit-matched (SURVEY.md section 7.3), so
  parity is judged on the final ADD metric, not pixels;
- pose translation compensation for the affine (utils/image.py:230-248):
  z' = z/s, x' = x + ((tx + cx(s-1)) z')/fx, y' = y + ((ty + cy(s-1)) z')/fy.
  Rotation augmentation is disabled upstream for exactly this reason (the
  reference has no rotation compensation, image.py:238-240).

cv2 is optional: without it the affine falls back to scipy.ndimage.
"""

from __future__ import annotations

import dataclasses

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    from scipy import ndimage

    _HAS_CV2 = False


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    min_translation: tuple[float, float] = (-0.2, -0.2)
    max_translation: tuple[float, float] = (0.2, 0.2)
    min_scaling: float = 0.8
    max_scaling: float = 1.2
    photometric: bool = True


def random_affine(
    rng: np.random.Generator, image_shape: tuple[int, int], config: AugmentConfig
) -> np.ndarray:
    """3x3 homogeneous pixel transform: scale + translate about image center.

    Scaling is isotropic (matrix[0,0] is used as THE scale by the reference
    pose compensation, image.py:234 — anisotropic scale would break it).
    """
    h, w = image_shape
    s = rng.uniform(config.min_scaling, config.max_scaling)
    tx = rng.uniform(config.min_translation[0], config.max_translation[0]) * w
    ty = rng.uniform(config.min_translation[1], config.max_translation[1]) * h
    # translate(center) @ scale @ translate(-center) then shift by (tx, ty)
    cx, cy = 0.5 * w, 0.5 * h
    m = np.array(
        [
            [s, 0.0, cx - s * cx + tx],
            [0.0, s, cy - s * cy + ty],
            [0.0, 0.0, 1.0],
        ],
        np.float64,
    )
    return m


def warp_image(image: np.ndarray, matrix: np.ndarray, nearest: bool = False) -> np.ndarray:
    """Apply the affine to an image (linear) or id-mask (nearest)."""
    h, w = image.shape[:2]
    if _HAS_CV2:
        return cv2.warpAffine(
            image,
            matrix[:2, :],
            dsize=(w, h),
            flags=cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT,
            borderValue=0,
        )
    inv = np.linalg.inv(matrix)
    order = 0 if nearest else 1
    coords_y, coords_x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    src = inv @ np.stack([coords_x.ravel(), coords_y.ravel(), np.ones(h * w)])
    out_shape = image.shape
    if image.ndim == 2:
        return ndimage.map_coordinates(
            image, [src[1].reshape(h, w), src[0].reshape(h, w)], order=order, cval=0
        ).astype(image.dtype)
    chans = [
        ndimage.map_coordinates(
            image[..., c], [src[1].reshape(h, w), src[0].reshape(h, w)], order=order, cval=0
        )
        for c in range(out_shape[2])
    ]
    return np.stack(chans, axis=-1).astype(image.dtype)


def transform_aabb(matrix: np.ndarray, aabb: np.ndarray) -> np.ndarray:
    """Transform an AABB, returning the AABB of its transformed corners
    (reference transform.py:27-54)."""
    x1, y1, x2, y2 = aabb
    pts = matrix @ np.array([[x1, x2, x1, x2], [y1, y2, y2, y1], [1, 1, 1, 1]])
    return np.array(
        [pts[0].min(), pts[1].min(), pts[0].max(), pts[1].max()], np.float32
    )


def compensate_pose(
    matrix: np.ndarray, trans: np.ndarray, cam: np.ndarray
) -> np.ndarray:
    """Adjust object translation for the image affine (image.py:230-248).

    The reference's approximation — kept as documentation of its behavior
    and for parity tests. The training paths use `transform_cam` instead:
    translation-only compensation cannot express the viewpoint change of a
    lateral shift (the reference's own comment notes the missing rotation
    term, image.py:238-240) and mis-places corner targets by several px.
    """
    fx, fy, cx, cy = cam
    s = matrix[0, 0]
    x, y, z = trans
    z2 = z / s
    x2 = x + ((matrix[0, 2] + (cx * s - cx)) * z2) / fx
    y2 = y + ((matrix[1, 2] + (cy * s - cy)) * z2) / fy
    return np.array([x2, y2, z2], trans.dtype)


def transform_cam(matrix: np.ndarray, cam: np.ndarray) -> np.ndarray:
    """Fold the affine into the intrinsics: dst = s*src + b of a pinhole
    image is exactly the image rendered with fx' = s*fx, cx' = s*cx + bx
    (same for y) and an unchanged pose, so corner targets projected with
    the new intrinsics land exactly on the warped pixels (see
    device_affine.transform_gt for the derivation and measurements)."""
    fx, fy, cx, cy = cam
    s = matrix[0, 0]
    return np.array(
        [fx * s, fy * s, cx * s + matrix[0, 2], cy * s + matrix[1, 2]],
        np.asarray(cam).dtype,
    )


def photometric_augment(rng: np.random.Generator, image: np.ndarray) -> np.ndarray:
    """Random photometric jitter on a uint8 RGB image.

    Ops and ranges follow the reference pipeline (image.py:154-190); each op
    fires independently, order randomized.
    """
    img = image.astype(np.float32)
    ops = []

    def blur(x):
        k = int(rng.integers(1, 3)) * 2 + 1
        if _HAS_CV2:
            return cv2.GaussianBlur(x, (k, k), 0)
        from scipy import ndimage as ndi

        return ndi.gaussian_filter(x, sigma=(k / 4.0, k / 4.0, 0))

    def add(x):
        per_channel = rng.random() < 0.5
        shape = (1, 1, 3) if per_channel else (1, 1, 1)
        return x + rng.uniform(-10, 10, shape).astype(np.float32)

    def multiply(x):
        per_channel = rng.random() < 0.5
        shape = (1, 1, 3) if per_channel else (1, 1, 1)
        return x * rng.uniform(0.75, 1.25, shape).astype(np.float32)

    def gamma(x):
        g = rng.uniform(0.75, 1.25)
        # clamp first: earlier add/contrast ops can push pixels negative and
        # a fractional power of a negative is NaN (poisons the final cast)
        return ((np.clip(x, 0.0, None) / 255.0) ** g) * 255.0

    def linear_contrast(x):
        a = rng.uniform(0.7, 1.3)
        return (x - 127.5) * a + 127.5

    def grayscale_mix(x):
        alpha = rng.uniform(0.0, 0.2)
        gray = x.mean(axis=-1, keepdims=True)
        return (1 - alpha) * x + alpha * gray

    def hue_sat(x):
        # approximate AddToHueAndSaturation(-15, 15) with channel-wise shifts
        shift = rng.uniform(-15, 15)
        mean = x.mean(axis=-1, keepdims=True)
        return mean + (x - mean) * (1.0 + shift / 100.0)

    for op in (blur, add, multiply, gamma, linear_contrast, grayscale_mix, hue_sat):
        if rng.random() < 0.5:
            ops.append(op)
    rng.shuffle(ops)
    for op in ops:
        img = op(img)
    return np.clip(img, 0, 255).astype(np.uint8)


def augment_sample(
    rng: np.random.Generator,
    image: np.ndarray,
    boxes: np.ndarray,
    trans: np.ndarray,
    cam: np.ndarray,
    mask: np.ndarray | None,
    config: AugmentConfig = AugmentConfig(),
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray | None, np.ndarray, np.ndarray]:
    """Full training augmentation of one sample.

    Returns (image, boxes, trans, mask, keep, cam): `keep` marks annotations
    whose transformed bbox stays fully inside the image (reference
    filter_annotations, generator.py:163-221); `cam` is the affine folded
    into the intrinsics (transform_cam) — poses are returned UNCHANGED so
    corner targets projected with the new cam are exact on the warped image.
    """
    h, w = image.shape[:2]
    m = random_affine(rng, (h, w), config)
    if config.photometric:
        image = photometric_augment(rng, image)
    image = warp_image(image, m)
    if mask is not None:
        mask = warp_image(mask, m, nearest=True)
    new_boxes = np.stack([transform_aabb(m, b) for b in boxes]) if len(boxes) else boxes
    new_trans = trans
    new_cam = transform_cam(m, cam)
    if len(new_boxes):
        keep = (
            (new_boxes[:, 2] > new_boxes[:, 0])
            & (new_boxes[:, 3] > new_boxes[:, 1])
            & (new_boxes[:, 0] >= 0)
            & (new_boxes[:, 1] >= 0)
            & (new_boxes[:, 2] <= w)
            & (new_boxes[:, 3] <= h)
        )
    else:
        keep = np.zeros((0,), bool)
    return image, new_boxes, new_trans, mask, keep, new_cam
