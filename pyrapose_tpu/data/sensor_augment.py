"""Sensor-realistic depth augmentation for synthetic training data.

Re-implementation of the reference's offline depth augmentation
(/root/reference/annotation_scripts/Augmentations.py:10-135 `augmentDepth`),
used to make rendered depth look like Kinect-class sensor output:

1. shadow: morphological opening + median filter of the object mask, zeroing
   depth outside the surviving mask (Augmentations.py:38-44);
2. quantization: half-resolution resample, Gaussian blur, rounding to the
   depth-dependent disparity resolution res = (d/1000 * sqrt(2))^2, plus
   multiplicative Gaussian noise (:46-55);
3. Perlin-style warp: fractal-noise displacement fields scaled by depth,
   plus a depth offset field (:57-134).

Dependencies differ deliberately: the reference needs OpenCV, scipy.signal
and pyfastnoisesimd; this version is pure numpy (value-noise FBM replaces
simplex-fractal noise — both are band-limited smooth fields; training-time
equivalence is distributional, matching the augmentation-parity strategy of
SURVEY.md section 7.3).
"""

from __future__ import annotations

import numpy as np


def _binary_open(mask: np.ndarray, k: int) -> np.ndarray:
    """Morphological opening with a k x k structuring element (erode+dilate)."""
    if k <= 1:
        return mask

    def erode(m):
        out = m.copy()
        r = k // 2
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                out &= np.roll(np.roll(m, dy, 0), dx, 1)
        return out

    def dilate(m):
        out = m.copy()
        r = k // 2
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                out |= np.roll(np.roll(m, dy, 0), dx, 1)
        return out

    return dilate(erode(mask))


def _median_filter(img: np.ndarray, k: int) -> np.ndarray:
    if k <= 1:
        return img
    r = k // 2
    stack = [
        np.roll(np.roll(img, dy, 0), dx, 1)
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
    ]
    return np.median(np.stack(stack), axis=0)


def _gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    if sigma <= 0:
        return img
    r = max(1, int(3 * sigma))
    x = np.arange(-r, r + 1)
    kern = np.exp(-0.5 * (x / sigma) ** 2)
    kern /= kern.sum()
    out = np.apply_along_axis(lambda m: np.convolve(m, kern, mode="same"), 0, img)
    return np.apply_along_axis(lambda m: np.convolve(m, kern, mode="same"), 1, out)


def value_noise_fbm(
    rng: np.random.Generator,
    shape: tuple[int, int],
    frequency: float = 0.1,
    octaves: int = 4,
    lacunarity: float = 2.1,
    gain: float = 0.45,
) -> np.ndarray:
    """Fractal value noise in [-1, 1] — stand-in for simplex-fractal FBM."""
    h, w = shape
    out = np.zeros(shape, np.float32)
    amp = 1.0
    freq = frequency
    total = 0.0
    for _ in range(octaves):
        gh = max(2, int(h * freq) + 1)
        gw = max(2, int(w * freq) + 1)
        grid = rng.uniform(-1, 1, (gh + 1, gw + 1)).astype(np.float32)
        ys = np.linspace(0, gh, h, endpoint=False)
        xs = np.linspace(0, gw, w, endpoint=False)
        y0 = ys.astype(int)
        x0 = xs.astype(int)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        fy = fy * fy * (3 - 2 * fy)  # smoothstep
        fx = fx * fx * (3 - 2 * fx)
        g00 = grid[y0][:, x0]
        g01 = grid[y0][:, x0 + 1]
        g10 = grid[y0 + 1][:, x0]
        g11 = grid[y0 + 1][:, x0 + 1]
        layer = (
            g00 * (1 - fy) * (1 - fx)
            + g01 * (1 - fy) * fx
            + g10 * fy * (1 - fx)
            + g11 * fy * fx
        )
        out += amp * layer
        total += amp
        amp *= gain
        freq *= lacunarity
    return out / max(total, 1e-9)


def augment_depth(
    depth: np.ndarray,
    obj_mask: np.ndarray,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Full sensor-realistic depth augmentation (depth in mm, float)."""
    rng = rng or np.random.default_rng()
    h, w = depth.shape
    depth = depth.astype(np.float64)

    # 1. shadow: opened + median-filtered mask gates the depth
    k_shadow = int(rng.choice([3, 5, 7]))
    k_med = int(rng.choice([3, 5, 7]))
    mask = _binary_open(obj_mask > 0, k_shadow)
    mask = _median_filter(mask.astype(np.float64), k_med) > 0.5
    depth = np.where(mask, depth, 0.0)

    # 2. half-res blur + quantization to disparity resolution + noise
    small = depth[::2, ::2]
    res = ((small / 1000.0) * 1.41421356) ** 2
    small = _gaussian_blur(small, rng.uniform(0.0, 1.5))
    quant = np.divide(small, res, out=np.zeros_like(small), where=res != 0)
    quant = np.round(quant) * res
    noise_scale = np.abs(quant) * rng.uniform(0.002, 0.004)
    small = rng.normal(loc=quant, scale=noise_scale)  # scale 0 where depth 0
    depth = np.kron(small, np.ones((2, 2)))[:h, :w]

    # 3. depth-scaled warp + offset from fractal noise fields
    freq = rng.uniform(0.05, 0.2)
    octaves = int(rng.choice([4, 8]))
    f0 = value_noise_fbm(rng, (h, w), freq, octaves)
    f1 = value_noise_fbm(rng, (h, w), freq, octaves)
    f2 = value_noise_fbm(rng, (h, w), freq, octaves)
    wxy = rng.integers(1, 5)
    wz = rng.uniform(0.0001, 0.004)
    x = np.arange(w)[None, :].repeat(h, axis=0)
    y = np.arange(h)[:, None].repeat(w, axis=1)
    wxy_s = depth * 0.001 * wxy
    wz_s = depth * 0.001 * wz
    fx = np.clip(x + wxy_s * f0, 0, w - 1).astype(np.intp)
    fy = np.clip(y + wxy_s * f1, 0, h - 1).astype(np.intp)
    warped = depth[fy, fx] + wz_s * f2
    return np.where(warped > 0, warped, 0.0)


def augment_rgb(
    image: np.ndarray, rng: np.random.Generator | None = None
) -> np.ndarray:
    """Photometric augmentation of rendered RGB (Augmentations.py:268-383
    capability: brightness/contrast/hue-ish jitter + gaussian noise + blur).
    uint8 in, uint8 out."""
    rng = rng or np.random.default_rng()
    img = image.astype(np.float32)
    # channel-wise gain (hue/saturation-ish) and global brightness/contrast
    gain = rng.uniform(0.9, 1.1, size=(1, 1, 3))
    img = img * gain
    img = (img - 128.0) * rng.uniform(0.8, 1.2) + 128.0 + rng.uniform(-20, 20)
    if rng.random() < 0.5:
        img = img + rng.normal(0, rng.uniform(2, 8), img.shape)
    if rng.random() < 0.3:
        # per-channel spatial blur (a (H, W*3) view would convolve across
        # interleaved R/G/B of neighboring pixels -> color fringing)
        sigma = rng.uniform(0.3, 1.2)
        img = np.stack(
            [_gaussian_blur(img[..., c], sigma) for c in range(img.shape[-1])],
            axis=-1,
        )
    return np.clip(img, 0, 255).astype(np.uint8)
