"""Photometric augmentation ON DEVICE, fused into the train step.

The host photometric soup (data/augment.py photometric_augment, matching the
reference imgaug pipeline utils/image.py:154-190) costs ~25 ms of host CPU
per 480x640 frame — the single largest host-loader stage. On TPU the same
math is a handful of fused elementwise passes, essentially free next to the
conv stack. With --device-augment the host loader only decodes: the
photometric jitter here and the geometric warp (data/device_affine.py) both
run inside the jitted fused train step, keyed by (seed, global step, sample
index) — deterministic, resumable, zero host cost.

Design: of the 7 reference ops, five are affine maps of the channel vector
(add, multiply, linear-contrast, grayscale-mix, hue/saturation):
x' = M @ x + c with M (3,3). A random-order sequence of all 7 therefore
composes EXACTLY into three affine segments around the two non-affine ops:

    y = A2( gamma?( A1( blur?( A0(x) ) ) ) )

A tiny lax.scan over the sampled op permutation multiplies each firing
affine op into the segment selected by how many non-affine ops have fired
yet. One approximation vs the host path: when both blur and gamma fire AND
the sampled order puts gamma first (~1/8 of both-fire samples), the device
pipeline still applies blur first — both are smooth local ops, the
distributional effect is negligible (SURVEY §7.3: augmentation parity is
judged on the final ADD metric, not pixels).

Blur matches cv2.GaussianBlur(k in {3,5}, sigma=0.3((k-1)/2-1)+0.8) with
reflect-101 edges; the final result is rounded and clipped like the host's
uint8 cast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# op ids (order matches the host tuple in augment.photometric_augment)
_BLUR, _ADD, _MULT, _GAMMA, _CONTRAST, _GRAY, _HUESAT = range(7)
# numpy (NOT jnp) constants: this module may be first imported while a jit
# trace is active, and jnp arrays created inside a trace are tracers — a
# module-level jnp constant would leak out of the trace
_EYE = np.eye(3, dtype=np.float32)
_J3 = np.ones((3, 3), np.float32) / 3.0


def sample_photometric(key: jax.Array) -> dict:
    """Sample one frame's photometric parameters (device-side).

    Returns the canonical-pipeline params: segment affines M (3,3,3)/c (3,3),
    blur taps (5,) (identity kernel when blur does not fire), gamma scalar
    (1.0 when gamma does not fire).
    """
    ks = jax.random.split(key, 12)
    fires = jax.random.bernoulli(ks[0], 0.5, (7,))
    perm = jax.random.permutation(ks[1], 7)

    # per-op affine forms (identity rows for blur/gamma)
    b3 = jax.random.uniform(ks[2], (3,), minval=-10.0, maxval=10.0)
    b1 = jax.random.uniform(ks[3], (), minval=-10.0, maxval=10.0)
    add_c = jnp.where(jax.random.bernoulli(ks[4], 0.5), b3, jnp.full((3,), b1))

    m3 = jax.random.uniform(ks[5], (3,), minval=0.75, maxval=1.25)
    m1 = jax.random.uniform(ks[6], (), minval=0.75, maxval=1.25)
    mult_a = jnp.where(jax.random.bernoulli(ks[7], 0.5), m3, jnp.full((3,), m1))

    ca = jax.random.uniform(ks[8], (), minval=0.7, maxval=1.3)
    alpha = jax.random.uniform(ks[9], (), minval=0.0, maxval=0.2)
    shift = jax.random.uniform(ks[10], (), minval=-15.0, maxval=15.0) / 100.0

    Ms = jnp.stack([
        _EYE,                                   # blur (placeholder)
        _EYE,                                   # add
        jnp.diag(mult_a),                       # multiply
        _EYE,                                   # gamma (placeholder)
        ca * _EYE,                              # linear contrast
        (1.0 - alpha) * _EYE + alpha * _J3,   # grayscale mix: (a/3)*ones
        (1.0 + shift) * _EYE - shift * _J3,   # hue/sat: -(s/3)*ones
    ])
    cs = jnp.stack([
        jnp.zeros(3), add_c, jnp.zeros(3), jnp.zeros(3),
        jnp.full((3,), 127.5 * (1.0 - ca)), jnp.zeros(3), jnp.zeros(3),
    ])

    # walk the permuted op order, composing affines into segment 0/1/2
    def step(carry, idx):
        seg, M, c = carry
        f = fires[idx]
        is_blur = idx == _BLUR
        is_gamma = idx == _GAMMA
        seg = jnp.where(f & is_blur, jnp.maximum(seg, 1), seg)
        seg = jnp.where(f & is_gamma, jnp.maximum(seg, 2), seg)
        affine = f & ~(is_blur | is_gamma)
        Mop = jnp.where(affine, Ms[idx], _EYE)
        cop = jnp.where(affine, cs[idx], jnp.zeros(3))
        newM = Mop @ M[seg]
        newc = Mop @ c[seg] + cop
        onehot = jnp.arange(3) == seg
        M = jnp.where(onehot[:, None, None], newM[None], M)
        c = jnp.where(onehot[:, None], newc[None], c)
        return (seg, M, c), None

    init = (jnp.zeros((), jnp.int32), jnp.tile(_EYE[None], (3, 1, 1)),
            jnp.zeros((3, 3)))
    (_, M, c), _ = jax.lax.scan(step, init, perm)

    # blur taps: k in {3,5}; cv2.GaussianBlur(sigma=0) uses the FIXED
    # binomial kernels for small ksize (getGaussianKernel small-kernel
    # table), not sigma-parameterized gaussians — match those exactly
    k5 = jax.random.bernoulli(ks[11], 0.5)
    taps3 = jnp.asarray([0.0, 0.25, 0.5, 0.25, 0.0])
    taps5 = jnp.asarray([0.0625, 0.25, 0.375, 0.25, 0.0625])
    taps = jnp.where(k5, taps5, taps3)
    identity_taps = jnp.asarray([0.0, 0.0, 1.0, 0.0, 0.0])
    taps = jnp.where(fires[_BLUR], taps, identity_taps)

    gamma = jnp.where(
        fires[_GAMMA],
        jax.random.uniform(jax.random.fold_in(key, 99), (),
                           minval=0.75, maxval=1.25),
        1.0,
    )
    return {"M": M, "c": c, "taps": taps, "gamma": gamma}


def _blur_reflect(img: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Separable 5-tap blur with reflect-101 edges (cv2 BORDER_DEFAULT)."""

    def along(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (2, 2)
        xp = jnp.pad(x, pad, mode="reflect")
        out = 0.0
        for i in range(5):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(i, i + x.shape[axis])
            out = out + taps[i] * xp[tuple(sl)]
        return out

    return along(along(img, 0), 1)


def apply_photometric(params: dict, img: jnp.ndarray) -> jnp.ndarray:
    """Apply sampled params to one (H, W, 3) float32 image in [0, 255]."""
    M, c, taps, gamma = params["M"], params["c"], params["taps"], params["gamma"]
    y = img @ M[0].T + c[0]
    y = _blur_reflect(y, taps)
    y = y @ M[1].T + c[1]
    y = ((jnp.clip(y, 0.0, None) / 255.0) ** gamma) * 255.0
    y = y @ M[2].T + c[2]
    # match the host's final uint8 quantization (clip + round)
    return jnp.round(jnp.clip(y, 0.0, 255.0))


def photometric_batch(
    key: jax.Array, images_f32: jnp.ndarray
) -> jnp.ndarray:
    """Per-sample photometric jitter over a (B, H, W, 3) float batch."""
    keys = jax.random.split(key, images_f32.shape[0])
    return jax.vmap(lambda k, im: apply_photometric(sample_photometric(k), im))(
        keys, images_f32
    )
