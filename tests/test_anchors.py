import math

import numpy as np

from pyrapose_tpu.geometry import (
    AnchorConfig,
    anchors_for_shape,
    generate_base_anchors,
    pyramid_shapes,
    shift_anchors,
)


def test_pyramid_shapes_480x640():
    assert pyramid_shapes((480, 640)) == [(60, 80), (30, 40), (15, 20)]


def test_pyramid_shapes_ceil():
    # ceil division, matching reference guess_shapes (anchors.py:357-369)
    assert pyramid_shapes((481, 641)) == [(61, 81), (31, 41), (16, 21)]


def test_base_anchor_geometry():
    a = generate_base_anchors(32.0)
    assert a.shape == (9, 4)
    # anchor i: ratio = ratios[i // 3], scale = scales[i % 3]
    # ratio=1, scale=1 is index 3: a square 32x32 box centered at origin
    np.testing.assert_allclose(a[3], [-16, -16, 16, 16], atol=1e-9)
    # ratio=0.5 (wide): w = 32*s/sqrt(0.5), h = w*0.5; area preserved
    s = 2 ** (1 / 3)
    w = 32 * s / math.sqrt(0.5)
    np.testing.assert_allclose(a[1], [-w / 2, -w / 4, w / 2, w / 4], atol=1e-9)
    # area preservation for every anchor: w*h == (base*scale)^2
    widths = a[:, 2] - a[:, 0]
    heights = a[:, 3] - a[:, 1]
    scales = np.array([1.0, 2 ** (1 / 3), 2 ** (2 / 3)] * 3)
    np.testing.assert_allclose(widths * heights, (32 * scales) ** 2, rtol=1e-9)
    # aspect ratios h/w == [0.5]*3 + [1]*3 + [2]*3
    np.testing.assert_allclose(
        heights / widths, np.repeat([0.5, 1.0, 2.0], 3), rtol=1e-9
    )


def test_shift_ordering():
    base = generate_base_anchors(32.0)
    out = shift_anchors((2, 3), 8, base)
    assert out.shape == (2 * 3 * 9, 4)
    # first 9 anchors centered at (0.5*8, 0.5*8) = (4, 4)
    centers = (out[:9, :2] + out[:9, 2:]) / 2
    np.testing.assert_allclose(centers, np.full((9, 2), 4.0), atol=1e-9)
    # anchor index fastest: next block centered at x = 12 (same row)
    centers2 = (out[9:18, :2] + out[9:18, 2:]) / 2
    np.testing.assert_allclose(centers2, np.tile([12.0, 4.0], (9, 1)), atol=1e-9)
    # row-major: location (1, 0) comes after the full first row
    centers_row2 = (out[27:36, :2] + out[27:36, 2:]) / 2
    np.testing.assert_allclose(centers_row2, np.tile([4.0, 12.0], (9, 1)), atol=1e-9)


def test_anchors_for_shape_count_and_levels():
    a = anchors_for_shape((480, 640))
    # 9 * (60*80 + 30*40 + 15*20) = 56700
    assert a.shape == (56700, 4)
    assert a.dtype == np.float32
    # level boundaries: P3 block ends at 60*80*9
    p3_end = 60 * 80 * 9
    # P4 anchors are larger: base size 64 at stride 16
    p4 = a[p3_end : p3_end + 9]
    centers = (p4[:, :2] + p4[:, 2:]) / 2
    np.testing.assert_allclose(centers, np.full((9, 2), 8.0), atol=1e-5)
    w_sq = p4[3, 2] - p4[3, 0]
    np.testing.assert_allclose(w_sq, 64.0, atol=1e-4)


def test_anchors_cached_identity():
    a1 = anchors_for_shape((480, 640))
    a2 = anchors_for_shape((480, 640))
    assert a1 is a2
    cfg = AnchorConfig(sizes=(48.0, 96.0, 192.0))
    a3 = anchors_for_shape((480, 640), cfg)
    assert a3 is not a1
