"""Resize-mode parity tests.

Goldens come from the reference's ``test/test_image_data.cpp:300-400``
(nearest + additive) and from direct cross-checks against OpenCV's
``cv::resize`` (linear / cubic / nearest on real data), which is exactly the
code path the C++ reference delegates to.
"""

import cv2
import numpy as np
import pytest

from super_resolution_tpu.ops import (
    additive_resize,
    block_sum_downsample,
    cubic_resize,
    decimate,
    linear_resize,
    nearest_resize,
    zero_upsample,
)
from super_resolution_tpu.utils.testing import matrices_equal

IMAGE_4X4 = np.array(
    [
        [0.1, 0.2, 0.3, 0.4],
        [0.5, 0.6, 0.7, 0.8],
        [0.9, 1.0, 0.0, 0.2],
        [0.4, 0.6, 0.8, 1.0],
    ]
)


def test_nearest_downsample_golden():
    expected = np.array([[0.1, 0.3], [0.9, 0.0]])
    out = nearest_resize(IMAGE_4X4, (2, 2))
    assert matrices_equal(out, expected)


def test_nearest_upsample_golden():
    expected = np.repeat(np.repeat(IMAGE_4X4, 2, axis=0), 2, axis=1)
    out = nearest_resize(IMAGE_4X4, (8, 8))
    assert matrices_equal(out, expected)


def test_additive_upsample_golden():
    expected = np.zeros((8, 8))
    expected[::2, ::2] = IMAGE_4X4
    out = additive_resize(IMAGE_4X4, (8, 8))
    assert matrices_equal(out, expected)


def test_additive_downsample_golden():
    expected = np.array(
        [
            [0.1 + 0.2 + 0.5 + 0.6, 0.3 + 0.4 + 0.7 + 0.8],
            [0.9 + 1.0 + 0.4 + 0.6, 0.0 + 0.2 + 0.8 + 1.0],
        ]
    )
    out = additive_resize(IMAGE_4X4, (2, 2))
    assert matrices_equal(out, expected, 1e-12)


def test_additive_round_trip_exact():
    up = additive_resize(IMAGE_4X4, (8, 8))
    down = additive_resize(np.asarray(up), (4, 4))
    assert matrices_equal(down, IMAGE_4X4, 1e-15)


def test_decimate_zero_upsample_adjoint():
    """<D x, y> == <x, D^T y> — exact adjointness of decimate / zero_upsample."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 12, 12))
    y = rng.normal(size=(3, 4, 4))
    s = 3
    lhs = float((np.asarray(decimate(x, s)) * y).sum())
    rhs = float((x * np.asarray(zero_upsample(y, s))).sum())
    assert abs(lhs - rhs) < 1e-12


def test_multichannel_resize():
    img = np.stack([IMAGE_4X4 * (i + 1) for i in range(10)])
    out = np.asarray(nearest_resize(img, (2, 2)))
    for i in range(10):
        assert matrices_equal(out[i], np.array([[0.1, 0.3], [0.9, 0.0]]) * (i + 1), 1e-12)


@pytest.mark.parametrize("out_hw", [(7, 5), (16, 16), (3, 3), (10, 13)])
def test_nearest_matches_opencv(out_hw):
    rng = np.random.default_rng(1)
    img = rng.random((9, 11))
    expected = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_NEAREST)
    out = nearest_resize(img, out_hw)
    assert matrices_equal(out, expected, 1e-12)


@pytest.mark.parametrize("out_hw", [(7, 5), (16, 16), (20, 26), (3, 4)])
def test_linear_matches_opencv(out_hw):
    rng = np.random.default_rng(2)
    img = rng.random((10, 13))
    expected = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    out = linear_resize(img, out_hw)
    assert matrices_equal(out, expected, 1e-9)


@pytest.mark.parametrize("out_hw", [(20, 26), (15, 15)])
def test_cubic_matches_opencv_upsample(out_hw):
    rng = np.random.default_rng(3)
    img = rng.random((10, 13))
    expected = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_CUBIC)
    out = cubic_resize(img, out_hw)
    # OpenCV computes cubic tap weights in float32 internally; allow that slack.
    assert matrices_equal(out, expected, 1e-5)


def test_linear_real_image_matches_opencv(test_data_dir):
    img = cv2.imread(f"{test_data_dir}/dallas_qtr.jpg", cv2.IMREAD_GRAYSCALE)
    img = img.astype(np.float64) / 255.0
    expected = cv2.resize(img, (500, 500), interpolation=cv2.INTER_LINEAR)
    out = linear_resize(img, (500, 500))
    assert matrices_equal(out, expected, 1e-9)


def test_block_sum_downsample_matches_additive():
    rng = np.random.default_rng(4)
    x = rng.random((2, 12, 12))
    a = np.asarray(additive_resize(x, (4, 4)))
    b = np.asarray(block_sum_downsample(x, (4, 4)))
    assert matrices_equal(a, b)


def test_additive_mixed_axis_rejected():
    with pytest.raises(ValueError):
        additive_resize(IMAGE_4X4, (8, 2))
