"""ImageData container tests, mirroring ``test/test_image_data.cpp``."""

import cv2
import numpy as np
import pytest

from super_resolution_tpu import ImageData, SpectralMode
from super_resolution_tpu.utils.testing import matrices_equal

PIXEL_TOL = 1.0 / 255.0

IMAGE_4X4 = np.array(
    [
        [0.1, 0.2, 0.3, 0.4],
        [0.5, 0.6, 0.7, 0.8],
        [0.9, 1.0, 0.0, 0.2],
        [0.4, 0.6, 0.8, 1.0],
    ]
)

# 4x4x3 BGR color test image (values in [0, 1]).
rng = np.random.default_rng(42)
COLOR_HWC = rng.random((4, 4, 3))


def test_empty_image():
    image = ImageData()
    assert image.num_channels == 0
    assert image.size == (0, 0)
    assert image.is_empty()


def test_add_channels_and_access():
    image = ImageData()
    for i in range(5):
        image.add_channel(IMAGE_4X4 * (i + 1) / 5.0, normalize="never")
    assert image.num_channels == 5
    assert image.size == (4, 4)
    assert image.num_pixels == 16
    for i in range(5):
        assert matrices_equal(image.channel(i), IMAGE_4X4 * (i + 1) / 5.0, 1e-12)
    assert image.spectral_mode == SpectralMode.HYPERSPECTRAL


def test_normalization_auto():
    # 0-255 range gets divided by 255 (image_data.cpp:218-235).
    img255 = (IMAGE_4X4 * 255).round()
    image = ImageData(img255)
    assert matrices_equal(image.channel(0), img255 / 255.0, 1e-12)
    # Already-normalized input is untouched.
    image2 = ImageData(IMAGE_4X4)
    assert matrices_equal(image2.channel(0), IMAGE_4X4, 1e-12)


def test_normalization_never_keeps_invalid_values():
    invalid = np.array([[0.5, 1.5, 100.0], [-25.0, 0.0, -30.0], [55.0, 1.98, 1000.0]])
    image = ImageData(invalid, normalize="never")
    assert matrices_equal(image.channel(0), invalid)


def test_normalization_auto_rejects_out_of_range():
    with pytest.raises(ValueError):
        ImageData(np.array([[-1.0, 0.0]]))
    with pytest.raises(ValueError):
        ImageData(np.array([[256.0, 0.0]]))


def test_spectral_mode_detection():
    assert ImageData(IMAGE_4X4).spectral_mode == SpectralMode.NONE
    assert ImageData(COLOR_HWC, normalize="never").spectral_mode == SpectralMode.COLOR_BGR
    hsi = np.stack([IMAGE_4X4] * 7)
    assert (
        ImageData(hsi, normalize="never", channel_major=True).spectral_mode
        == SpectralMode.HYPERSPECTRAL
    )


def test_resize_multichannel():
    image = ImageData()
    for _ in range(10):
        image.add_channel(IMAGE_4X4, normalize="never")
    smaller = image.resized((2, 2), method="nearest")
    smaller2 = image.resized(0.5, method="nearest")
    expected = np.array([[0.1, 0.3], [0.9, 0.0]])
    for c in range(10):
        assert matrices_equal(smaller.channel(c), expected)
        assert matrices_equal(smaller2.channel(c), expected)


def test_color_space_round_trip_vs_opencv():
    image = ImageData(COLOR_HWC, normalize="never")
    ycrcb = image.change_color_space(SpectralMode.COLOR_YCRCB)
    expected = cv2.cvtColor(COLOR_HWC.astype(np.float32), cv2.COLOR_BGR2YCrCb)
    for c in range(3):
        assert matrices_equal(ycrcb.channel(c), expected[..., c], PIXEL_TOL)
    back = ycrcb.change_color_space(SpectralMode.COLOR_BGR)
    for c in range(3):
        assert matrices_equal(back.channel(c), COLOR_HWC[..., c], PIXEL_TOL)


def test_luminance_only_mode():
    image = ImageData(COLOR_HWC, normalize="never")
    lum = image.change_color_space(SpectralMode.COLOR_YCRCB, luminance_only=True)
    assert lum.num_channels == 1
    expected = cv2.cvtColor(COLOR_HWC.astype(np.float32), cv2.COLOR_BGR2YCrCb)
    assert matrices_equal(lum.channel(0), expected[..., 0], PIXEL_TOL)
    # Resize only exposes 1 channel but carries chroma along.
    lum_big = lum.resized(2, method="nearest")
    assert lum_big.num_channels == 1
    assert lum_big.total_num_channels == 3
    # Converting back to BGR interpolates chroma to the new size.
    back = lum_big.change_color_space(SpectralMode.COLOR_BGR)
    assert back.num_channels == 3
    expected_resized = cv2.resize(COLOR_HWC, (8, 8), interpolation=cv2.INTER_NEAREST)
    for c in range(3):
        # Forgiving tolerance: converted => resized => converted back with
        # bilinear chroma (mirrors 0.15 tolerance at test_image_data.cpp:525).
        assert matrices_equal(back.channel(c), expected_resized[..., c], 0.15)


def test_interpolate_color_from():
    image = ImageData(COLOR_HWC, normalize="never")
    ycrcb = image.change_color_space(SpectralMode.COLOR_YCRCB)
    # A high-res luminance image adopts chroma from the low-res color image.
    lum_hr = ImageData(np.asarray(ycrcb.channel(0)), normalize="never").resized(
        2, method="linear"
    )
    merged = lum_hr.interpolate_color_from(ycrcb)
    assert merged.num_channels == 3
    assert merged.spectral_mode == SpectralMode.COLOR_YCRCB
    assert merged.size == (8, 8)
    # Chroma channels equal bilinear upsampling of the source chroma.
    expected_cr = cv2.resize(
        np.asarray(ycrcb.channel(1)), (8, 8), interpolation=cv2.INTER_LINEAR
    )
    assert matrices_equal(merged.channel(1), expected_cr, 1e-6)


def test_operators():
    image = ImageData(IMAGE_4X4, normalize="never")
    doubled = image * 2.0
    assert matrices_equal(doubled.channel(0), IMAGE_4X4 * 2.0, 1e-12)
    halved = image / 2.0
    assert matrices_equal(halved.channel(0), IMAGE_4X4 / 2.0, 1e-12)
    summed = image + doubled
    assert matrices_equal(summed.channel(0), IMAGE_4X4 * 3.0, 1e-12)


def test_report():
    arr = np.array([[-0.5, 0.5], [1.5, 2.5]])
    image = ImageData(arr, normalize="never")
    report = image.report()
    assert report.num_negative_pixels == 1
    assert report.num_over_one_pixels == 2
    assert report.smallest_pixel_value == -0.5
    assert report.largest_pixel_value == 2.5


def test_visualization_image_mono():
    image = ImageData(IMAGE_4X4, normalize="never")
    vis = image.visualization_image()
    assert vis.dtype == np.uint8
    assert vis.shape == (4, 4)
    assert vis[0, 0] == int(0.1 * 255)
