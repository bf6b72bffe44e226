"""Shift-add fusion tests (behavioral parity with ``src/shift_add_fusion.cpp``)."""

import numpy as np

import jax.numpy as jnp

from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShift, MotionShiftSequence
from super_resolution_tpu.solvers.shift_add import fill_holes, shift_add_fusion
from super_resolution_tpu.utils.testing import matrices_equal


def test_shift_add_exact_reconstruction():
    """With a complete shift grid and no blur/noise, shift-add fusion exactly
    reassembles the HR image (away from warp-truncated borders)."""
    rng = np.random.default_rng(21)
    hr = rng.random((8, 8))
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(-1, 0), MotionShift(0, -1), MotionShift(-1, -1)]
    )
    model = ImageModel.create(ImageModelParameters(scale=2, motion_sequence=seq))
    frames = [np.asarray(model.apply(hr, k)) for k in range(4)]
    fused = shift_add_fusion(np.stack(frames), seq.as_array(), 2, inpaint=False)
    # LR frame k pixel (y, x) = hr[2y - dy_k, 2x - dx_k] (shifts are negative
    # here so sampling covers all parities); fusion places it back at
    # (2y - dy, 2x - dx). All 16 parity positions covered -> exact.
    assert matrices_equal(np.asarray(fused), hr, 1e-12)


def test_shift_add_with_holes_and_inpaint():
    rng = np.random.default_rng(22)
    hr = rng.random((12, 12))
    # Only 2 of 4 parity classes covered at scale 2 -> holes to inpaint.
    seq = MotionShiftSequence([MotionShift(0, 0), MotionShift(-1, -1)])
    model = ImageModel.create(ImageModelParameters(scale=2, motion_sequence=seq))
    frames = [np.asarray(model.apply(hr, k)) for k in range(2)]
    fused_raw = shift_add_fusion(np.stack(frames), seq.as_array(), 2, inpaint=False)
    fused = shift_add_fusion(np.stack(frames), seq.as_array(), 2, inpaint=True)
    # Where pixels were placed, values are exact.
    mask = np.zeros((12, 12), dtype=bool)
    mask[::2, ::2] = True
    mask[1::2, 1::2] = True
    assert matrices_equal(np.asarray(fused)[mask], hr[mask], 1e-12)
    # Inpainted pixels are plausible (bounded by the value range, not zero).
    holes = ~mask
    assert np.asarray(fused_raw)[holes].max() == 0.0
    assert np.asarray(fused)[holes].min() > 0.0
    assert np.asarray(fused)[holes].max() <= 1.0


def test_fill_holes_converges():
    img = jnp.zeros((9, 9)).at[4, 4].set(5.0)
    known = jnp.zeros((9, 9), dtype=bool).at[4, 4].set(True)
    filled = np.asarray(fill_holes(img, known))
    assert matrices_equal(filled, np.full((9, 9), 5.0), 1e-9)


def test_shift_add_frame_count_mismatch():
    import pytest

    with pytest.raises(ValueError):
        shift_add_fusion(np.zeros((2, 4, 4)), np.zeros((3, 2)), 2)


def test_shift_add_multichannel():
    rng = np.random.default_rng(23)
    hr = rng.random((3, 8, 8))
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(-1, 0), MotionShift(0, -1), MotionShift(-1, -1)]
    )
    model = ImageModel.create(ImageModelParameters(scale=2, motion_sequence=seq))
    frames = [np.asarray(model.apply(hr, k)) for k in range(4)]
    fused = shift_add_fusion(np.stack(frames), seq.as_array(), 2, inpaint=False)
    assert fused.shape == (3, 8, 8)
    assert matrices_equal(np.asarray(fused), hr, 1e-12)
