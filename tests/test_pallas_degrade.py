"""Fused Pallas data-term kernel vs the unfused reference path (interpret
mode on CPU; the compiled path is exercised on TPU by the benchmarks)."""

import numpy as np
import pytest

import jax.numpy as jnp

from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShiftSequence
from super_resolution_tpu.ops.pallas.degrade import (
    composite_taps,
    pallas_data_term_cost_and_grad,
)
from super_resolution_tpu.solvers.objective import data_term_cost_and_grad_static
from super_resolution_tpu.utils.testing import matrices_equal


def _problem(shifts, scale=2, blur=True, c=1, hw=(32, 32), seed=81):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((c, *hw)), jnp.float32)
    seq = MotionShiftSequence(shifts)
    params = ImageModelParameters(
        scale=scale,
        blur_radius=3 if blur else 0,
        blur_sigma=1.0 if blur else 0.0,
        motion_sequence=seq,
    )
    model = ImageModel.create(params)
    obs = jnp.stack([model.apply(x, k) for k in range(len(shifts))])
    kernel = None if not blur else model.blur_operator.kernel.astype(np.float32)
    return x, obs, seq.as_array(), kernel


def test_composite_taps_integer_shift():
    fwd, adj = composite_taps(1.0, 0.0, None)
    assert fwd == [(0, -1, 1.0)]
    assert adj == [(0, 1, 1.0)]
    fwd_b, _ = composite_taps(0.0, 0.0, np.ones((3, 3)) / 9.0)
    assert len(fwd_b) == 9


@pytest.mark.parametrize(
    "shifts,blur,scale",
    [
        ([(0, 0), (1, 1), (0, 1), (1, 0)], True, 2),
        ([(0, 0), (-1, 2)], True, 4),
        ([(0, 0), (0.5, -0.5), (1.25, 0.75)], True, 2),
        ([(0, 0), (1, 1)], False, 2),
    ],
)
def test_pallas_matches_reference(shifts, blur, scale):
    x, obs, shifts_np, kernel = _problem(shifts, scale=scale, blur=blur)
    cost_ref, grad_ref = data_term_cost_and_grad_static(
        x, obs, shifts_np, None if kernel is None else jnp.asarray(kernel), scale
    )
    cost_p, grad_p = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, scale, tile=16, interpret=True
    )
    assert abs(float(cost_p) - float(cost_ref)) < 1e-4 * max(1.0, abs(float(cost_ref)))
    assert matrices_equal(np.asarray(grad_p), np.asarray(grad_ref), 1e-5)


def test_pallas_multichannel_nondivisible():
    """3 channels, H/W not multiples of the tile size."""
    x, obs, shifts_np, kernel = _problem(
        [(0, 0), (1, 1), (-1, 0)], scale=2, blur=True, c=3, hw=(22, 26), seed=82
    )
    cost_ref, grad_ref = data_term_cost_and_grad_static(
        x, obs, shifts_np, jnp.asarray(kernel), 2
    )
    cost_p, grad_p = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, 2, tile=16, interpret=True
    )
    assert abs(float(cost_p) - float(cost_ref)) < 1e-4 * max(1.0, abs(float(cost_ref)))
    assert matrices_equal(np.asarray(grad_p), np.asarray(grad_ref), 1e-5)
