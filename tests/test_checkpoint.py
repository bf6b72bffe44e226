"""IRLS checkpoint/resume seam (SURVEY.md §5): interrupt-and-resume equals
an uninterrupted run, single-device and on a band-sharded mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShift, MotionShiftSequence
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.parallel import BAND_AXIS, make_mesh
from super_resolution_tpu.solvers import IRLSMapSolver, IRLSMapSolverOptions


def _problem(c=1):
    rng = np.random.default_rng(9)
    hr = jnp.asarray(rng.random((c, 16, 16)))
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(1, 1), MotionShift(-1, 0), MotionShift(0, -1)]
    )
    model = ImageModel.create(
        ImageModelParameters(scale=2, blur_radius=3, blur_sigma=1.0, motion_sequence=seq)
    )
    obs = [np.asarray(model.apply(hr, k)) for k in range(4)]
    return hr, model, obs


def _opts(max_irls):
    return IRLSMapSolverOptions(
        max_num_irls_iterations=max_irls,
        irls_cost_difference_threshold=0.0,
        max_num_solver_iterations=8,
    )


def _solve(model, obs, max_irls, shape, mesh=None, ckpt=None, resume=False):
    solver = IRLSMapSolver(_opts(max_irls), model, obs, mesh=mesh)
    solver.add_regularizer(TotalVariationRegularizer(), 0.001)
    return np.asarray(
        solver.solve(np.zeros(shape), checkpoint_path=ckpt, resume=resume)
    )


def test_resume_equals_uninterrupted(tmp_path):
    hr, model, obs = _problem()
    ckpt = str(tmp_path / "irls")
    full = _solve(model, obs, 4, hr.shape)
    _solve(model, obs, 2, hr.shape, ckpt=ckpt)  # interrupted at iteration 2
    resumed = _solve(model, obs, 4, hr.shape, ckpt=ckpt, resume=True)
    np.testing.assert_allclose(resumed, full, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_resume_on_band_mesh(tmp_path):
    """The checkpoint seam works under a band mesh: host checkpoints, mesh
    placement restored on resume, result matches the uninterrupted sharded
    run (and the single-device run at quality level)."""
    hr, model, obs = _problem(c=4)
    mesh = make_mesh({BAND_AXIS: 4}, jax.devices()[:4])
    ckpt = str(tmp_path / "irls_mesh")
    full = _solve(model, obs, 4, hr.shape, mesh=mesh)
    _solve(model, obs, 2, hr.shape, mesh=mesh, ckpt=ckpt)
    resumed = _solve(model, obs, 4, hr.shape, mesh=mesh, ckpt=ckpt, resume=True)
    np.testing.assert_allclose(resumed, full, atol=1e-9)
