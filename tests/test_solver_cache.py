"""Built-solver reuse across IRLSMapSolver instances: video sliding windows
construct a fresh solver per frame, and the jitted inner solve must be
shared whenever the trace constants match (shift VALUES are traced
arguments on the non-baked paths, so different motion estimates hit one
entry)."""

import numpy as np

import jax.numpy as jnp

from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShiftSequence
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.solvers import IRLSMapSolver, IRLSMapSolverOptions
from super_resolution_tpu.solvers import irls as irls_mod


def _solver(shifts, hr):
    seq = MotionShiftSequence(shifts)
    model = ImageModel.create(
        ImageModelParameters(scale=2, blur_radius=3, blur_sigma=1.0,
                             motion_sequence=seq)
    )
    obs = [np.asarray(model.apply(hr, k)) for k in range(len(shifts))]
    solver = IRLSMapSolver(
        IRLSMapSolverOptions(max_num_irls_iterations=2,
                             max_num_solver_iterations=6),
        model, obs,
    )
    solver.add_regularizer(TotalVariationRegularizer(), 0.001)
    return solver


def test_cross_instance_reuse_different_shifts():
    rng = np.random.default_rng(11)
    hr = jnp.asarray(rng.random((1, 16, 16)))
    irls_mod._BUILT_SOLVER_CACHE.clear()
    a = _solver([(0, 0), (1, 1), (0, 1), (1, 0)], hr)
    out_a = a.solve(np.zeros((1, 16, 16)))
    assert len(irls_mod._BUILT_SOLVER_CACHE) == 1
    # Fresh instance, DIFFERENT motion: shifts are traced arguments on the
    # default path, so the same built solver (and compiled executable) serves.
    b = _solver([(0, 0), (-1, 0), (0, -1), (1, -1)], hr)
    out_b = b.solve(np.zeros((1, 16, 16)))
    assert len(irls_mod._BUILT_SOLVER_CACHE) == 1
    assert np.isfinite(np.asarray(out_a)).all()
    assert np.isfinite(np.asarray(out_b)).all()
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_different_options_get_their_own_entry():
    rng = np.random.default_rng(12)
    hr = jnp.asarray(rng.random((1, 16, 16)))
    irls_mod._BUILT_SOLVER_CACHE.clear()
    a = _solver([(0, 0), (1, 1)], hr)
    a.solve(np.zeros((1, 16, 16)))
    b = _solver([(0, 0), (1, 1)], hr)
    b.options.max_num_solver_iterations = 9  # different trace constant
    b.solve(np.zeros((1, 16, 16)))
    assert len(irls_mod._BUILT_SOLVER_CACHE) == 2
