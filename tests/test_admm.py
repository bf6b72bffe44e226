"""ADMM solver tests (the reference's AdmmSolver is a stub returning its
input, ``admm_solver.cpp:10-34``; ours actually solves)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from super_resolution_tpu.evaluation import psnr
from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShift, MotionShiftSequence
from super_resolution_tpu.ops.resize import linear_resize
from super_resolution_tpu.solvers.admm import _g, _gt, admm_solve
from super_resolution_tpu.utils.testing import matrices_equal


def test_difference_operator_adjoint():
    rng = np.random.default_rng(71)
    x = jnp.asarray(rng.normal(size=(2, 6, 7)))
    z = jnp.asarray(rng.normal(size=(2, 2, 6, 7)))
    # Zero the components the operator never produces (last col/row).
    z = z.at[0, ..., :, -1].set(0.0).at[1, ..., -1, :].set(0.0)
    lhs = float(jnp.vdot(_g(x).reshape(-1), z.reshape(-1)))
    rhs = float(jnp.vdot(x.reshape(-1), _gt(z).reshape(-1)))
    assert abs(lhs - rhs) < 1e-10


def test_admm_small_data_exact_recovery():
    lr_values = [0.4, 0.2, 0.0, 1.0]
    observations = jnp.stack([jnp.full((1, 2, 2), v) for v in lr_values])
    shifts = jnp.asarray([[0, 0], [-1, 0], [0, -1], [-1, -1]], dtype=jnp.float64)
    ground_truth = np.array(
        [
            [0.4, 0.2, 0.4, 0.2],
            [0.0, 1.0, 0.0, 1.0],
            [0.4, 0.2, 0.4, 0.2],
            [0.0, 1.0, 0.0, 1.0],
        ]
    )
    result = admm_solve(
        jnp.zeros((1, 4, 4)), observations, shifts, None, 2,
        tv_lambda=1e-6, rho=0.5, num_iterations=40, cg_iterations=8, max_shift=3,
    )
    assert matrices_equal(np.asarray(result.x)[0], ground_truth, 0.001)
    assert float(result.primal_residual) < 1e-3


def test_admm_denoises_better_than_unregularized(test_data_dir):
    import cv2

    image = cv2.imread(f"{test_data_dir}/fb.png", cv2.IMREAD_GRAYSCALE)
    gt = jnp.asarray(
        cv2.resize(image.astype(np.float64) / 255.0, (28, 28),
                   interpolation=cv2.INTER_NEAREST)
    )[None]
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(1, 0), MotionShift(0, 1), MotionShift(1, 1)]
    )
    model = ImageModel.create(
        ImageModelParameters(scale=2, blur_radius=3, blur_sigma=1.5,
                             motion_sequence=seq, noise_sigma=12.0, noise_seed=5)
    )
    clean_model = ImageModel.create(
        ImageModelParameters(scale=2, blur_radius=3, blur_sigma=1.5, motion_sequence=seq)
    )
    obs = jnp.stack([model.apply(gt, k) for k in range(4)])
    shifts = jnp.asarray(seq.as_array())
    kernel = jnp.asarray(clean_model.blur_operator.kernel)
    x0 = linear_resize(obs[0], (28, 28))

    solve = jax.jit(
        lambda lam: admm_solve(
            x0, obs, shifts, kernel, 2, tv_lambda=lam, rho=1.0,
            num_iterations=30, cg_iterations=8, max_shift=3,
        ).x
    )
    unreg = solve(1e-8)
    reg = solve(0.02)
    psnr_unreg = float(psnr(unreg, gt))
    psnr_reg = float(psnr(reg, gt))
    assert psnr_reg > psnr_unreg, (psnr_reg, psnr_unreg)


def test_admm_solver_class_matches_irls_ordering(test_data_dir):
    """AdmmSolver (the Solver-interface citizen, replacing the reference's
    stub ``admm_solver.cpp:10-34``) on the RegularizationTest geometry:
    TV-regularized ADMM beats its own unregularized solve, and lands in the
    same quality band as the IRLS TV solve (the two minimize the same
    L1-TV-regularized data term by different routes)."""
    import cv2

    from super_resolution_tpu.ops.tv import TotalVariationRegularizer
    from super_resolution_tpu.solvers import (
        AdmmSolver,
        AdmmSolverOptions,
        IRLSMapSolver,
        IRLSMapSolverOptions,
    )

    image = cv2.imread(f"{test_data_dir}/fb.png", cv2.IMREAD_GRAYSCALE)
    gt = jnp.asarray(
        cv2.resize(image.astype(np.float64) / 255.0, (28, 28),
                   interpolation=cv2.INTER_NEAREST)
    )[None]
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(1, 0), MotionShift(0, 1), MotionShift(1, 1)]
    )
    noisy_model = ImageModel.create(
        ImageModelParameters(scale=2, blur_radius=3, blur_sigma=1.5,
                             motion_sequence=seq, noise_sigma=12.0, noise_seed=5)
    )
    clean_model = ImageModel.create(
        ImageModelParameters(scale=2, blur_radius=3, blur_sigma=1.5,
                             motion_sequence=seq)
    )
    obs = [np.asarray(noisy_model.apply(gt, k)) for k in range(4)]
    x0 = np.asarray(linear_resize(jnp.asarray(obs[0]), (28, 28)))

    def run_admm(lam):
        solver = AdmmSolver(
            AdmmSolverOptions(max_num_solver_iterations=30, rho=1.0,
                              admm_cg_iterations=8),
            clean_model, obs,
        )
        if lam > 0:
            solver.add_regularizer(TotalVariationRegularizer(), lam)
        return float(psnr(np.asarray(solver.solve(x0)), gt))

    psnr_unreg = run_admm(0.0)
    psnr_admm = run_admm(0.02)
    assert psnr_admm > psnr_unreg, (psnr_admm, psnr_unreg)

    irls = IRLSMapSolver(IRLSMapSolverOptions(), clean_model, obs)
    irls.add_regularizer(TotalVariationRegularizer(), 0.02)
    psnr_irls = float(psnr(np.asarray(irls.solve(x0)), gt))
    # Same quality band (inverse-crime: both should reconstruct well).
    assert abs(psnr_admm - psnr_irls) < 2.0, (psnr_admm, psnr_irls)


def test_admm_solver_rejects_btv():
    from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
    from super_resolution_tpu.solvers import AdmmSolver, AdmmSolverOptions

    seq = MotionShiftSequence([MotionShift(0, 0)] * 4)
    model = ImageModel.create(ImageModelParameters(scale=2, motion_sequence=seq))
    obs = [np.zeros((1, 4, 4))] * 4
    solver = AdmmSolver(AdmmSolverOptions(), model, obs)
    solver.add_regularizer(BilateralTotalVariationRegularizer(2, 0.5), 0.01)
    with pytest.raises(ValueError):
        solver.solve(np.zeros((1, 8, 8)))
