"""MAP solver integration tests, mirroring ``test/test_map_solver.cpp``.

Oracles (same three as the reference, SURVEY.md §4):
1. Tiny hand-solvable exact case (SmallDataTest).
2. Closed-form pseudo-inverse from dense operator matrices (RealIconDataTest).
3. Gradient cross-checks: analytic (reference-parity) vs jax.grad vs central
   finite differences.
"""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from super_resolution_tpu.evaluation import PeakSignalToNoiseRatioEvaluator
from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShift, MotionShiftSequence
from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
from super_resolution_tpu.ops.resize import linear_resize
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.solvers import (
    IRLSMapSolver,
    IRLSMapSolverOptions,
    data_term_cost,
    data_term_cost_and_grad,
    finite_difference_grad,
    make_map_value_and_grad,
)
from super_resolution_tpu.utils.testing import (
    matrices_equal,
    matrices_equal_cropped_border,
)

SOLVER_TOL = 0.001  # kSolverResultErrorTolerance


def _small_data_problem():
    lr_values = [0.4, 0.2, 0.0, 1.0]
    low_res_images = [np.full((2, 2), v) for v in lr_values]
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(-1, 0), MotionShift(0, -1), MotionShift(-1, -1)]
    )
    model = ImageModel.create(
        ImageModelParameters(scale=2, motion_sequence=seq)
    )
    ground_truth = np.array(
        [
            [0.4, 0.2, 0.4, 0.2],
            [0.0, 1.0, 0.0, 1.0],
            [0.4, 0.2, 0.4, 0.2],
            [0.0, 1.0, 0.0, 1.0],
        ]
    )
    return low_res_images, model, ground_truth


def test_small_data():
    """Exact recovery on the trivial 4-frame 2x case
    (``test_map_solver.cpp:79-143``)."""
    low_res_images, model, ground_truth = _small_data_problem()
    solver = IRLSMapSolver(IRLSMapSolverOptions(), model, low_res_images)
    result = solver.solve(np.zeros((1, 4, 4)))
    assert matrices_equal(np.asarray(result)[0], ground_truth, SOLVER_TOL)


def test_small_data_multichannel():
    """10-replicated-channel variant (``test_map_solver.cpp:146-198``)."""
    low_res_images, model, ground_truth = _small_data_problem()
    num_channels = 10
    multi = [np.stack([img[0] if img.ndim == 3 else img] * num_channels) for img in low_res_images]
    solver = IRLSMapSolver(IRLSMapSolverOptions(), model, multi)
    result = np.asarray(solver.solve(np.zeros((num_channels, 4, 4))))
    for c in range(num_channels):
        assert matrices_equal(result[c], ground_truth, SOLVER_TOL)

    opts = IRLSMapSolverOptions(split_channels=True)
    solver_split = IRLSMapSolver(opts, model, multi)
    result_split = np.asarray(solver_split.solve(np.zeros((num_channels, 4, 4))))
    for c in range(num_channels):
        assert matrices_equal(result_split[c], ground_truth, SOLVER_TOL)


def test_small_data_lbfgs():
    low_res_images, model, ground_truth = _small_data_problem()
    opts = IRLSMapSolverOptions(least_squares_solver="lbfgs")
    solver = IRLSMapSolver(opts, model, low_res_images)
    result = solver.solve(np.zeros((1, 4, 4)))
    assert matrices_equal(np.asarray(result)[0], ground_truth, SOLVER_TOL)


def test_real_icon_data_vs_pseudo_inverse(test_data_dir):
    """Solver vs closed-form ``x = (sum A^T A)^+ sum A^T y`` from dense
    matrices (``test_map_solver.cpp:205-308``)."""
    image = cv2.imread(f"{test_data_dir}/fb.png", cv2.IMREAD_GRAYSCALE)
    ground_truth = image.astype(np.float64) / 255.0
    h, w = ground_truth.shape  # 28 x 28
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(1, 0), MotionShift(0, 1), MotionShift(1, 1)]
    )
    model = ImageModel.create(ImageModelParameters(scale=2, motion_sequence=seq))

    low_res_images = [np.asarray(model.apply(ground_truth[None], k)) for k in range(4)]
    initial = linear_resize(jnp.asarray(low_res_images[0]), (h, w))

    solver = IRLSMapSolver(IRLSMapSolverOptions(), model, low_res_images)
    solver_result = np.asarray(solver.solve(np.asarray(initial)))[0]

    # Matrix-oracle solution.
    mats = [model.model_matrix((h, w), k) for k in range(4)]
    z = sum(a.T @ a for a in mats)
    b = sum(a.T @ y.reshape(-1) for a, y in zip(mats, low_res_images))
    matrix_result = (np.linalg.pinv(z) @ b).reshape(h, w)

    assert matrices_equal_cropped_border(matrix_result, ground_truth, 1, SOLVER_TOL)
    assert matrices_equal_cropped_border(solver_result, ground_truth, 1, SOLVER_TOL)


def test_regularization_psnr_ordering(test_data_dir):
    """PSNR(BTV) > PSNR(TV) > PSNR(unregularized) on the noisy 3x problem
    (``test_map_solver.cpp:369-481``)."""
    image = cv2.imread(f"{test_data_dir}/fb.png", cv2.IMREAD_COLOR)
    ground_truth = cv2.resize(
        image.astype(np.float64) / 255.0, (27, 27), interpolation=cv2.INTER_NEAREST
    )
    gt = np.moveaxis(ground_truth, -1, 0)  # [3, 27, 27]

    scale = 3
    seq = MotionShiftSequence(
        [
            MotionShift(0, 0),
            MotionShift(0, 2),
            MotionShift(1, 0),
            MotionShift(1, 2),
            MotionShift(2, 0),
        ]
    )
    params = ImageModelParameters(
        scale=scale, blur_radius=3, blur_sigma=3.0, motion_sequence=seq
    )
    model = ImageModel.create(params)
    noisy_params = ImageModelParameters(
        scale=scale, blur_radius=3, blur_sigma=3.0, motion_sequence=seq,
        noise_sigma=10.0, noise_seed=3,
    )
    noisy_model = ImageModel.create(noisy_params)

    low_res_images = [np.asarray(noisy_model.apply(gt, k)) for k in range(5)]
    initial = np.asarray(linear_resize(jnp.asarray(low_res_images[0]), (27, 27)))

    def run(regularizer=None, lam=0.0):
        solver = IRLSMapSolver(IRLSMapSolverOptions(), model, low_res_images)
        if regularizer is not None:
            solver.add_regularizer(regularizer, lam)
        return np.asarray(solver.solve(initial))

    result_none = run()
    result_tv = run(TotalVariationRegularizer(), 0.01)
    result_btv = run(BilateralTotalVariationRegularizer(3, 0.5), 0.01)

    ev = PeakSignalToNoiseRatioEvaluator(gt)
    psnr_none = ev.evaluate(result_none)
    psnr_tv = ev.evaluate(result_tv)
    psnr_btv = ev.evaluate(result_btv)
    assert psnr_tv > psnr_none, (psnr_tv, psnr_none)
    assert psnr_btv > psnr_tv, (psnr_btv, psnr_tv)


def test_data_term_gradient_vs_autodiff():
    """Analytic gradient == jax.grad for integer shifts (true adjoint)."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((2, 8, 8)))
    obs = jnp.asarray(rng.random((3, 2, 4, 4)))
    shifts = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [-1.0, 2.0]])
    from super_resolution_tpu.ops.blur import gaussian_kernel_2d

    kernel = jnp.asarray(gaussian_kernel_2d(3, 1.0))
    import jax

    cost, grad = data_term_cost_and_grad(x, obs, shifts, kernel, 2, max_shift=4)
    cost2, grad_auto = jax.value_and_grad(
        lambda z: data_term_cost(z, obs, shifts, kernel, 2, max_shift=4)
    )(x)
    assert abs(float(cost) - float(cost2)) < 1e-10
    assert matrices_equal(np.asarray(grad), np.asarray(grad_auto), 1e-9)


def test_data_term_gradient_vs_finite_differences():
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.random((1, 6, 6)))
    obs = jnp.asarray(rng.random((2, 1, 3, 3)))
    shifts = jnp.asarray([[0.0, 0.0], [1.0, 1.0]])

    def cost_fn(z):
        return data_term_cost(z, obs, shifts, None, 2, max_shift=3)

    _, grad = data_term_cost_and_grad(x, obs, shifts, None, 2, max_shift=3)
    fd = finite_difference_grad(cost_fn, x, 1e-6)
    assert matrices_equal(np.asarray(grad), np.asarray(fd), 1e-4)


def test_full_objective_gradient_with_regularizer_vs_finite_differences():
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.random((1, 6, 6)))
    obs = jnp.asarray(rng.random((2, 1, 3, 3)))
    shifts = jnp.asarray([[0.0, 0.0], [1.0, 1.0]])
    tv = TotalVariationRegularizer()
    weights = (jnp.asarray(rng.random((1, 6, 6)) + 0.5),)
    vg = make_map_value_and_grad(obs, shifts, None, 2, [(tv, 0.1)], max_shift=3)

    def cost_fn(z):
        c, _ = vg(z, weights)
        return c

    cost, grad = vg(x, weights)
    fd = finite_difference_grad(cost_fn, x, 1e-6)
    assert matrices_equal(np.asarray(grad), np.asarray(fd), 1e-4)


def test_autodiff_mode_solves_small_data():
    low_res_images, model, ground_truth = _small_data_problem()
    opts = IRLSMapSolverOptions(diff_mode="autodiff")
    solver = IRLSMapSolver(opts, model, low_res_images)
    result = solver.solve(np.zeros((1, 4, 4)))
    assert matrices_equal(np.asarray(result)[0], ground_truth, SOLVER_TOL)


def test_real_big_image_exact_recovery(test_data_dir):
    """``RealBigImageTest`` (``test_map_solver.cpp:312-364``): 840x840 RGB
    goat, 4 frames at the four half-pixel phases, 2x, NO blur — exact
    inverse-crime recovery of all 2.1M parameters within 0.001, 1px border
    cropped, per channel. The one large-scale correctness point in the
    reference's test matrix."""
    image = cv2.imread(f"{test_data_dir}/goat.jpg", cv2.IMREAD_COLOR)
    assert image is not None
    resized = cv2.resize(image, (840, 840), interpolation=cv2.INTER_LINEAR)
    ground_truth = np.moveaxis(resized.astype(np.float64) / 255.0, -1, 0)

    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(1, 0), MotionShift(0, 1), MotionShift(1, 1)]
    )
    model = ImageModel.create(ImageModelParameters(scale=2, motion_sequence=seq))
    low_res_images = [model.apply(jnp.asarray(ground_truth), k) for k in range(4)]

    initial_estimate = linear_resize(
        jnp.asarray(low_res_images[0]), (840, 840)
    )
    solver = IRLSMapSolver(IRLSMapSolverOptions(), model, low_res_images)
    result = np.asarray(solver.solve(initial_estimate))

    assert result.shape == ground_truth.shape
    for channel in range(3):
        assert matrices_equal_cropped_border(
            result[channel], ground_truth[channel], 1, SOLVER_TOL
        )


def test_small_data_linear_cg():
    """Exact-step CG lands on the same exact recovery as the reference-path
    Wolfe CG (the inner IRLS subproblem is (piecewise-)quadratic — see
    solvers/least_squares.py _minimize_linear_cg)."""
    low_res_images, model, ground_truth = _small_data_problem()
    opts = IRLSMapSolverOptions(least_squares_solver="linear_cg")
    solver = IRLSMapSolver(opts, model, low_res_images)
    result = solver.solve(np.zeros((1, 4, 4)))
    assert matrices_equal(np.asarray(result)[0], ground_truth, SOLVER_TOL)


def test_real_icon_linear_cg_matches_wolfe_cg(test_data_dir):
    """Convergence-point parity with the default Wolfe-CG on the pseudo-
    inverse oracle geometry, WITH a TV regularizer (piecewise-quadratic
    inner objective — the harder case for the extrapolated gradients), and
    strictly fewer objective evaluations."""
    image = cv2.imread(f"{test_data_dir}/fb.png", cv2.IMREAD_GRAYSCALE)
    ground_truth = image.astype(np.float64) / 255.0
    h, w = ground_truth.shape
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(1, 0), MotionShift(0, 1), MotionShift(1, 1)]
    )
    model = ImageModel.create(ImageModelParameters(scale=2, motion_sequence=seq))
    low_res_images = [np.asarray(model.apply(ground_truth[None], k)) for k in range(4)]
    initial = np.asarray(linear_resize(jnp.asarray(low_res_images[0]), (h, w)))

    results = {}
    epi = {}
    for method in ("cg", "linear_cg"):
        opts = IRLSMapSolverOptions(
            least_squares_solver=method, max_num_irls_iterations=3
        )
        solver = IRLSMapSolver(opts, model, low_res_images)
        solver.add_regularizer(TotalVariationRegularizer(), 0.001)
        results[method] = np.asarray(solver.solve(initial))[0]
        its = sum(c[1] for c in solver.last_inner_calls)
        evs = sum(c[2] for c in solver.last_inner_calls)
        epi[method] = evs / max(its, 1)
    assert matrices_equal_cropped_border(
        results["linear_cg"], results["cg"], 1, SOLVER_TOL
    )
    # The whole point: one evaluation per iteration (+1 initial per inner
    # call) vs the Wolfe search's bracketing evaluations. Total evals can
    # still favor cg when adaptive thresholds stop its inner solves earlier.
    assert epi["linear_cg"] < epi["cg"]
    assert epi["linear_cg"] < 1.35


def test_numerical_diff_mode_solves_small_data():
    """diff_mode='numerical' is the reference's user-selectable
    --use_numerical_differentiation end to end (map_solver.h:64-69):
    central-difference gradients drive the same exact recovery on the tiny
    problem (the only scale it is feasible at — there and here)."""
    low_res_images, model, ground_truth = _small_data_problem()
    opts = IRLSMapSolverOptions(diff_mode="numerical")
    solver = IRLSMapSolver(opts, model, low_res_images)
    result = solver.solve(np.zeros((1, 4, 4)))
    assert matrices_equal(np.asarray(result)[0], ground_truth, SOLVER_TOL)
