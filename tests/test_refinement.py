"""Joint motion refinement (motion/refinement.py): Gauss-Newton recovery of
motion error against the HR estimate, and the IRLS-seam integration.

The reference has no counterpart — it registers once from the LR frames
(``registration.cpp:161-201``) and carries the error through every solve.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from super_resolution_tpu.evaluation import psnr
from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.models.image_model import degrade
from super_resolution_tpu.motion import MotionShift, MotionShiftSequence
from super_resolution_tpu.motion.refinement import refine_shifts
from super_resolution_tpu.ops.blur import gaussian_kernel_2d
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.solvers import IRLSMapSolver, IRLSMapSolverOptions


def _textured_image(h, w, seed=5):
    """Band-limited random texture: smooth enough for bilinear-warp physics,
    textured enough that the data term constrains subpixel motion."""
    rng = np.random.default_rng(seed)
    base = rng.random((h, w))
    k = np.asarray(gaussian_kernel_2d(3, 1.0))
    # Symmetric-boundary smoothing via the repo's own correlate2d (kernel is
    # symmetric, so correlation == convolution): pad reflectively, run the
    # 'SAME' zero-padded correlation, crop the interior back out.
    from super_resolution_tpu.ops.blur import correlate2d

    p = k.shape[0] // 2
    padded = np.pad(base, p, mode="symmetric")
    sm = np.asarray(correlate2d(jnp.asarray(padded), jnp.asarray(k)))[p:-p, p:-p]
    sm = (sm - sm.min()) / (sm.max() - sm.min())
    return jnp.asarray(sm[None])


TRUE = [(0, 0), (1.25, 0.5), (-0.75, 1.5), (0.5, -1.25)]
# The integration tests use K=6 frames at s=2 (K > s^2): an OVERDETERMINED
# stack, where the converged residuals still expose shift error — the
# regime where alternating solve/refine contracts fast (~4x on the first
# round). At K == s^2 the data term is exactly determined and x absorbs
# most of the shift error (contraction ~0.65/round; see
# experiments/tpu_refine_loo.py for the production-geometry numbers).
TRUE6 = TRUE + [(0.3, 0.9), (-1.1, -0.4)]


def _problem(scale=2, h=32, w=32, shifts=TRUE):
    x = _textured_image(h, w)
    kernel = jnp.asarray(gaussian_kernel_2d(3, 1.0))
    obs = jnp.stack(
        [degrade(x, float(dx), float(dy), kernel, scale) for dx, dy in shifts]
    )
    return x, kernel, obs


def test_gauss_newton_recovers_perturbed_shifts():
    x, kernel, obs = _problem()
    rng = np.random.default_rng(11)
    pert = np.asarray(TRUE) + np.where(
        np.arange(4)[:, None] == 0, 0.0, rng.uniform(-0.12, 0.12, (4, 2))
    )
    refined = np.asarray(
        refine_shifts(x, obs, jnp.asarray(pert), kernel, 2, num_iterations=3)
    )
    start_err = np.max(np.abs(pert - np.asarray(TRUE)))
    end_err = np.max(np.abs(refined - np.asarray(TRUE)))
    assert start_err > 0.05
    assert end_err < 0.01, (start_err, end_err)
    # Frame 0 stays pinned (gauge anchor).
    assert np.array_equal(refined[0], pert[0])


def test_refiner_is_damped_on_flat_frames():
    """Uniform frames carry no motion information; the damped normal
    equations must not produce NaNs or wild steps."""
    x = jnp.ones((1, 16, 16))
    obs = jnp.ones((2, 1, 8, 8))
    shifts = jnp.asarray([[0.0, 0.0], [0.3, -0.2]])
    refined = np.asarray(refine_shifts(x, obs, shifts, None, 2))
    assert np.all(np.isfinite(refined))
    assert np.max(np.abs(refined - np.asarray(shifts))) <= 0.5 * 2 + 1e-9


class TestSolverIntegration:
    def _solve(self, est_shifts, refine, scale=2, irls_iters=6, fused=False,
               mesh=None):
        x, kernel, obs = _problem(scale=scale, shifts=TRUE6)
        seq = MotionShiftSequence([MotionShift(dx, dy) for dx, dy in est_shifts])
        model = ImageModel.create(
            ImageModelParameters(
                scale=scale, blur_radius=3, blur_sigma=1.0, motion_sequence=seq
            )
        )
        opts = IRLSMapSolverOptions(
            max_num_irls_iterations=irls_iters,
            max_num_solver_iterations=15,
            # Fixed outer budget: the refined and plain runs must spend the
            # same iterations for the PSNR comparison to be apples-to-apples.
            irls_cost_difference_threshold=0.0,
            refine_motion_every=1 if refine else 0,
            fused_irls=fused,
        )
        solver = IRLSMapSolver(opts, model, [np.asarray(o) for o in obs],
                               mesh=mesh)
        solver.add_regularizer(TotalVariationRegularizer(), 1e-4)
        out = np.asarray(solver.solve(jnp.zeros_like(x)))
        return x, out, np.asarray(solver.shifts)

    def _perturbed(self, seed=21, mag=0.12):
        rng = np.random.default_rng(seed)
        k = len(TRUE6)
        return np.asarray(TRUE6) + np.where(
            np.arange(k)[:, None] == 0, 0.0, rng.uniform(-mag, mag, (k, 2))
        )

    def test_refinement_improves_estimated_motion_solve(self):
        """With ~0.12 px motion error in, the refined solve must (a) recover
        the true shifts to ~0.01 px and (b) decisively beat the unrefined
        solve's PSNR (the unrefined warm-started solve CONVERGES ONTO the
        wrong-motion MAP solution — measured ~19 dB vs ~39 refined)."""
        pert = self._perturbed()
        x, out_plain, shifts_plain = self._solve(pert, refine=False)
        _, out_ref, shifts_ref = self._solve(pert, refine=True)
        err_plain = np.max(np.abs(shifts_plain - np.asarray(TRUE6)))
        err_ref = np.max(np.abs(shifts_ref - np.asarray(TRUE6)))
        assert np.allclose(shifts_plain, pert)  # untouched without refinement
        assert err_ref < 0.012, (err_plain, err_ref)
        p_plain = float(psnr(out_plain, np.asarray(x)))
        p_ref = float(psnr(out_ref, np.asarray(x)))
        assert p_ref > p_plain + 10.0, (p_plain, p_ref)

    def test_refined_solve_approaches_known_motion_solve(self):
        """The refined estimated-motion solve closes most of the gap to the
        known-true-motion solve at the same iteration budget (measured:
        refined ~39.2 dB vs true ~41.1 vs plain ~20 — >90% of the gap in
        dB; the production-geometry ladder is benched on the chip,
        bench_map_btv_estimated)."""
        pert = self._perturbed(seed=22, mag=0.1)
        x, out_true, _ = self._solve(np.asarray(TRUE6), refine=False)
        _, out_plain, _ = self._solve(pert, refine=False)
        _, out_ref, _ = self._solve(pert, refine=True)
        p_true = float(psnr(out_true, np.asarray(x)))
        p_plain = float(psnr(out_plain, np.asarray(x)))
        p_ref = float(psnr(out_ref, np.asarray(x)))
        assert p_ref > p_true - 2.5, (p_plain, p_ref, p_true)
        closed = (p_ref - p_plain) / max(p_true - p_plain, 1e-9)
        assert closed > 0.85, (p_plain, p_ref, p_true, closed)

    def test_option_validation(self):
        x, kernel, obs = _problem()
        seq = MotionShiftSequence([MotionShift(dx, dy) for dx, dy in TRUE])
        model = ImageModel.create(
            ImageModelParameters(
                scale=2, blur_radius=3, blur_sigma=1.0, motion_sequence=seq
            )
        )

        def build(**kw):
            opts = IRLSMapSolverOptions(refine_motion_every=1, **kw)
            return IRLSMapSolver(opts, model, [np.asarray(o) for o in obs])

        with pytest.raises(ValueError, match="runtime data"):
            build(use_pallas_data_term=True, pallas_shift_bound=0.0).solve(
                jnp.zeros_like(x)
            )
        with pytest.raises(ValueError, match="use_static_shifts"):
            build(use_static_shifts=True).solve(jnp.zeros_like(x))
        # Non-frame meshes stay rejected (band/spatial placements bake or
        # tile the shifts); pure frame meshes are supported since round 5.
        import jax as _jax

        from super_resolution_tpu.parallel import ROW_AXIS, make_mesh

        row_mesh = make_mesh({ROW_AXIS: 2}, _jax.devices()[:2])
        with pytest.raises(ValueError, match="pure frame mesh"):
            IRLSMapSolver(
                IRLSMapSolverOptions(refine_motion_every=1), model,
                [np.asarray(o) for o in obs], mesh=row_mesh,
            ).solve(jnp.zeros_like(x))

    def test_fused_irls_refinement_matches_host_loop(self):
        """The refinement folded into the fused lax.while_loop runs the same
        alternating scheme as the host loop — same inner solves, same
        Gauss-Newton rounds, same cap-skip — so the two land together."""
        pert = self._perturbed(seed=23, mag=0.1)
        x, out_host, shifts_host = self._solve(pert, refine=True, irls_iters=4)
        _, out_fused, shifts_fused = self._solve(
            pert, refine=True, irls_iters=4, fused=True
        )
        np.testing.assert_allclose(shifts_fused, shifts_host, atol=1e-8)
        np.testing.assert_allclose(out_fused, out_host, atol=1e-6)

    def test_frame_mesh_refinement_matches_single_device(self):
        """refine_motion_every > 0 on a pure frame mesh (host loop): GSPMD
        shards the per-frame Gauss-Newton over the frame axis and the solve
        matches the single-device refined solve."""
        import jax as _jax

        from super_resolution_tpu.parallel import FRAME_AXIS, make_mesh

        pert = self._perturbed(seed=24, mag=0.1)
        x, out_single, shifts_single = self._solve(
            pert, refine=True, irls_iters=4
        )
        mesh = make_mesh({FRAME_AXIS: 2}, _jax.devices()[:2])
        _, out_mesh, shifts_mesh = self._solve(
            pert, refine=True, irls_iters=4, mesh=mesh
        )
        np.testing.assert_allclose(shifts_mesh, shifts_single, atol=1e-7)
        np.testing.assert_allclose(out_mesh, out_single, atol=1e-6)

    def test_auto_routing_selects_shift_generic_kernel(self):
        """refine_motion_every>0 + Pallas AUTO -> the shift-generic kernel
        (runtime shifts), even for integer starting shifts."""
        from super_resolution_tpu.solvers.irls import resolve_auto_options

        opts = IRLSMapSolverOptions(refine_motion_every=1)
        resolved = resolve_auto_options(
            opts, backend="tpu", shifts=np.asarray([[0.0, 0.0], [1.0, 1.0]])
        )
        assert resolved.use_pallas_data_term
        assert resolved.pallas_shift_bound > 0.0


def test_refine_every_two_does_not_exit_before_first_refinement():
    """Regression (round-4 review): with refine_motion_every > 1 and an IRLS
    cost that converges immediately, the loop must keep going until a
    refinement round has RUN and settled — not exit with the requested
    refinement never executed."""
    x, kernel, obs = _problem(shifts=TRUE6)
    rng = np.random.default_rng(31)
    pert = np.asarray(TRUE6) + np.where(
        np.arange(len(TRUE6))[:, None] == 0, 0.0,
        rng.uniform(-0.1, 0.1, (len(TRUE6), 2)),
    )
    seq = MotionShiftSequence([MotionShift(dx, dy) for dx, dy in pert])
    model = ImageModel.create(
        ImageModelParameters(scale=2, blur_radius=3, blur_sigma=1.0,
                             motion_sequence=seq)
    )
    opts = IRLSMapSolverOptions(
        max_num_irls_iterations=6, max_num_solver_iterations=25,
        # A huge threshold: cost "converges" on iteration 1, before the
        # first refinement (due at iteration 2) — the buggy gate exited here.
        irls_cost_difference_threshold=1e12,
        refine_motion_every=2,
    )
    solver = IRLSMapSolver(opts, model, [np.asarray(o) for o in obs])
    solver.add_regularizer(TotalVariationRegularizer(), 1e-4)
    solver.solve(jnp.zeros_like(x))
    moved = np.max(np.abs(np.asarray(solver.shifts) - pert))
    assert moved > 1e-3, "refinement never ran before the loop exited"
