"""Production-path routing: AUTO option resolution, mesh-fallback warnings,
the LRU executable cache, and the registration unit convention.

The reference's binary IS its production solver (one code path,
``super_resolution.cpp:126-199``); these tests pin the rules that make the
same true here — a default-options solve on a TPU backend must route through
the fused Pallas kernel, estimated (fractional) motion must select the
shift-generic kernel, and any mesh fallback must be audible.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShift, MotionShiftSequence
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.solvers import IRLSMapSolver, IRLSMapSolverOptions
from super_resolution_tpu.solvers.irls import resolve_auto_options


INT_SHIFTS = np.array([[0.0, 0.0], [1.0, -2.0]])
FRAC_SHIFTS = np.array([[0.0, 0.0], [0.5, -1.25]])


def test_auto_tpu_integer_shifts_specialized_kernel():
    opts = resolve_auto_options(
        IRLSMapSolverOptions(), backend="tpu", shifts=INT_SHIFTS
    )
    assert opts.use_pallas_data_term is True
    assert opts.pallas_shift_bound == 0.0  # trace-specialized kernel


def test_auto_tpu_fractional_shifts_generic_kernel():
    opts = resolve_auto_options(
        IRLSMapSolverOptions(), backend="tpu", shifts=FRAC_SHIFTS
    )
    assert opts.use_pallas_data_term is True
    # bucket(max|shift|) = bucket(1.25) = 2 (power-of-two buckets, min 2)
    assert opts.pallas_shift_bound == 2.0


def test_auto_tpu_frame_mesh_generic_kernel():
    opts = resolve_auto_options(
        IRLSMapSolverOptions(), backend="tpu", shifts=INT_SHIFTS, frame_mesh=True
    )
    assert opts.pallas_shift_bound == 2.0


def test_auto_cpu_traced_path():
    opts = resolve_auto_options(
        IRLSMapSolverOptions(), backend="cpu", shifts=FRAC_SHIFTS
    )
    assert opts.use_pallas_data_term is False
    assert opts.pallas_shift_bound == 0.0


def test_auto_autodiff_disables_pallas():
    opts = resolve_auto_options(
        IRLSMapSolverOptions(diff_mode="autodiff"), backend="tpu",
        shifts=FRAC_SHIFTS,
    )
    assert opts.use_pallas_data_term is False


def test_explicit_settings_pass_through():
    opts = resolve_auto_options(
        IRLSMapSolverOptions(use_pallas_data_term=False, pallas_shift_bound=8.0),
        backend="tpu", shifts=FRAC_SHIFTS,
    )
    assert opts.use_pallas_data_term is False
    assert opts.pallas_shift_bound == 8.0


def _tiny_problem(shifts=((0, 0), (1, 1), (-1, 0), (0, -1)), scale=2, n=12,
                  channels=1):
    rng = np.random.default_rng(7)
    hr = jnp.asarray(rng.random((channels, n, n)))
    seq = MotionShiftSequence([MotionShift(dx, dy) for dx, dy in shifts])
    model = ImageModel.create(
        ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.0,
                             motion_sequence=seq)
    )
    obs = [model.apply(hr, k) for k in range(len(shifts))]
    return hr, model, obs


def test_solver_records_resolved_options():
    """A default-options solve exposes the resolved routing (CPU here ->
    traced path); forcing Pallas + AUTO bound on fractional motion selects
    the shift-generic kernel end to end."""
    hr, model, obs = _tiny_problem()
    solver = IRLSMapSolver(IRLSMapSolverOptions(max_num_irls_iterations=1),
                           model, obs)
    solver.add_regularizer(TotalVariationRegularizer(), 0.01)
    solver.solve(jnp.zeros_like(hr))
    assert solver.last_resolved_options.use_pallas_data_term is False
    assert solver.last_inner_iterations > 0

    hr2, model2, obs2 = _tiny_problem(shifts=((0, 0), (0.5, -0.75)))
    solver2 = IRLSMapSolver(
        IRLSMapSolverOptions(max_num_irls_iterations=1,
                             use_pallas_data_term=True, pallas_tile=8),
        model2, obs2,
    )
    solver2.add_regularizer(TotalVariationRegularizer(), 0.01)
    out = solver2.solve(jnp.zeros_like(hr2))
    assert solver2.last_resolved_options.pallas_shift_bound == 2.0
    assert np.isfinite(np.asarray(out)).all()


def test_band_mesh_fallback_warns():
    """A mesh config that misses fused-path eligibility must say so."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    from super_resolution_tpu.parallel import BAND_AXIS, make_mesh

    hr, model, obs = _tiny_problem(channels=2)
    mesh = make_mesh({BAND_AXIS: 2}, jax.devices()[:2])
    solver = IRLSMapSolver(
        IRLSMapSolverOptions(max_num_irls_iterations=1,
                             use_pallas_data_term=True),
        model, obs, mesh=mesh,
    )
    # TWO regularizers -> not kernel-fusable -> fallback warning.
    solver.add_regularizer(TotalVariationRegularizer(), 0.01)
    solver.add_regularizer(TotalVariationRegularizer(use_3d_total_variation=True), 0.01)
    with pytest.warns(RuntimeWarning, match="fused-Pallas"):
        solver.solve(jnp.zeros_like(hr))


def test_built_solver_cache_lru_capped(monkeypatch):
    import super_resolution_tpu.solvers.irls as irls_mod

    irls_mod._BUILT_SOLVER_CACHE.clear()
    monkeypatch.setattr(irls_mod, "_BUILT_SOLVER_CACHE_MAX", 2)
    hr, model, obs = _tiny_problem()
    for iters in (1, 2, 3):
        solver = IRLSMapSolver(
            IRLSMapSolverOptions(max_num_irls_iterations=1,
                                 max_num_solver_iterations=iters),
            model, obs,
        )
        solver.add_regularizer(TotalVariationRegularizer(), 0.01)
        solver.solve(jnp.zeros_like(hr))
    assert len(irls_mod._BUILT_SOLVER_CACHE) == 2
    irls_mod._BUILT_SOLVER_CACHE.clear()


def test_registration_lr_to_hr_scale():
    """Registration sees LR frames -> LR-pixel shifts; the image model warps
    HR pixels. estimated * scale must recover the true HR motion (the CLI
    and video resolver apply this conversion)."""
    import cv2

    from super_resolution_tpu.motion.registration import translational_registration

    gt = cv2.imread("/root/reference/test_data/dallas_half.jpg",
                    cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
    gt = jnp.asarray(gt[None, :192, :192])
    true_hr = [(0.0, 0.0), (2.0, 1.0), (-1.5, 0.5)]
    seq = MotionShiftSequence([MotionShift(dx, dy) for dx, dy in true_hr])
    scale = 2
    model = ImageModel.create(
        ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.0,
                             motion_sequence=seq)
    )
    obs = [model.apply(gt, k) for k in range(3)]
    est = translational_registration(obs)
    for (dx_t, dy_t), sh in zip(true_hr, est):
        assert abs(sh.dx * scale - dx_t) < 0.2, (sh.dx * scale, dx_t)
        assert abs(sh.dy * scale - dy_t) < 0.2, (sh.dy * scale, dy_t)
