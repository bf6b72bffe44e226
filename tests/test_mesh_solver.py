"""Frame-sharded IRLSMapSolver (mesh=...) quality parity with single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from super_resolution_tpu.evaluation import psnr
from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShift, MotionShiftSequence
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.parallel import FRAME_AXIS, make_mesh
from super_resolution_tpu.solvers import IRLSMapSolver, IRLSMapSolverOptions

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_irls_solver_quality_parity():
    rng = np.random.default_rng(1)
    hr = jnp.asarray(rng.random((1, 16, 16)))
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(1, 1), MotionShift(-1, 0), MotionShift(0, -1)] * 2
    )
    model = ImageModel.create(
        ImageModelParameters(scale=2, blur_radius=3, blur_sigma=1.0, motion_sequence=seq)
    )
    obs = [np.asarray(model.apply(hr, k)) for k in range(8)]
    mesh = make_mesh({FRAME_AXIS: 8})
    results = {}
    for label, m in (("single", None), ("sharded", mesh)):
        solver = IRLSMapSolver(IRLSMapSolverOptions(), model, obs, mesh=m)
        solver.add_regularizer(TotalVariationRegularizer(), 0.001)
        results[label] = np.asarray(solver.solve(np.zeros((1, 16, 16))))
    p_single = float(psnr(results["single"], np.asarray(hr)))
    p_sharded = float(psnr(results["sharded"], np.asarray(hr)))
    # IRLS reweighting (w = 1/max(1e-5, r)) chaotically amplifies f64
    # reduction-order noise across outer iterations; parity is judged at the
    # quality level (same bar as the C++ reference comparison).
    assert abs(p_single - p_sharded) < 0.1, (p_single, p_sharded)
