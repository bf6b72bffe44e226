"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShift, MotionShiftSequence
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.parallel import (
    BAND_AXIS,
    FRAME_AXIS,
    band_split_minimize,
    make_mesh,
    make_sharded_map_solver,
    shard_problem,
)
from super_resolution_tpu.solvers import make_map_value_and_grad, minimize
from super_resolution_tpu.utils.testing import matrices_equal

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _problem(c=2, seed=31):
    rng = np.random.default_rng(seed)
    hr = jnp.asarray(rng.random((c, 16, 16)))
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(-1, 0), MotionShift(0, -1), MotionShift(-1, -1)]
        * 2
    )
    model = ImageModel.create(
        ImageModelParameters(scale=2, blur_radius=3, blur_sigma=1.0, motion_sequence=seq)
    )
    obs = jnp.stack([model.apply(hr, k) for k in range(8)])
    shifts = jnp.asarray(seq.as_array())
    kernel = jnp.asarray(model.blur_operator.kernel)
    return hr, obs, shifts, kernel


def test_frame_sharded_solve_matches_single_device():
    hr, obs, shifts, kernel = _problem()
    x0 = jnp.zeros_like(hr)
    tv = TotalVariationRegularizer()
    regs = [(tv, 0.001)]
    weights = (jnp.ones_like(hr),)

    # Single-device reference result.
    vg = make_map_value_and_grad(obs, shifts, kernel, 2, regs, max_shift=4)
    ref = minimize(lambda x: vg(x, weights), x0, max_iterations=30)

    # 8-way frame-sharded result.
    mesh = make_mesh({FRAME_AXIS: 8})
    xs, obs_s, shifts_s = shard_problem(mesh, x0, obs, shifts)
    solve = make_sharded_map_solver(mesh, kernel, 2, regs, max_shift=4, max_iterations=30)
    out = solve(xs, obs_s, shifts_s, weights)

    assert matrices_equal(np.asarray(out.x), np.asarray(ref.x), 1e-8)
    assert abs(float(out.cost) - float(ref.cost)) < 1e-8


def test_frame_band_2d_mesh():
    hr, obs, shifts, kernel = _problem(c=2)
    x0 = jnp.zeros_like(hr)
    mesh = make_mesh({FRAME_AXIS: 4, BAND_AXIS: 2})
    xs, obs_s, shifts_s = shard_problem(mesh, x0, obs, shifts)
    solve = make_sharded_map_solver(mesh, kernel, 2, max_shift=4, max_iterations=20)
    out = solve(xs, obs_s, shifts_s, ())

    vg = make_map_value_and_grad(obs, shifts, kernel, 2, max_shift=4)
    ref = minimize(lambda x: vg(x, ()), x0, max_iterations=20)
    assert matrices_equal(np.asarray(out.x), np.asarray(ref.x), 1e-8)


def test_band_split_minimize_matches_serial_split():
    hr, obs, shifts, kernel = _problem(c=4)
    x0 = jnp.zeros_like(hr)

    # Serial per-channel solves (split_channels reference semantics).
    serial = []
    for c in range(4):
        vg = make_map_value_and_grad(obs[:, c : c + 1], shifts, kernel, 2, max_shift=4)
        res = minimize(lambda x: vg(x, ()), x0[c : c + 1], max_iterations=25)
        serial.append(np.asarray(res.x)[0])

    # vmapped band solve.
    def vg_band_factory():
        def per_band(xc):
            # xc: [1, H, W]; needs the matching single-channel observations —
            # closure over index is not possible under vmap, so solve with the
            # channel picked by broadcasting: handled below instead.
            raise NotImplementedError

        return per_band

    # Build a per-band objective via vmap over (x_band, obs_band) pairs.
    def solve_band(xc, obs_c):
        vg = make_map_value_and_grad(obs_c, shifts, kernel, 2, max_shift=4)
        return minimize(lambda x: vg(x, ()), xc[None], max_iterations=25)

    results = jax.vmap(solve_band)(x0, jnp.swapaxes(obs, 0, 1)[:, :, None])
    stacked = np.asarray(results.x)[:, 0]
    for c in range(4):
        assert matrices_equal(stacked[c], serial[c], 1e-9)


def test_mesh_construction_errors():
    with pytest.raises(ValueError):
        make_mesh({FRAME_AXIS: 3})  # 8 devices not divisible
    mesh = make_mesh({FRAME_AXIS: -1, BAND_AXIS: 2})
    assert mesh.shape[FRAME_AXIS] == 4
