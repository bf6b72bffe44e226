"""Spatially tiled (halo-exchange) objective tests: tiled == global, and a
full tiled solve matches a single-device solve."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec

from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShift, MotionShiftSequence
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.parallel import COL_AXIS, FRAME_AXIS, ROW_AXIS, make_mesh
from super_resolution_tpu.parallel.halo import (
    halo_gather,
    halo_scatter_sum,
    make_tiled_map_value_and_grad,
    required_halo,
)
from super_resolution_tpu.solvers import make_map_value_and_grad, minimize
from super_resolution_tpu.utils.testing import matrices_equal

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh_2x4():
    return make_mesh({ROW_AXIS: 2, COL_AXIS: 4})


def test_halo_gather_scatter_adjoint():
    """<gather(x), y> == <x, scatter(y)> — exact adjointness."""
    mesh = _mesh_2x4()
    rng = np.random.default_rng(61)
    x = jnp.asarray(rng.normal(size=(2, 16, 32)))
    y = jnp.asarray(rng.normal(size=(2, 16 + 4, 32 + 2)))  # local padded shape? no:

    halo = 1
    n_row, n_col = 2, 4

    def gather_fn(x_local):
        return halo_gather(x_local, halo, n_row, n_col)

    def scatter_fn(g_local):
        return halo_scatter_sum(g_local, halo, n_row, n_col)

    spec = PartitionSpec(None, ROW_AXIS, COL_AXIS)
    gathered = jax.shard_map(
        gather_fn, mesh=mesh, in_specs=spec, out_specs=spec
    )(x)
    # gathered has local shape (2, 8+2, 8+2) per tile -> global (2, 20, 40).
    rng2 = np.random.default_rng(62)
    g = jnp.asarray(rng2.normal(size=gathered.shape))
    scattered = jax.shard_map(
        scatter_fn, mesh=mesh, in_specs=spec, out_specs=spec
    )(g)
    lhs = float(jnp.vdot(gathered.reshape(-1), g.reshape(-1)))
    rhs = float(jnp.vdot(x.reshape(-1), scattered.reshape(-1)))
    assert abs(lhs - rhs) < 1e-9


def _problem(c=1, hw=(24, 32), seed=63, k=4):
    rng = np.random.default_rng(seed)
    hr = jnp.asarray(rng.random((c, *hw)))
    seq = MotionShiftSequence(
        [MotionShift(0, 0), MotionShift(1, 1), MotionShift(-1, 0), MotionShift(0.5, -0.5)][:k]
    )
    model = ImageModel.create(
        ImageModelParameters(scale=2, blur_radius=3, blur_sigma=1.0, motion_sequence=seq)
    )
    obs = jnp.stack([model.apply(hr, i) for i in range(k)])
    shifts = jnp.asarray(seq.as_array())
    kernel = jnp.asarray(model.blur_operator.kernel)
    return hr, obs, shifts, kernel


def test_tiled_value_and_grad_matches_global():
    hr, obs, shifts, kernel = _problem()
    mesh = _mesh_2x4()
    x = hr  # any HR point
    weights = jnp.ones_like(x)

    vg_global = make_map_value_and_grad(
        obs, shifts, kernel, 2, [(TotalVariationRegularizer(), 0.01)], max_shift=3
    )
    cost_ref, grad_ref = vg_global(x, (weights,))

    vg_tiled = make_tiled_map_value_and_grad(mesh, kernel, 2, tv_lambda=0.01, max_shift=3)
    x_s = jax.device_put(x, NamedSharding(mesh, PartitionSpec(None, ROW_AXIS, COL_AXIS)))
    obs_s = jax.device_put(
        obs, NamedSharding(mesh, PartitionSpec(None, None, ROW_AXIS, COL_AXIS))
    )
    cost_tiled, grad_tiled = jax.jit(vg_tiled)(x_s, obs_s, shifts, weights)

    assert abs(float(cost_tiled) - float(cost_ref)) < 1e-9 * max(1.0, abs(float(cost_ref)))
    assert matrices_equal(np.asarray(grad_tiled), np.asarray(grad_ref), 1e-9)


def test_tiled_value_and_grad_no_blur_no_tv():
    hr, obs, shifts, _ = _problem(c=2, hw=(16, 16), seed=64)
    # Rebuild observations without blur.
    seq = MotionShiftSequence([MotionShift(0, 0), MotionShift(1, 1), MotionShift(-1, 0), MotionShift(0.5, -0.5)])
    model = ImageModel.create(ImageModelParameters(scale=2, motion_sequence=seq))
    obs = jnp.stack([model.apply(hr, i) for i in range(4)])
    mesh = make_mesh({ROW_AXIS: 4, COL_AXIS: 2})
    vg_global = make_map_value_and_grad(obs, shifts, None, 2, max_shift=3)
    cost_ref, grad_ref = vg_global(hr, ())
    vg_tiled = make_tiled_map_value_and_grad(mesh, None, 2, max_shift=3)
    cost_tiled, grad_tiled = jax.jit(vg_tiled)(hr, obs, shifts)
    assert abs(float(cost_tiled) - float(cost_ref)) < 1e-9
    assert matrices_equal(np.asarray(grad_tiled), np.asarray(grad_ref), 1e-9)


def test_tiled_solve_matches_single_device():
    """Full CG solve through the tiled objective == untiled solve."""
    hr, obs, shifts, kernel = _problem(hw=(16, 32), seed=65)
    mesh = _mesh_2x4()
    x0 = jnp.zeros_like(hr)
    weights = jnp.ones_like(hr)

    vg_global = make_map_value_and_grad(
        obs, shifts, kernel, 2, [(TotalVariationRegularizer(), 0.005)], max_shift=3
    )
    ref = minimize(lambda x: vg_global(x, (weights,)), x0, max_iterations=25)

    vg_tiled = make_tiled_map_value_and_grad(mesh, kernel, 2, tv_lambda=0.005, max_shift=3)
    x0_s = jax.device_put(x0, NamedSharding(mesh, PartitionSpec(None, ROW_AXIS, COL_AXIS)))
    obs_s = jax.device_put(
        obs, NamedSharding(mesh, PartitionSpec(None, None, ROW_AXIS, COL_AXIS))
    )

    @jax.jit
    def solve(x0, obs, shifts, weights):
        return minimize(
            lambda x: vg_tiled(x, obs, shifts, weights), x0, max_iterations=25
        )

    out = solve(x0_s, obs_s, shifts, weights)
    assert matrices_equal(np.asarray(out.x), np.asarray(ref.x), 1e-8)
    assert abs(float(out.cost) - float(ref.cost)) < 1e-8


def test_tiled_btv_matches_global():
    """Tiled BTV (coordinate-aware masks) == the single-device BTV objective,
    including the inclusive/exclusive window asymmetry and the image-origin
    source skip (btv_regularizer.cpp:30,114,139)."""
    from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer

    hr, obs, shifts, kernel = _problem(c=2, hw=(24, 32), seed=66)
    mesh = _mesh_2x4()
    rng = np.random.default_rng(67)
    weights = jnp.asarray(rng.random(hr.shape))
    regs = [(BilateralTotalVariationRegularizer(2, 0.7), 0.01)]

    vg_global = make_map_value_and_grad(obs, shifts, kernel, 2, regs, max_shift=3)
    cost_ref, grad_ref = vg_global(hr, (weights,))

    vg_tiled = make_tiled_map_value_and_grad(
        mesh, kernel, 2, max_shift=3, regularizers=regs,
        image_shape=(hr.shape[-2], hr.shape[-1]),
    )
    x_s = jax.device_put(hr, NamedSharding(mesh, PartitionSpec(None, ROW_AXIS, COL_AXIS)))
    obs_s = jax.device_put(
        obs, NamedSharding(mesh, PartitionSpec(None, None, ROW_AXIS, COL_AXIS))
    )
    cost_tiled, grad_tiled = jax.jit(vg_tiled)(x_s, obs_s, shifts, weights)

    assert abs(float(cost_tiled) - float(cost_ref)) < 1e-9 * max(1.0, abs(float(cost_ref)))
    assert matrices_equal(np.asarray(grad_tiled), np.asarray(grad_ref), 1e-9)


def test_tiled_row_only_mesh():
    """A row-only mesh (no col axis) tiles rows and pads cols locally."""
    hr, obs, shifts, kernel = _problem(hw=(32, 16), seed=68)
    # 2 row tiles of 16 rows each: the stencil halo (7 = ceil(3)+1+k//2)
    # must fit inside a tile for the single-hop exchange.
    mesh = make_mesh({ROW_AXIS: 2}, devices=jax.devices()[:2])
    weights = jnp.ones_like(hr)
    vg_global = make_map_value_and_grad(
        obs, shifts, kernel, 2, [(TotalVariationRegularizer(), 0.01)], max_shift=3
    )
    cost_ref, grad_ref = vg_global(hr, (weights,))
    vg_tiled = make_tiled_map_value_and_grad(mesh, kernel, 2, tv_lambda=0.01, max_shift=3)
    x_s = jax.device_put(hr, NamedSharding(mesh, PartitionSpec(None, ROW_AXIS)))
    obs_s = jax.device_put(
        obs, NamedSharding(mesh, PartitionSpec(None, None, ROW_AXIS))
    )
    cost_tiled, grad_tiled = jax.jit(vg_tiled)(x_s, obs_s, shifts, weights)
    assert abs(float(cost_tiled) - float(cost_ref)) < 1e-9 * max(1.0, abs(float(cost_ref)))
    assert matrices_equal(np.asarray(grad_tiled), np.asarray(grad_ref), 1e-9)
