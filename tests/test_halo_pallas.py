"""Spatially tiled FUSED-PALLAS objective == the single-device fused path.

Round-3 upgrade of the halo path (VERDICT r2 #4): each (row, col) shard runs
the fused kernel in shard mode (traced origin + global masks + owned-pixel
data mask) on its halo-extended tile. Runs on the virtual 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShiftSequence
from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.parallel import (
    BAND_AXIS,
    COL_AXIS,
    FRAME_AXIS,
    ROW_AXIS,
    make_mesh,
)
from super_resolution_tpu.parallel.halo import make_tiled_pallas_vg
from super_resolution_tpu.solvers import make_map_value_and_grad
from super_resolution_tpu.utils.testing import matrices_equal

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _problem(c=1, hw=(32, 48), scale=2, k=4, seed=81, frac=False):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((c, *hw)), jnp.float64)
    base = [(0, 0), (1, 1), (-1, 0), (0, -1)]
    if frac:
        base = [(0, 0), (1.25, 0.5), (-0.75, 1.0), (0.5, -1.25)]
    seq = MotionShiftSequence(base[:k])
    model = ImageModel.create(
        ImageModelParameters(
            scale=scale, blur_radius=3, blur_sigma=1.0, motion_sequence=seq
        )
    )
    obs = jnp.stack([model.apply(x, kk) for kk in range(k)])
    kernel = model.blur_operator.kernel
    return x, obs, np.asarray(seq.as_array()), kernel


def _regs_for(kind):
    if kind == "tv":
        return [(TotalVariationRegularizer(), 0.01)]
    if kind == "btv":
        return [(BilateralTotalVariationRegularizer(2, 0.6), 0.01)]
    return []


@pytest.mark.parametrize("reg_kind", ["none", "tv", "btv"])
@pytest.mark.parametrize("dynamic", [False, True])
def test_tiled_pallas_vg_matches_single_device(reg_kind, dynamic):
    # Fractional shifts exercise the bilinear warp taps on both paths. The
    # REFERENCE side is always the shift-SPECIALIZED single-device kernel
    # (fractional taps baked at trace time) — so dynamic=True is a
    # cross-path check of the shift-generic tiled kernel against it, and
    # the k=2 frame cut keeps the interpret-mode runtime bounded (the
    # runtime-tap kernel is by far the slowest CPU-interpret path).
    k = 2 if dynamic else 4
    x, obs, shifts_np, kernel = _problem(frac=dynamic, k=k)
    mesh = make_mesh({ROW_AXIS: 2, COL_AXIS: 2}, jax.devices()[:4])
    regs = _regs_for(reg_kind)
    weights = (
        (jnp.asarray(np.random.default_rng(82).random(x.shape), jnp.float64),)
        if regs
        else ()
    )

    vg_single = make_map_value_and_grad(
        obs, jnp.asarray(shifts_np), jnp.asarray(kernel), 2, regs,
        static_shifts=shifts_np, use_pallas=True,
    )
    c_ref, g_ref = vg_single(x, weights)

    vg_tiled = make_tiled_pallas_vg(
        mesh, obs, shifts_np, kernel, 2, regs,
        image_shape=x.shape[-2:], shift_bound=2.0 if dynamic else 0.0,
        pallas_tile=8,
    )
    # prepare() is the production inner-solve path (packed constants).
    c_t, g_t = vg_tiled.prepare(weights)(x)
    assert abs(float(c_t) - float(c_ref)) < 1e-5 * max(1.0, abs(float(c_ref)))
    assert matrices_equal(np.asarray(g_t), np.asarray(g_ref), 1e-8)

    if not dynamic:
        # Unpacked entry point agrees with prepare() exactly.
        c_p, g_p = vg_tiled(x, weights)
        assert abs(float(c_p) - float(c_t)) < 1e-9 * max(1.0, abs(float(c_t)))
        assert matrices_equal(np.asarray(g_p), np.asarray(g_t), 1e-10)

    if not dynamic or reg_kind == "tv":
        # Phase-plane solver state: halo exchanged in plane space (one
        # dynamic combo suffices — the plane plumbing is reg-independent).
        vg_pl = make_tiled_pallas_vg(
            mesh, obs, shifts_np, kernel, 2, regs,
            image_shape=x.shape[-2:], shift_bound=2.0 if dynamic else 0.0,
            pallas_tile=8, phase_io=True,
        )
        c_pp, g_pp = vg_pl.prepare(weights)(vg_pl.to_planes(x))
        assert abs(float(c_pp) - float(c_t)) < 1e-5 * max(1.0, abs(float(c_t)))
        assert matrices_equal(
            np.asarray(vg_pl.from_planes(g_pp)), np.asarray(g_t), 1e-8
        )


def test_tiled_pallas_vg_spatial_x_frame():
    """row x col x frame: per-device shifts as data (shift-generic kernel),
    gradient psum over frame composed with the spatial scatter."""
    x, obs, shifts_np, kernel = _problem(k=4, frac=True)
    mesh = make_mesh({ROW_AXIS: 2, COL_AXIS: 2, FRAME_AXIS: 2},
                     jax.devices()[:8])
    regs = _regs_for("tv")
    weights = (jnp.asarray(np.random.default_rng(83).random(x.shape), jnp.float64),)
    # Reference: the shift-SPECIALIZED single-device kernel on the same
    # fractional shifts (cross-path check; also much faster to interpret).
    vg_single = make_map_value_and_grad(
        obs, jnp.asarray(shifts_np), jnp.asarray(kernel), 2, regs,
        static_shifts=shifts_np, use_pallas=True,
    )
    c_ref, g_ref = vg_single(x, weights)
    vg_tiled = make_tiled_pallas_vg(
        mesh, obs, shifts_np, kernel, 2, regs,
        image_shape=x.shape[-2:], shift_bound=2.0, pallas_tile=8,
    )
    c_t, g_t = vg_tiled.prepare(weights)(x)
    assert abs(float(c_t) - float(c_ref)) < 1e-5 * max(1.0, abs(float(c_ref)))
    assert matrices_equal(np.asarray(g_t), np.asarray(g_ref), 1e-8)


def test_tiled_pallas_vg_spatial_x_band():
    """row x col x band: channels split across the band axis (band-separable
    data term + TV), gradients band-local."""
    x, obs, shifts_np, kernel = _problem(c=2, k=4)
    mesh = make_mesh({ROW_AXIS: 2, COL_AXIS: 2, BAND_AXIS: 2},
                     jax.devices()[:8])
    regs = _regs_for("tv")
    weights = (jnp.asarray(np.random.default_rng(84).random(x.shape), jnp.float64),)
    vg_single = make_map_value_and_grad(
        obs, jnp.asarray(shifts_np), jnp.asarray(kernel), 2, regs,
        static_shifts=shifts_np, use_pallas=True,
    )
    c_ref, g_ref = vg_single(x, weights)
    vg_tiled = make_tiled_pallas_vg(
        mesh, obs, shifts_np, kernel, 2, regs,
        image_shape=x.shape[-2:], pallas_tile=8,
    )
    c_t, g_t = vg_tiled.prepare(weights)(x)
    assert abs(float(c_t) - float(c_ref)) < 1e-5 * max(1.0, abs(float(c_ref)))
    assert matrices_equal(np.asarray(g_t), np.asarray(g_ref), 1e-8)


def test_tiled_pallas_vg_rejects_bad_configs():
    x, obs, shifts_np, kernel = _problem()
    mesh = make_mesh({ROW_AXIS: 2, COL_AXIS: 2, FRAME_AXIS: 2},
                     jax.devices()[:8])
    with pytest.raises(ValueError, match="shift-generic"):
        make_tiled_pallas_vg(mesh, obs, shifts_np, kernel, 2, [],
                             image_shape=x.shape[-2:])
    mesh2 = make_mesh({ROW_AXIS: 2, COL_AXIS: 2}, jax.devices()[:4])
    with pytest.raises(ValueError, match="3D spectral"):
        make_tiled_pallas_vg(
            mesh2, obs, shifts_np, kernel, 2,
            [(TotalVariationRegularizer(use_3d_total_variation=True), 0.01)],
            image_shape=x.shape[-2:],
        )
