"""Fused Pallas data-term kernel vs the unfused reference path (interpret
mode on CPU; the compiled path is exercised on TPU by the benchmarks)."""

import numpy as np
import pytest

import jax.numpy as jnp

from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShiftSequence
from super_resolution_tpu.ops.pallas.degrade import (
    composite_taps,
    pallas_data_term_cost_and_grad,
)
from super_resolution_tpu.solvers.objective import data_term_cost_and_grad_static
from super_resolution_tpu.utils.testing import matrices_equal


def _problem(shifts, scale=2, blur=True, c=1, hw=(32, 32), seed=81):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((c, *hw)), jnp.float32)
    seq = MotionShiftSequence(shifts)
    params = ImageModelParameters(
        scale=scale,
        blur_radius=3 if blur else 0,
        blur_sigma=1.0 if blur else 0.0,
        motion_sequence=seq,
    )
    model = ImageModel.create(params)
    obs = jnp.stack([model.apply(x, k) for k in range(len(shifts))])
    kernel = None if not blur else model.blur_operator.kernel.astype(np.float32)
    return x, obs, seq.as_array(), kernel


def test_composite_taps_integer_shift():
    fwd, adj = composite_taps(1.0, 0.0, None)
    assert fwd == [(0, -1, 1.0)]
    assert adj == [(0, 1, 1.0)]
    fwd_b, _ = composite_taps(0.0, 0.0, np.ones((3, 3)) / 9.0)
    assert len(fwd_b) == 9


@pytest.mark.parametrize(
    "shifts,blur,scale",
    [
        ([(0, 0), (1, 1), (0, 1), (1, 0)], True, 2),
        ([(0, 0), (-1, 2)], True, 4),
        ([(0, 0), (0.5, -0.5), (1.25, 0.75)], True, 2),
        ([(0, 0), (1, 1)], False, 2),
    ],
)
def test_pallas_matches_reference(shifts, blur, scale):
    x, obs, shifts_np, kernel = _problem(shifts, scale=scale, blur=blur)
    cost_ref, grad_ref = data_term_cost_and_grad_static(
        x, obs, shifts_np, None if kernel is None else jnp.asarray(kernel), scale
    )
    cost_p, grad_p = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, scale, tile=16, interpret=True
    )
    assert abs(float(cost_p) - float(cost_ref)) < 1e-4 * max(1.0, abs(float(cost_ref)))
    assert matrices_equal(np.asarray(grad_p), np.asarray(grad_ref), 1e-5)


def test_pallas_multichannel_nondivisible():
    """3 channels, H/W not multiples of the tile size."""
    x, obs, shifts_np, kernel = _problem(
        [(0, 0), (1, 1), (-1, 0)], scale=2, blur=True, c=3, hw=(22, 26), seed=82
    )
    cost_ref, grad_ref = data_term_cost_and_grad_static(
        x, obs, shifts_np, jnp.asarray(kernel), 2
    )
    cost_p, grad_p = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, 2, tile=16, interpret=True
    )
    assert abs(float(cost_p) - float(cost_ref)) < 1e-4 * max(1.0, abs(float(cost_ref)))
    assert matrices_equal(np.asarray(grad_p), np.asarray(grad_ref), 1e-5)


@pytest.mark.parametrize(
    "shifts,scale,hw,tile",
    [
        ([(0, 0), (1, 1), (0, 1), (1, 0)], 4, (48, 48), 16),
        ([(0, 0), (0.5, -0.5), (-1.25, 2.0)], 2, (38, 30), 16),
        ([(0, 0), (2, -1)], 3, (33, 27), 24),
    ],
)
def test_pallas_fused_tv_matches_reference(shifts, scale, hw, tile):
    """Fused 2D TV (tv_constants) == unfused data term + ops/tv.py."""
    from super_resolution_tpu.ops.tv import tv_cost_and_grad

    x, obs, shifts_np, kernel = _problem(shifts, scale=scale, hw=hw, seed=83)
    rng = np.random.default_rng(84)
    constants = jnp.asarray(rng.random(x.shape), jnp.float32) * 0.05

    cost_d, grad_d = data_term_cost_and_grad_static(
        x, obs, shifts_np, jnp.asarray(kernel), scale
    )
    cost_tv, grad_tv = tv_cost_and_grad(x, constants)
    cost_ref = float(cost_d + cost_tv)
    grad_ref = np.asarray(grad_d + grad_tv)

    cost_p, grad_p = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, scale, tile=tile, interpret=True,
        tv_constants=constants,
    )
    assert abs(float(cost_p) - cost_ref) < 1e-4 * max(1.0, abs(cost_ref))
    assert matrices_equal(np.asarray(grad_p), grad_ref, 1e-5)


def test_fused_tv_multichannel():
    """Multi-channel fused TV, tile not dividing the image."""
    from super_resolution_tpu.ops.tv import tv_cost_and_grad

    x, obs, shifts_np, kernel = _problem(
        [(0, 0), (1, -1)], scale=2, c=3, hw=(22, 26), seed=85
    )
    rng = np.random.default_rng(86)
    constants = jnp.asarray(rng.random(x.shape), jnp.float32) * 0.02
    cost_d, grad_d = data_term_cost_and_grad_static(
        x, obs, shifts_np, jnp.asarray(kernel), 2
    )
    cost_tv, grad_tv = tv_cost_and_grad(x, constants)
    cost_p, grad_p = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, 2, tile=16, interpret=True,
        tv_constants=constants,
    )
    assert abs(float(cost_p) - float(cost_d + cost_tv)) < 1e-4
    assert matrices_equal(np.asarray(grad_p), np.asarray(grad_d + grad_tv), 1e-5)


def test_make_map_value_and_grad_fuses_tv():
    """use_pallas + a single 2D TV regularizer routes through the fused kernel
    and matches the unfused analytic objective."""
    from super_resolution_tpu.ops.tv import TotalVariationRegularizer
    from super_resolution_tpu.solvers.objective import make_map_value_and_grad

    x, obs, shifts_np, kernel = _problem(
        [(0, 0), (1, 1), (0, 1), (1, 0)], scale=2, hw=(32, 32), seed=87
    )
    tv = TotalVariationRegularizer()
    shifts = jnp.asarray(shifts_np, jnp.float32)
    weights = (jnp.asarray(np.random.default_rng(88).random(x.shape), jnp.float32),)
    vg_ref = make_map_value_and_grad(
        obs, shifts, jnp.asarray(kernel), 2, [(tv, 0.01)], static_shifts=shifts_np
    )
    vg_pallas = make_map_value_and_grad(
        obs, shifts, jnp.asarray(kernel), 2, [(tv, 0.01)],
        static_shifts=shifts_np, use_pallas=True,
    )
    c_ref, g_ref = vg_ref(x, weights)
    c_p, g_p = vg_pallas(x, weights)
    assert abs(float(c_p) - float(c_ref)) < 1e-4 * max(1.0, abs(float(c_ref)))
    assert matrices_equal(np.asarray(g_p), np.asarray(g_ref), 1e-5)


@pytest.mark.parametrize(
    "shifts,scale,hw,tile,btv_range,decay",
    [
        ([(0, 0), (1, 1), (0, 1), (1, 0)], 4, (48, 48), 16, 3, 0.5),
        ([(0, 0), (0.5, -0.5), (-1.25, 2.0)], 2, (38, 30), 16, 2, 0.25),
        ([(0, 0), (2, -1)], 3, (33, 27), 24, 1, 0.7),
    ],
)
def test_pallas_fused_btv_matches_reference(shifts, scale, hw, tile, btv_range, decay):
    """Fused BTV (btv_constants) == unfused data term + ops/btv.py, incl. the
    inclusive-residual/exclusive-gradient asymmetry and the image-origin
    source skip."""
    from super_resolution_tpu.ops.btv import btv_cost_and_grad

    x, obs, shifts_np, kernel = _problem(shifts, scale=scale, hw=hw, seed=89)
    rng = np.random.default_rng(90)
    constants = jnp.asarray(rng.random(x.shape), jnp.float32) * 0.05

    cost_d, grad_d = data_term_cost_and_grad_static(
        x, obs, shifts_np, jnp.asarray(kernel), scale
    )
    cost_b, grad_b = btv_cost_and_grad(x, constants, btv_range, decay)
    cost_ref = float(cost_d + cost_b)
    grad_ref = np.asarray(grad_d + grad_b)

    cost_p, grad_p = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, scale, tile=tile, interpret=True,
        btv_constants=constants, btv_range=btv_range, btv_decay=decay,
    )
    assert abs(float(cost_p) - cost_ref) < 1e-4 * max(1.0, abs(cost_ref))
    assert matrices_equal(np.asarray(grad_p), grad_ref, 1e-5)


def test_make_map_value_and_grad_fuses_btv():
    """use_pallas + a single BTV regularizer routes through the fused kernel;
    prepare() pre-packs the weight windows and matches the per-call path."""
    from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
    from super_resolution_tpu.solvers.objective import make_map_value_and_grad

    x, obs, shifts_np, kernel = _problem(
        [(0, 0), (1, 1), (0, 1), (1, 0)], scale=2, hw=(32, 32), seed=91
    )
    btv = BilateralTotalVariationRegularizer(scale_range=3, spatial_decay=0.5)
    shifts = jnp.asarray(shifts_np, jnp.float32)
    weights = (jnp.asarray(np.random.default_rng(92).random(x.shape), jnp.float32),)
    vg_ref = make_map_value_and_grad(
        obs, shifts, jnp.asarray(kernel), 2, [(btv, 0.01)], static_shifts=shifts_np
    )
    vg_pallas = make_map_value_and_grad(
        obs, shifts, jnp.asarray(kernel), 2, [(btv, 0.01)],
        static_shifts=shifts_np, use_pallas=True,
    )
    c_ref, g_ref = vg_ref(x, weights)
    c_p, g_p = vg_pallas(x, weights)
    assert abs(float(c_p) - float(c_ref)) < 1e-4 * max(1.0, abs(float(c_ref)))
    assert matrices_equal(np.asarray(g_p), np.asarray(g_ref), 1e-5)
    c_q, g_q = vg_pallas.prepare(weights)(x)
    assert abs(float(c_q) - float(c_p)) < 1e-6 * max(1.0, abs(float(c_p)))
    assert matrices_equal(np.asarray(g_q), np.asarray(g_p), 1e-6)


@pytest.mark.parametrize(
    "shifts,scale,c,hw,tile",
    [
        ([(0, 0), (1, 1), (0, 1), (1, 0)], 2, 5, (32, 32), 16),
        ([(0, 0), (0.5, -0.5)], 2, 3, (22, 26), 16),
        ([(0, 0), (2, -1)], 3, 4, (33, 27), 24),
        ([(0, 0), (1, 1)], 2, 1, (20, 20), 16),  # single band: dz == 0
    ],
)
def test_pallas_fused_tv3d_matches_reference(shifts, scale, c, hw, tile):
    """Fused 3D (spectral) TV == unfused data term + ops/tv.py use_3d=True."""
    from super_resolution_tpu.ops.tv import tv_cost_and_grad

    x, obs, shifts_np, kernel = _problem(shifts, scale=scale, c=c, hw=hw, seed=93)
    rng = np.random.default_rng(94)
    constants = jnp.asarray(rng.random(x.shape), jnp.float32) * 0.05

    cost_d, grad_d = data_term_cost_and_grad_static(
        x, obs, shifts_np, jnp.asarray(kernel), scale
    )
    cost_tv, grad_tv = tv_cost_and_grad(x, constants, use_3d=True)
    cost_ref = float(cost_d + cost_tv)
    grad_ref = np.asarray(grad_d + grad_tv)

    cost_p, grad_p = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, scale, tile=tile, interpret=True,
        tv_constants=constants, tv_use_3d=True,
    )
    assert abs(float(cost_p) - cost_ref) < 1e-4 * max(1.0, abs(cost_ref))
    assert matrices_equal(np.asarray(grad_p), grad_ref, 1e-5)


def test_make_map_value_and_grad_fuses_tv3d():
    """use_pallas + a 3D TV regularizer routes through the fused kernel,
    both per-call and via prepare()."""
    from super_resolution_tpu.ops.tv import TotalVariationRegularizer
    from super_resolution_tpu.solvers.objective import make_map_value_and_grad

    x, obs, shifts_np, kernel = _problem(
        [(0, 0), (1, 1), (0, 1), (1, 0)], scale=2, c=4, hw=(32, 32), seed=95
    )
    tv3 = TotalVariationRegularizer(use_3d_total_variation=True)
    shifts = jnp.asarray(shifts_np, jnp.float32)
    weights = (jnp.asarray(np.random.default_rng(96).random(x.shape), jnp.float32),)
    vg_ref = make_map_value_and_grad(
        obs, shifts, jnp.asarray(kernel), 2, [(tv3, 0.01)], static_shifts=shifts_np
    )
    vg_pallas = make_map_value_and_grad(
        obs, shifts, jnp.asarray(kernel), 2, [(tv3, 0.01)],
        static_shifts=shifts_np, use_pallas=True,
    )
    c_ref, g_ref = vg_ref(x, weights)
    c_p, g_p = vg_pallas(x, weights)
    assert abs(float(c_p) - float(c_ref)) < 1e-4 * max(1.0, abs(float(c_ref)))
    assert matrices_equal(np.asarray(g_p), np.asarray(g_ref), 1e-5)
    c_q, g_q = vg_pallas.prepare(weights)(x)
    assert abs(float(c_q) - float(c_p)) < 1e-6 * max(1.0, abs(float(c_p)))
    assert matrices_equal(np.asarray(g_q), np.asarray(g_p), 1e-6)


@pytest.mark.parametrize("tile", [(16, 32), (32, 16), (8, 24)])
def test_rectangular_tiles_match_reference(tile):
    """Rectangular (rows, cols) tile specs: data term + fused TV + fused BTV
    all agree with the unfused path on a non-tile-divisible image. On real
    TPUs wide-short tiles map better onto the 128-wide vector lanes; here we
    only check correctness (interpret mode)."""
    from super_resolution_tpu.ops.btv import btv_cost_and_grad
    from super_resolution_tpu.ops.tv import tv_cost_and_grad
    from super_resolution_tpu.ops.pallas.degrade import (
        pack_btv_constants,
        pack_tv_constants,
    )

    x, obs, shifts_np, kernel = _problem(
        [(0, 0), (1.5, -0.5), (0, 1)], scale=2, c=2, hw=(26, 42), seed=97
    )
    rng = np.random.default_rng(98)
    constants = jnp.asarray(rng.random(x.shape), jnp.float32) * 0.05

    cost_d, grad_d = data_term_cost_and_grad_static(
        x, obs, shifts_np, jnp.asarray(kernel), 2
    )
    cost_p, grad_p = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, 2, tile=tile, interpret=True
    )
    assert abs(float(cost_p) - float(cost_d)) < 1e-4 * max(1.0, abs(float(cost_d)))
    assert matrices_equal(np.asarray(grad_p), np.asarray(grad_d), 1e-5)

    # Fused TV with pre-packed rectangular-tile constants.
    cost_tv, grad_tv = tv_cost_and_grad(x, constants)
    packed = pack_tv_constants(constants, 2, tile)
    cost_f, grad_f = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, 2, tile=tile, interpret=True,
        tv_constants_packed=packed,
    )
    ref_c = float(cost_d + cost_tv)
    assert abs(float(cost_f) - ref_c) < 1e-4 * max(1.0, abs(ref_c))
    assert matrices_equal(np.asarray(grad_f), np.asarray(grad_d + grad_tv), 1e-5)

    # Fused BTV with pre-packed rectangular-tile constants.
    cost_b, grad_b = btv_cost_and_grad(x, constants, scale_range=2, spatial_decay=0.5)
    packed_b = pack_btv_constants(constants, 2, 2, tile)
    cost_fb, grad_fb = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, 2, tile=tile, interpret=True,
        btv_constants_packed=packed_b, btv_range=2, btv_decay=0.5,
    )
    ref_cb = float(cost_d + cost_b)
    assert abs(float(cost_fb) - ref_cb) < 1e-4 * max(1.0, abs(ref_cb))
    assert matrices_equal(np.asarray(grad_fb), np.asarray(grad_d + grad_b), 1e-5)


# ---------------------------------------------------------------------------
# Shift-generic (dynamic) kernel: runtime SMEM tap tables, one executable per
# (shapes, shift_bound) — motion is data, not a compile-time constant.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shifts,blur,scale,bound",
    [
        ([(0, 0), (1, 1), (0, 1), (1, 0)], True, 2, 2.0),
        ([(0, 0), (-1, 2)], True, 4, 2.0),
        ([(0, 0), (0.5, -0.5), (1.25, 0.75)], True, 2, 2.0),
        ([(0, 0), (1, 1)], False, 2, 2.0),
        ([(0, 0), (-3.5, 3.9)], True, 4, 4.0),  # bound > scale
    ],
)
def test_dynamic_kernel_matches_static(shifts, blur, scale, bound):
    x, obs, shifts_np, kernel = _problem(shifts, scale=scale, blur=blur)
    cost_s, grad_s = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, scale, tile=16, interpret=True
    )
    cost_d, grad_d = pallas_data_term_cost_and_grad(
        x, obs, None, kernel, scale, tile=16, interpret=True,
        dynamic_shifts=jnp.asarray(shifts_np, jnp.float32), shift_bound=bound,
    )
    assert abs(float(cost_d) - float(cost_s)) < 1e-4 * max(1.0, abs(float(cost_s)))
    assert matrices_equal(np.asarray(grad_d), np.asarray(grad_s), 1e-5)


@pytest.mark.parametrize("reg", ["tv", "tv3d", "btv"])
def test_dynamic_kernel_fused_regularizers(reg):
    x, obs, shifts_np, kernel = _problem(
        [(0, 0), (1.5, -0.5), (0, 1)], scale=2, c=3, hw=(26, 30), seed=99
    )
    rng = np.random.default_rng(100)
    constants = jnp.asarray(rng.random(x.shape), jnp.float32) * 0.05
    kwargs = dict(tv_constants=constants) if reg == "tv" else (
        dict(tv_constants=constants, tv_use_3d=True) if reg == "tv3d"
        else dict(btv_constants=constants, btv_range=2, btv_decay=0.5)
    )
    cost_s, grad_s = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, 2, tile=16, interpret=True, **kwargs
    )
    cost_d, grad_d = pallas_data_term_cost_and_grad(
        x, obs, None, kernel, 2, tile=16, interpret=True,
        dynamic_shifts=jnp.asarray(shifts_np, jnp.float32), shift_bound=2.0,
        **kwargs,
    )
    assert abs(float(cost_d) - float(cost_s)) < 1e-4 * max(1.0, abs(float(cost_s)))
    assert matrices_equal(np.asarray(grad_d), np.asarray(grad_s), 1e-5)


def test_dynamic_kernel_one_executable_many_shift_sets():
    """THE point of the shift-generic kernel: two different shift sets (one
    integer, one fractional) run through ONE jitted executable — no retrace,
    no recompile — and both match the shift-specialized kernel."""
    import jax

    x, obs, shifts_a, kernel = _problem(
        [(0, 0), (1, 1), (0, 1), (1, 0)], scale=2, hw=(32, 32), seed=101
    )
    shifts_b = np.asarray([(0.3, -0.7), (1.1, 1.6), (-0.4, 1.2), (1.9, -0.2)])

    @jax.jit
    def dyn(x, obs, shifts):
        return pallas_data_term_cost_and_grad(
            x, obs, None, kernel, 2, tile=16, interpret=True,
            dynamic_shifts=shifts, shift_bound=2.0,
        )

    for shifts_np in (shifts_a, shifts_b):
        cost_s, grad_s = pallas_data_term_cost_and_grad(
            x, obs, shifts_np, kernel, 2, tile=16, interpret=True
        )
        cost_d, grad_d = dyn(x, obs, jnp.asarray(shifts_np, jnp.float32))
        assert abs(float(cost_d) - float(cost_s)) < 1e-4 * max(
            1.0, abs(float(cost_s))
        )
        assert matrices_equal(np.asarray(grad_d), np.asarray(grad_s), 1e-5)
    assert dyn._cache_size() == 1, "expected ONE compiled executable"


def test_dynamic_kernel_requires_bound():
    x, obs, shifts_np, kernel = _problem([(0, 0), (1, 1)], scale=2)
    with pytest.raises(ValueError, match="shift_bound"):
        pallas_data_term_cost_and_grad(
            x, obs, None, kernel, 2, tile=16, interpret=True,
            dynamic_shifts=jnp.asarray(shifts_np, jnp.float32),
        )


def test_make_map_value_and_grad_dynamic_pallas():
    """pallas_shift_bound routes the objective through the shift-generic
    kernel (traced shifts) and matches the unfused analytic path."""
    from super_resolution_tpu.ops.tv import TotalVariationRegularizer
    from super_resolution_tpu.solvers.objective import make_map_value_and_grad

    x, obs, shifts_np, kernel = _problem(
        [(0, 0), (1.5, 0.25), (0, 1), (1, 0)], scale=2, hw=(32, 32), seed=103
    )
    tv = TotalVariationRegularizer()
    shifts = jnp.asarray(shifts_np, jnp.float32)
    weights = (jnp.asarray(np.random.default_rng(104).random(x.shape), jnp.float32),)
    vg_ref = make_map_value_and_grad(
        obs, shifts, jnp.asarray(kernel), 2, [(tv, 0.01)], static_shifts=shifts_np
    )
    vg_dyn = make_map_value_and_grad(
        obs, shifts, jnp.asarray(kernel), 2, [(tv, 0.01)],
        use_pallas=True, pallas_shift_bound=2.0,
    )
    c_ref, g_ref = vg_ref(x, weights)
    c_d, g_d = vg_dyn(x, weights)
    assert abs(float(c_d) - float(c_ref)) < 1e-4 * max(1.0, abs(float(c_ref)))
    assert matrices_equal(np.asarray(g_d), np.asarray(g_ref), 1e-5)
    c_q, g_q = vg_dyn.prepare(weights)(x)
    assert abs(float(c_q) - float(c_d)) < 1e-6 * max(1.0, abs(float(c_d)))
    assert matrices_equal(np.asarray(g_q), np.asarray(g_d), 1e-6)


def test_shift_bound_bucket():
    from super_resolution_tpu.ops.pallas.degrade import shift_bound_bucket

    assert shift_bound_bucket(0.5) == 2
    assert shift_bound_bucket(2.0) == 2
    assert shift_bound_bucket(2.1) == 4
    assert shift_bound_bucket(7.9) == 8


# ---------------------------------------------------------------------------
# Channel (band-block) grid dimension: hyperspectral stacks keep large
# spatial tiles by processing channel_block bands per grid step.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cblk", [1, 2, 3, 6])
def test_channel_block_matches_full(cblk):
    x, obs, shifts_np, kernel = _problem(
        [(0, 0), (1.5, -0.5)], scale=2, c=6, hw=(24, 28), seed=105
    )
    rng = np.random.default_rng(106)
    constants = jnp.asarray(rng.random(x.shape), jnp.float32) * 0.05
    for kwargs in (
        {},
        dict(tv_constants=constants),
        dict(btv_constants=constants, btv_range=2, btv_decay=0.5),
    ):
        c_ref, g_ref = pallas_data_term_cost_and_grad(
            x, obs, shifts_np, kernel, 2, tile=16, interpret=True, **kwargs
        )
        c_b, g_b = pallas_data_term_cost_and_grad(
            x, obs, shifts_np, kernel, 2, tile=16, interpret=True,
            channel_block=cblk, **kwargs,
        )
        assert abs(float(c_b) - float(c_ref)) < 1e-4 * max(1.0, abs(float(c_ref)))
        assert matrices_equal(np.asarray(g_b), np.asarray(g_ref), 1e-5)


def test_channel_block_dynamic_shifts():
    x, obs, shifts_np, kernel = _problem(
        [(0, 0), (0.5, 1.25)], scale=2, c=4, hw=(24, 24), seed=107
    )
    c_ref, g_ref = pallas_data_term_cost_and_grad(
        x, obs, shifts_np, kernel, 2, tile=16, interpret=True
    )
    c_b, g_b = pallas_data_term_cost_and_grad(
        x, obs, None, kernel, 2, tile=16, interpret=True, channel_block=2,
        dynamic_shifts=jnp.asarray(shifts_np, jnp.float32), shift_bound=2.0,
    )
    assert abs(float(c_b) - float(c_ref)) < 1e-4 * max(1.0, abs(float(c_ref)))
    assert matrices_equal(np.asarray(g_b), np.asarray(g_ref), 1e-5)


def test_channel_block_validation():
    x, obs, shifts_np, kernel = _problem([(0, 0)], scale=2, c=4, hw=(16, 16))
    with pytest.raises(ValueError, match="does not divide"):
        pallas_data_term_cost_and_grad(
            x, obs, shifts_np, kernel, 2, tile=16, interpret=True,
            channel_block=3,
        )
    rng = np.random.default_rng(108)
    constants = jnp.asarray(rng.random(x.shape), jnp.float32)
    with pytest.raises(ValueError, match="3D spectral TV"):
        pallas_data_term_cost_and_grad(
            x, obs, shifts_np, kernel, 2, tile=16, interpret=True,
            channel_block=2, tv_constants=constants, tv_use_3d=True,
        )


def test_choose_channel_block_keeps_single_band_tile():
    """The chooser returns the 1-band tile with a block that fits it; many-
    band images must not shrink the spatial tile anymore."""
    from super_resolution_tpu.ops.pallas.degrade import (
        choose_channel_block,
        choose_tile,
    )

    shifts = np.asarray([(0, 0), (1, 1), (0, 1), (1, 0)])
    kernel = np.ones((7, 7), np.float32) / 49.0
    # channel_grid=True: the chooser compares against the 1-band tile AT
    # THE GRID BUDGET (blocked configs carry grid pipelining state the VMEM
    # model under-estimates, so they use the conservative budget).
    target = choose_tile(1, 4, 4, shifts, kernel, use_tv=True,
                         channel_grid=True)
    block, tile = choose_channel_block(64, 4, 4, shifts, kernel, use_tv=True)
    assert tile == target
    assert 64 % block == 0
    # Without blocking, 64 bands shrink the tile below the 1-band choice.
    shrunk = choose_tile(64, 4, 4, shifts, kernel, use_tv=True)
    assert shrunk[0] * shrunk[1] < target[0] * target[1]


# ---------------------------------------------------------------------------
# Phase-plane solver-state IO: planes in / planes out skips the per-eval
# polyphase transposes; CG vector algebra is permutation-invariant, so the
# full solve is numerically identical.
# ---------------------------------------------------------------------------


def test_phase_io_eval_matches_image_io():
    from super_resolution_tpu.ops.pallas.degrade import hr_to_planes, planes_to_hr

    x, obs, shifts_np, kernel = _problem(
        [(0, 0), (1.5, -0.5)], scale=2, c=2, hw=(24, 28), seed=120
    )
    rng = np.random.default_rng(121)
    constants = jnp.asarray(rng.random(x.shape), jnp.float32) * 0.05
    for kwargs in (
        {},
        dict(tv_constants=constants),
        dict(btv_constants=constants, btv_range=2, btv_decay=0.5),
    ):
        c_ref, g_ref = pallas_data_term_cost_and_grad(
            x, obs, shifts_np, kernel, 2, tile=16, interpret=True, **kwargs
        )
        c_pl, g_pl = pallas_data_term_cost_and_grad(
            hr_to_planes(x, 2), obs, shifts_np, kernel, 2, tile=16,
            interpret=True, phase_io=True, **kwargs,
        )
        assert abs(float(c_pl) - float(c_ref)) < 1e-6 * max(1.0, abs(float(c_ref)))
        assert matrices_equal(
            np.asarray(planes_to_hr(g_pl, 2)), np.asarray(g_ref), 1e-6
        )
    # Round trip.
    assert np.array_equal(
        np.asarray(planes_to_hr(hr_to_planes(x, 2), 2)), np.asarray(x)
    )


def test_phase_io_full_solve_matches():
    """A complete CG solve on phase-plane state matches the image-state
    solve. The state is a permutation, so the only divergence source is
    f32 reduction order in the line-search dots (last-ulp), amplified
    through signum TV gradients over iterations — equality is asserted at
    1e-5, far inside the 0.1 dB quality contract."""
    from super_resolution_tpu.solvers import make_map_value_and_grad, minimize

    x, obs, shifts_np, kernel = _problem(
        [(0, 0), (1, 1), (0, 1), (1, 0)], scale=2, c=1, hw=(16, 16), seed=122
    )
    tv = __import__(
        "super_resolution_tpu.ops.tv", fromlist=["TotalVariationRegularizer"]
    ).TotalVariationRegularizer()
    regs = [(tv, 0.01)]
    weights = (jnp.ones(x.shape, x.dtype),)
    x0 = jnp.zeros_like(x)

    vg_img = make_map_value_and_grad(
        obs, jnp.asarray(shifts_np), kernel, 2, regs, max_shift=3,
        static_shifts=shifts_np, use_pallas=True, pallas_tile=16,
    )
    ref = minimize(vg_img.prepare(weights), x0, max_iterations=10)

    vg_pl = make_map_value_and_grad(
        obs, jnp.asarray(shifts_np), kernel, 2, regs, max_shift=3,
        static_shifts=shifts_np, use_pallas=True, pallas_tile=16,
        phase_io=True,
    )
    out = minimize(vg_pl.prepare(weights), vg_pl.to_planes(x0), max_iterations=10)
    x_back = vg_pl.from_planes(out.x)
    assert matrices_equal(np.asarray(x_back), np.asarray(ref.x), 1e-5)
    assert abs(float(out.cost) - float(ref.cost)) < 1e-5 * max(1.0, abs(float(ref.cost)))


def test_phase_io_rejects_unfusable():
    from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
    from super_resolution_tpu.ops.tv import TotalVariationRegularizer
    from super_resolution_tpu.solvers import make_map_value_and_grad

    x, obs, shifts_np, kernel = _problem([(0, 0)], scale=2, c=1, hw=(16, 16))
    two_regs = [
        (TotalVariationRegularizer(), 0.01),
        (BilateralTotalVariationRegularizer(2, 0.5), 0.01),
    ]
    with pytest.raises(ValueError, match="phase_io"):
        make_map_value_and_grad(
            obs, jnp.asarray(shifts_np), kernel, 2, two_regs,
            static_shifts=shifts_np, use_pallas=True, pallas_tile=16,
            phase_io=True,
        )
    with pytest.raises(ValueError, match="phase_io"):
        make_map_value_and_grad(
            obs, jnp.asarray(shifts_np), kernel, 2, [], use_pallas=False,
            phase_io=True,
        )


@pytest.mark.parametrize("reg_kind", ["none", "tv", "btv"])
def test_kernel_shard_mode_matches_full_image(reg_kind):
    """Shard mode (origin + global_hw + data_mask_lr): running the kernel on
    halo-extended row tiles and scatter-summing the gradients reproduces the
    full-image kernel exactly — the seam contract of the spatial halo path
    (parallel/halo.py) when it feeds tiles to the fused kernel."""
    from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
    from super_resolution_tpu.ops.blur import gaussian_kernel_2d

    rng = np.random.default_rng(55)
    s = 2
    c, h, w = 1, 24, 24
    x = jnp.asarray(rng.random((c, h, w)), jnp.float64)
    shifts = np.asarray([(0.0, 0.0), (1.25, -0.5), (0.5, 1.0)])
    kernel = np.asarray(gaussian_kernel_2d(3, 1.0))
    obs = jnp.asarray(rng.random((3, c, h // s, w // s)), jnp.float64)

    reg_kwargs = {}
    btv_range = 2
    if reg_kind == "tv":
        cst = jnp.asarray(rng.random((c, h, w)), jnp.float64) * 0.01
        reg_kwargs = dict(tv_constants=cst)
    elif reg_kind == "btv":
        cst = jnp.asarray(rng.random((c, h, w)), jnp.float64) * 0.01
        reg_kwargs = dict(btv_constants=cst, btv_range=btv_range, btv_decay=0.6)

    cost_full, grad_full = pallas_data_term_cost_and_grad(
        x, obs, shifts, kernel, s, tile=8, interpret=True, **reg_kwargs
    )

    # Two row shards with a q-halo (q covers warp+blur reach and the BTV
    # window), computed serially exactly as the shard_map path would.
    q = 4
    th = h // 2
    cost_sum = 0.0
    canvas = np.zeros((c, h, w))
    for r in range(2):
        r0 = r * th - q
        xp = np.zeros((c, th + 2 * q, w + 2 * q))
        lo, hi = max(r0, 0), min(r0 + th + 2 * q, h)
        xp[:, lo - r0 : hi - r0, q : q + w] = np.asarray(x)[:, lo:hi, :]
        obs_pad = np.zeros((3, c, (th + 2 * q) // s, (w + 2 * q) // s))
        lo_l, hi_l = max(r0 // s, 0), min((r0 + th + 2 * q) // s, h // s)
        obs_pad[:, :, lo_l - r0 // s : hi_l - r0 // s, q // s : q // s + w // s] = (
            np.asarray(obs)[:, :, lo_l:hi_l, :]
        )
        mask = np.zeros(((th + 2 * q) // s, (w + 2 * q) // s))
        mask[q // s : q // s + th // s, q // s : q // s + w // s] = 1.0
        skw = dict(reg_kwargs)
        if reg_kind in ("tv", "btv"):
            key = "tv_constants" if reg_kind == "tv" else "btv_constants"
            cpad = np.zeros((c, th + 2 * q, w + 2 * q))
            cpad[:, lo - r0 : hi - r0, q : q + w] = np.asarray(cst)[:, lo:hi, :]
            # rim constants ZERO: only owned pixels' regularizer terms count
            cpad_owned = np.zeros_like(cpad)
            cpad_owned[:, q : q + th, q : q + w] = cpad[:, q : q + th, q : q + w]
            skw[key] = jnp.asarray(cpad_owned)
        cost_k, grad_k = pallas_data_term_cost_and_grad(
            jnp.asarray(xp), jnp.asarray(obs_pad), shifts, kernel, s, tile=8,
            interpret=True, origin=(r0, -q), global_hw=(h, w),
            data_mask_lr=jnp.asarray(mask), **skw,
        )
        cost_sum += float(cost_k)
        glo, ghi = max(r0, 0), min(r0 + th + 2 * q, h)
        canvas[:, glo:ghi, :] += np.asarray(grad_k)[:, glo - r0 : ghi - r0, q : q + w]

    # The kernel's cost accumulator is f32 (per-tile SMEM partials): the
    # shard split changes reduction order at f32 precision.
    assert abs(cost_sum - float(cost_full)) < 1e-6 * max(1.0, abs(float(cost_full)))
    assert matrices_equal(canvas, np.asarray(grad_full), 1e-9)


def test_composite_data_term_interior_exact():
    """Round-5 slice-graph attack: the merged warp+blur tap kernel
    (composite_data_term) matches the two-stage kernel exactly wherever the
    global image border cannot reach — same cost when the residual vanishes
    on the border band, identical interior gradient always."""
    import numpy as np

    from super_resolution_tpu.models.image_model import degrade
    from super_resolution_tpu.ops.blur import gaussian_kernel_2d
    from super_resolution_tpu.ops.pallas.degrade import (
        pallas_data_term_cost_and_grad,
    )

    rng = np.random.default_rng(0)
    s, h, w = 4, 32, 32
    x = np.zeros((1, h, w))
    x[:, 8:-8, 8:-8] = rng.random((1, h - 16, w - 16))
    x = jnp.asarray(x)
    kern = np.asarray(gaussian_kernel_2d(3, 1.5))
    shifts = [(0, 0), (1, 1), (0.5, -1.25), (1, 0)]
    obs = jnp.stack([degrade(x, dx, dy, jnp.asarray(kern), s) for dx, dy in shifts])
    pert = np.zeros(obs.shape)
    pert[:, :, 2:-2, 2:-2] = 0.1  # residual vanishes on the border band
    obs_p = obs + pert
    c0, g0 = pallas_data_term_cost_and_grad(
        x, obs_p, np.asarray(shifts), kern, s, tile=16
    )
    c1, g1 = pallas_data_term_cost_and_grad(
        x, obs_p, np.asarray(shifts), kern, s, tile=16, composite_data_term=True
    )
    assert abs(float(c0) - float(c1)) < 1e-6 * max(1.0, abs(float(c0)))
    assert float(jnp.max(jnp.abs(g0 - g1))) < 1e-6

    # General problem: interior gradient identical, only the border band
    # (documented interior-exact contract) may differ.
    x2 = jnp.asarray(rng.random((1, h, w)))
    obs2 = jnp.stack(
        [degrade(x2, dx, dy, jnp.asarray(kern), s) for dx, dy in shifts]
    ) + 0.1
    _, g2 = pallas_data_term_cost_and_grad(
        x2, obs2, np.asarray(shifts), kern, s, tile=16
    )
    _, g3 = pallas_data_term_cost_and_grad(
        x2, obs2, np.asarray(shifts), kern, s, tile=16, composite_data_term=True
    )
    m = 8
    assert float(jnp.max(jnp.abs((g2 - g3)[:, m:-m, m:-m]))) < 1e-6


@pytest.mark.parametrize("s,c,use3d", [(4, 1, False), (2, 3, False), (2, 3, True)])
def test_tv_stacked_matches_per_phase(s, c, use3d):
    """The phase-stacked fused TV (round-5 slice-graph attack) is bit-exact
    with the per-phase form on the gradient; the f32 cost accumulator only
    differs by reduction order."""
    import numpy as np

    from super_resolution_tpu.models.image_model import degrade
    from super_resolution_tpu.ops.blur import gaussian_kernel_2d
    from super_resolution_tpu.ops.pallas.degrade import (
        pallas_data_term_cost_and_grad,
    )

    rng = np.random.default_rng(1)
    h = w = 32
    x = jnp.asarray(rng.random((c, h, w)))
    kern = np.asarray(gaussian_kernel_2d(3, 1.5))
    shifts = [(0, 0), (1, 1), (0.5, -1.25), (1, 0)]
    obs = jnp.stack(
        [degrade(x, dx, dy, jnp.asarray(kern), s) for dx, dy in shifts]
    ) + 0.05
    tv_c = jnp.asarray(rng.random((c, h, w))) * 0.01
    kw = dict(tv_constants=tv_c, tv_use_3d=use3d)
    c0, g0 = pallas_data_term_cost_and_grad(
        x, obs, np.asarray(shifts), kern, s, tile=16, **kw
    )
    c1, g1 = pallas_data_term_cost_and_grad(
        x, obs, np.asarray(shifts), kern, s, tile=16, tv_stacked=True, **kw
    )
    assert abs(float(c0) - float(c1)) < 1e-5 * max(1.0, abs(float(c0)))
    assert float(jnp.max(jnp.abs(g0 - g1))) < 1e-12


def test_composite_is_exact_analysis():
    """The static exactness analysis (composite_is_exact) is empirically
    tight: geometries it approves give FULL-ARRAY equality between composite
    and two-stage kernels; a geometry it rejects has a real border delta."""
    import numpy as np

    from super_resolution_tpu.models.image_model import degrade
    from super_resolution_tpu.ops.blur import gaussian_kernel_2d
    from super_resolution_tpu.ops.pallas.degrade import (
        composite_is_exact,
        pallas_data_term_cost_and_grad,
    )

    rng = np.random.default_rng(3)
    kern = np.asarray(gaussian_kernel_2d(3, 1.5))

    def run(s, shifts, h=32, w=32):
        x = jnp.asarray(rng.random((1, h, w)))
        obs = jnp.stack(
            [degrade(x, dx, dy, jnp.asarray(kern), s) for dx, dy in shifts]
        ) + 0.1
        c0, g0 = pallas_data_term_cost_and_grad(
            x, obs, np.asarray(shifts), kern, s, tile=16
        )
        c1, g1 = pallas_data_term_cost_and_grad(
            x, obs, np.asarray(shifts), kern, s, tile=16,
            composite_data_term=True,
        )
        return (
            abs(float(c0) - float(c1)),
            float(jnp.max(jnp.abs(g0 - g1))),
            composite_is_exact(shifts, kern, s, (h, w)),
        )

    # Flagship-style integer shifts at s=4: analysis says exact -> equal
    # (cost tolerance covers the f32 accumulator's reduction-order noise;
    # the gradient equality is the tight check).
    dc, dg, ok = run(4, [(0, 0), (1, 1), (0, 1), (1, 0)])
    assert ok and dc < 1e-4 and dg < 1e-6, (dc, dg, ok)
    # Same shifts at s=2: still exact per analysis -> equal.
    dc, dg, ok = run(2, [(0, 0), (1, 1), (0, 1), (1, 0)])
    assert ok and dc < 1e-4 and dg < 1e-6, (dc, dg, ok)
    # Fractional shifts: analysis rejects -> a real border difference exists.
    dc, dg, ok = run(4, [(0, 0), (0.5, -1.25)])
    assert (not ok) and dg > 1e-6, (dc, dg, ok)


@pytest.mark.parametrize("s,P", [(4, 3), (2, 3), (4, 1), (3, 2)])
def test_btv_stacked_matches_per_phase(s, P):
    """The phase-stacked fused BTV (round 5) is bit-exact with the per-phase
    form on the gradient (f32 cost accumulator differs only by reduction
    order), including non-power-of-two scales and window ranges crossing
    multiple LR cells."""
    import numpy as np

    from super_resolution_tpu.models.image_model import degrade
    from super_resolution_tpu.ops.blur import gaussian_kernel_2d
    from super_resolution_tpu.ops.pallas.degrade import (
        pallas_data_term_cost_and_grad,
    )

    rng = np.random.default_rng(2)
    h = w = 24 if s == 3 else 32
    tile = 8 if s == 3 else 16
    x = jnp.asarray(rng.random((1, h, w)))
    kern = np.asarray(gaussian_kernel_2d(3, 1.5))
    shifts = [(0, 0), (1, 1), (0.5, -1.25), (1, 0)]
    obs = jnp.stack(
        [degrade(x, dx, dy, jnp.asarray(kern), s) for dx, dy in shifts]
    ) + 0.05
    cst = jnp.asarray(rng.random((1, h, w))) * 0.01
    kw = dict(btv_constants=cst, btv_range=P, btv_decay=0.5)
    c0, g0 = pallas_data_term_cost_and_grad(
        x, obs, np.asarray(shifts), kern, s, tile=tile, **kw
    )
    c1, g1 = pallas_data_term_cost_and_grad(
        x, obs, np.asarray(shifts), kern, s, tile=tile, btv_stacked=True, **kw
    )
    assert abs(float(c0) - float(c1)) < 1e-4
    assert float(jnp.max(jnp.abs(g0 - g1))) < 1e-11
