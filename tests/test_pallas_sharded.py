"""Band-sharded fused-Pallas objective == the single-device fused path.

Runs on the virtual 8-device CPU mesh (conftest); the kernel interprets on
CPU and compiles unchanged per shard on TPU."""

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
    FRAME_AXIS,
    make_band_sharded_pallas_solver,
    make_band_sharded_pallas_vg,
    make_mesh,
)
from super_resolution_tpu.solvers import make_map_value_and_grad, minimize
from super_resolution_tpu.utils.testing import matrices_equal

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _problem(c=8, hw=(24, 24), scale=2, seed=70):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((c, *hw)), jnp.float32)
    seq = MotionShiftSequence([(0, 0), (1, 1), (0, 1), (1, 0)])
    model = ImageModel.create(
        ImageModelParameters(
            scale=scale, blur_radius=3, blur_sigma=1.0, motion_sequence=seq
        )
    )
    obs = jnp.stack([model.apply(x, k) for k in range(4)])
    kernel = model.blur_operator.kernel.astype(np.float32)
    return x, obs, seq.as_array(), kernel


def _regs_for(reg_kind):
    if reg_kind == "tv":
        return [(TotalVariationRegularizer(), 0.01)]
    if reg_kind == "tv3d":
        return [(TotalVariationRegularizer(use_3d_total_variation=True), 0.01)]
    if reg_kind == "btv":
        return [(BilateralTotalVariationRegularizer(2, 0.5), 0.01)]
    return []


@pytest.mark.parametrize("reg_kind", ["none", "tv", "tv3d", "btv"])
def test_band_sharded_vg_matches_single_device(reg_kind):
    x, obs, shifts_np, kernel = _problem()
    mesh = make_mesh({BAND_AXIS: 4}, jax.devices()[:4])
    regs = _regs_for(reg_kind)
    weights = (
        (jnp.asarray(np.random.default_rng(71).random(x.shape), jnp.float32),)
        if regs
        else ()
    )

    vg_single = make_map_value_and_grad(
        obs, jnp.asarray(shifts_np, jnp.float32), jnp.asarray(kernel), 2,
        regs, static_shifts=shifts_np, use_pallas=True,
    )
    vg_sharded = make_band_sharded_pallas_vg(
        mesh, obs, shifts_np, kernel, 2, regs
    )
    c_ref, g_ref = vg_single(x, weights)
    c_s, g_s = vg_sharded(x, weights)
    assert abs(float(c_s) - float(c_ref)) < 1e-4 * max(1.0, abs(float(c_ref)))
    assert matrices_equal(np.asarray(g_s), np.asarray(g_ref), 1e-5)
    # prepare() (packed constants, the production inner-solve path) agrees.
    c_p, g_p = vg_sharded.prepare(weights)(x)
    assert abs(float(c_p) - float(c_s)) < 1e-5 * max(1.0, abs(float(c_s)))
    assert matrices_equal(np.asarray(g_p), np.asarray(g_s), 1e-6)
    # Phase-plane solver-state IO (the production state representation):
    # same cost; the gradient round-trips through plane space. For 3D TV
    # this exercises the band halo on the plane channel axis.
    vg_pl = make_band_sharded_pallas_vg(
        mesh, obs, shifts_np, kernel, 2, regs, phase_io=True
    )
    c_pp, g_pp = vg_pl.prepare(weights)(vg_pl.to_planes(x))
    assert abs(float(c_pp) - float(c_s)) < 1e-5 * max(1.0, abs(float(c_s)))
    assert matrices_equal(
        np.asarray(vg_pl.from_planes(g_pp)), np.asarray(g_s), 1e-5
    )


def test_band_sharded_solver_matches_unsharded():
    x, obs, shifts_np, kernel = _problem(seed=72)
    mesh = make_mesh({BAND_AXIS: 4}, jax.devices()[:4])
    tv = TotalVariationRegularizer()
    regs = [(tv, 0.005)]
    weights = (jnp.ones_like(x),)

    vg = make_map_value_and_grad(
        obs, jnp.asarray(shifts_np, jnp.float32), jnp.asarray(kernel), 2,
        regs, static_shifts=shifts_np, use_pallas=True,
    )
    ref = minimize(
        vg.prepare(weights), jnp.zeros_like(x), method="cg", max_iterations=15,
        gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
        parameter_variation_threshold=0.0,
    )
    solve = make_band_sharded_pallas_solver(
        mesh, obs, shifts_np, kernel, 2, regs, max_iterations=15,
        gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
        parameter_variation_threshold=0.0,
    )
    got = solve(jnp.zeros_like(x), weights)
    assert int(got.iterations) == int(ref.iterations)
    # Identical math modulo reduction order; the nonlinear solve amplifies
    # f32 noise slightly over 15 iterations.
    assert abs(float(got.cost) - float(ref.cost)) < 1e-3 * max(
        1.0, abs(float(ref.cost))
    )
    assert matrices_equal(np.asarray(got.x), np.asarray(ref.x), 5e-4)


def test_band_sharded_rejects_incompatible_configs():
    x, obs, shifts_np, kernel = _problem()
    with pytest.raises(ValueError, match="band"):
        make_band_sharded_pallas_vg(
            make_mesh({FRAME_AXIS: 4}, jax.devices()[:4]), obs, shifts_np, kernel, 2, []
        )
    mesh_fb = make_mesh({FRAME_AXIS: 2, BAND_AXIS: 2}, jax.devices()[:4])
    with pytest.raises(ValueError, match="Frame-axis"):
        make_band_sharded_pallas_vg(mesh_fb, obs, shifts_np, kernel, 2, [])
    with pytest.raises(ValueError, match="divisible"):
        make_band_sharded_pallas_vg(
            make_mesh({BAND_AXIS: 3}, jax.devices()[:3]), obs, shifts_np, kernel, 2, []
        )


def test_irls_solver_band_mesh_uses_pallas_path():
    """IRLSMapSolver(mesh=band-only, use_pallas_data_term=True) routes
    through the sharded fused kernel and matches the single-device solve."""
    from super_resolution_tpu.evaluation import psnr
    from super_resolution_tpu.models import ImageModel, ImageModelParameters
    from super_resolution_tpu.solvers import IRLSMapSolver, IRLSMapSolverOptions

    rng = np.random.default_rng(73)
    gt = jnp.asarray(rng.random((4, 20, 20)), jnp.float32)
    seq = MotionShiftSequence([(0, 0), (1, 1), (0, 1), (1, 0)])
    model = ImageModel.create(
        ImageModelParameters(
            scale=2, blur_radius=3, blur_sigma=1.0, motion_sequence=seq
        )
    )
    obs = [np.asarray(model.apply(gt, k)) for k in range(4)]
    mesh = make_mesh({BAND_AXIS: 4}, jax.devices()[:4])
    opts = IRLSMapSolverOptions(
        max_num_irls_iterations=2, max_num_solver_iterations=20,
        use_pallas_data_term=True,
    )
    results = {}
    for label, m in (("single", None), ("band-sharded", mesh)):
        solver = IRLSMapSolver(opts, model, obs, mesh=m)
        solver.add_regularizer(TotalVariationRegularizer(), 0.002)
        results[label] = np.asarray(
            solver.solve(jnp.zeros((4, 20, 20), jnp.float32))
        )
    p_single = float(psnr(results["single"], np.asarray(gt)))
    p_sharded = float(psnr(results["band-sharded"], np.asarray(gt)))
    assert abs(p_single - p_sharded) < 0.2, (p_single, p_sharded)
    assert p_sharded > 12.0  # random-texture gt; parity above is the real check


def test_irls_solver_band_mesh_3d_tv_matches_single():
    """3D spectral TV (the hyperspectral regularizer, tv_regularizer.cpp:
    58-69) on a band mesh: IRLSMapSolver routes through the fused kernel
    with the one-band ppermute halo and matches the single-device solve."""
    from super_resolution_tpu.evaluation import psnr
    from super_resolution_tpu.models import ImageModel, ImageModelParameters
    from super_resolution_tpu.solvers import IRLSMapSolver, IRLSMapSolverOptions

    rng = np.random.default_rng(77)
    base = rng.random((1, 20, 20))
    # Spectrally correlated bands: 3D TV's dz terms are non-trivial.
    gt = jnp.asarray(
        np.concatenate([base + 0.08 * rng.random((1, 20, 20)) for _ in range(8)]),
        jnp.float32,
    )
    seq = MotionShiftSequence([(0, 0), (1, 1), (0, 1), (1, 0)])
    model = ImageModel.create(
        ImageModelParameters(
            scale=2, blur_radius=3, blur_sigma=1.0, motion_sequence=seq
        )
    )
    obs = [np.asarray(model.apply(gt, k)) for k in range(4)]
    mesh = make_mesh({BAND_AXIS: 4}, jax.devices()[:4])
    opts = IRLSMapSolverOptions(
        max_num_irls_iterations=2, max_num_solver_iterations=20,
        use_pallas_data_term=True,
    )
    results = {}
    for label, m in (("single", None), ("band-sharded", mesh)):
        solver = IRLSMapSolver(opts, model, obs, mesh=m)
        solver.add_regularizer(
            TotalVariationRegularizer(use_3d_total_variation=True), 0.002
        )
        results[label] = np.asarray(solver.solve(jnp.zeros_like(gt)))
    p_single = float(psnr(results["single"], np.asarray(gt)))
    p_sharded = float(psnr(results["band-sharded"], np.asarray(gt)))
    assert abs(p_single - p_sharded) < 0.2, (p_single, p_sharded)
    assert p_sharded > 12.0


@pytest.mark.parametrize(
    "mesh_axes,reg_kind",
    [
        ({FRAME_AXIS: 4}, "tv"),
        ({FRAME_AXIS: 4}, "btv"),
        ({FRAME_AXIS: 4}, "none"),
        ({FRAME_AXIS: 4}, "tv3d"),  # replicated bands: no halo needed
        ({FRAME_AXIS: 2, BAND_AXIS: 4}, "tv"),
        ({FRAME_AXIS: 2, BAND_AXIS: 4}, "tv3d"),  # band halo under frame psum
    ],
)
def test_frame_sharded_vg_matches_single_device(mesh_axes, reg_kind):
    """Frame(xband)-sharded shift-generic fused objective == the single-device
    fused path — per-device shifts are runtime data under one SPMD program,
    with a cost psum and a gradient psum over the frame axis."""
    from super_resolution_tpu.parallel import make_frame_sharded_pallas_vg

    x, obs, shifts_np, kernel = _problem()
    # Fractional shifts exercise all four runtime taps per device.
    shifts_np = np.asarray([(0, 0), (1.25, 0.5), (0.5, 1.0), (1.0, 0.75)])
    rng = np.random.default_rng(72)
    obs = jnp.stack(
        [
            jnp.asarray(rng.random((x.shape[0], *[d // 2 for d in x.shape[1:]])),
                        jnp.float32)
            for _ in range(4)
        ]
    )
    n_dev = int(np.prod(list(mesh_axes.values())))
    mesh = make_mesh(mesh_axes, jax.devices()[:n_dev])
    regs = _regs_for(reg_kind)
    weights = (
        (jnp.asarray(np.random.default_rng(73).random(x.shape), jnp.float32),)
        if regs
        else ()
    )

    vg_ref = make_map_value_and_grad(
        obs, jnp.asarray(shifts_np, jnp.float32), jnp.asarray(kernel), 2,
        regs, static_shifts=shifts_np, use_pallas=True, pallas_tile=16,
    )
    c_ref, g_ref = vg_ref(x, weights)

    vg_sh = make_frame_sharded_pallas_vg(
        mesh, obs, jnp.asarray(shifts_np, jnp.float32), kernel, 2, regs,
        shift_bound=2.0, pallas_tile=16, interpret=True,
    )
    c_s, g_s = vg_sh(x, weights)
    assert abs(float(c_s) - float(c_ref)) < 1e-4 * max(1.0, abs(float(c_ref)))
    assert matrices_equal(np.asarray(g_s), np.asarray(g_ref), 1e-4)
    # prepare() (packed constants) matches too.
    c_p, g_p = vg_sh.prepare(weights)(x)
    assert abs(float(c_p) - float(c_s)) < 1e-5 * max(1.0, abs(float(c_s)))
    assert matrices_equal(np.asarray(g_p), np.asarray(g_s), 1e-5)
    # Phase-plane solver-state IO on the sharded path: same cost, gradient
    # comes back as planes.
    vg_pl = make_frame_sharded_pallas_vg(
        mesh, obs, jnp.asarray(shifts_np, jnp.float32), kernel, 2, regs,
        shift_bound=2.0, pallas_tile=16, interpret=True, phase_io=True,
    )
    c_pp, g_pp = vg_pl.prepare(weights)(vg_pl.to_planes(x))
    assert abs(float(c_pp) - float(c_s)) < 1e-5 * max(1.0, abs(float(c_s)))
    assert matrices_equal(
        np.asarray(vg_pl.from_planes(g_pp)), np.asarray(g_s), 1e-5
    )


def test_irls_solver_routes_frame_mesh_through_fused_kernel():
    """IRLSMapSolver(mesh with frame axis, pallas_shift_bound>0) matches the
    single-device solve."""
    from super_resolution_tpu.image.image_data import ImageData
    from super_resolution_tpu.models import ImageModel, ImageModelParameters
    from super_resolution_tpu.solvers import IRLSMapSolver
    from super_resolution_tpu.solvers.map_solver import IRLSMapSolverOptions

    rng = np.random.default_rng(74)
    gt = jnp.asarray(rng.random((2, 24, 24)), jnp.float32)
    seq = MotionShiftSequence([(0, 0), (1.5, 0.5), (0.25, 1.0), (1.0, 0.75)])
    model = ImageModel.create(
        ImageModelParameters(scale=2, blur_radius=1, blur_sigma=0.5,
                             motion_sequence=seq)
    )
    obs = [model.apply(gt, k) for k in range(4)]
    x0 = jnp.zeros_like(gt)
    tv = TotalVariationRegularizer()

    def solve(mesh, **extra):
        opts = IRLSMapSolverOptions(
            max_num_irls_iterations=2, max_num_solver_iterations=10,
            use_pallas_data_term=True, pallas_tile=16, **extra,
        )
        solver = IRLSMapSolver(opts, model, obs, mesh=mesh)
        solver.add_regularizer(tv, 0.005)
        return np.asarray(solver.solve(x0))

    ref = solve(None, pallas_shift_bound=2.0)
    mesh = make_mesh({FRAME_AXIS: 4}, jax.devices()[:4])
    sharded = solve(mesh, pallas_shift_bound=2.0)
    # Single objective evaluations agree bit-exactly between the paths
    # (asserted in test_frame_sharded_vg_matches_single_device); the full
    # IRLS trajectory diverges at reduction-order level (sharded psum vs
    # sequential line-search dots), amplified through signum TV gradients —
    # parity is judged at the quality bar, like the other mesh solvers.
    from super_resolution_tpu.evaluation import psnr

    p_ref = float(psnr(ref, np.asarray(gt)))
    p_sh = float(psnr(sharded, np.asarray(gt)))
    assert abs(p_ref - p_sh) < 0.1, (p_ref, p_sh)


def test_band_sharded_tv3d_c_local_one():
    """C == band-axis size: ONE real band + the spectral halo per shard —
    exercises the ``c_loc == 1`` branch of _spectral_halo_return and the
    kernel's minimum-channel halo path (ADVICE r2)."""
    x, obs, shifts_np, kernel = _problem(c=4)
    mesh = make_mesh({BAND_AXIS: 4}, jax.devices()[:4])
    regs = _regs_for("tv3d")
    weights = (jnp.asarray(np.random.default_rng(75).random(x.shape), jnp.float32),)

    vg_single = make_map_value_and_grad(
        obs, jnp.asarray(shifts_np, jnp.float32), jnp.asarray(kernel), 2,
        regs, static_shifts=shifts_np, use_pallas=True,
    )
    vg_sharded = make_band_sharded_pallas_vg(mesh, obs, shifts_np, kernel, 2, regs)
    c_ref, g_ref = vg_single(x, weights)
    c_s, g_s = vg_sharded(x, weights)
    assert abs(float(c_s) - float(c_ref)) < 1e-4 * max(1.0, abs(float(c_ref)))
    assert matrices_equal(np.asarray(g_s), np.asarray(g_ref), 1e-5)
    # Phase-plane IO over the same halo ring.
    vg_pl = make_band_sharded_pallas_vg(
        mesh, obs, shifts_np, kernel, 2, regs, phase_io=True
    )
    c_pp, g_pp = vg_pl.prepare(weights)(vg_pl.to_planes(x))
    assert abs(float(c_pp) - float(c_s)) < 1e-5 * max(1.0, abs(float(c_s)))
    assert matrices_equal(
        np.asarray(vg_pl.from_planes(g_pp)), np.asarray(g_s), 1e-5
    )


def test_band_sharded_explicit_tile_validated_for_halo():
    """A pinned tile sized without the spectral-halo channel must be rejected
    up front instead of blowing scoped VMEM at run time (ADVICE r2)."""
    x, obs, shifts_np, kernel = _problem(c=8)
    mesh = make_mesh({BAND_AXIS: 2}, jax.devices()[:2])
    regs = _regs_for("tv3d")
    with pytest.raises(ValueError, match="scoped limit"):
        make_band_sharded_pallas_vg(
            mesh, obs, shifts_np, kernel, 2, regs, pallas_tile=(1024, 2048)
        )


@pytest.mark.parametrize("reg_kind,expected_ar,expected_cp", [
    ("tv", 1, 0),    # band-separable: ONE cost psum per evaluation
    ("tv3d", 1, 2),  # + the one-band spectral halo ring (in + grad back)
])
def test_band_sharded_collective_counts(reg_kind, expected_ar, expected_cp):
    """The collective schedule is part of the design contract (SURVEY §2b:
    one scalar psum per evaluation on band meshes; 3D TV adds exactly two
    one-band ppermutes). Count collectives in the optimized HLO so the
    schedule cannot silently regress."""
    x, obs, shifts_np, kernel = _problem()
    mesh = make_mesh({BAND_AXIS: 4}, jax.devices()[:4])
    regs = _regs_for(reg_kind)
    weights = (jnp.ones_like(x),)
    vg = make_band_sharded_pallas_vg(mesh, obs, shifts_np, kernel, 2, regs)

    fn = jax.jit(lambda xx: vg(xx, weights))
    hlo = fn.lower(x).compile().as_text()
    n_all_reduce = hlo.count("all-reduce-start") or hlo.count("all-reduce(")
    n_permute = hlo.count("collective-permute-start") or hlo.count(
        "collective-permute("
    )
    assert n_all_reduce == expected_ar, hlo[:0] or (n_all_reduce, expected_ar)
    assert n_permute == expected_cp, (n_permute, expected_cp)
