"""Benchmarks for the BASELINE.json measurement configs on the available chip.

Default: prints ONE JSON line (the flagship MAP+TV throughput config — the
driver's contract). ``--all`` benches every config, one JSON line each,
EACH IN ITS OWN SUBPROCESS (one poisoned PJRT client must not corrupt later
configs' numbers — a single UNIMPLEMENTED op on the axon tunnel poisons
every later device_put in the process, measured); ``--config NAME`` benches
one in-process. Numbers are recorded in BENCH_CONFIGS.md.

Every config carries a QUALITY ANCHOR (``psnr_db`` of the benched solve's
actual output against ground truth) and the repeat ``spread`` ([min, max]
over the timed repeats) next to the point estimate — a TPU-side numerical
break now fails the bench, not just the CPU suite, and cross-session
comparisons carry their noise band (the chip/tunnel drifts ~5-7% between
sessions on identical cached programs).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
speedup over the ACTUAL C++ reference, which we built (-O3 -march=native,
single-threaded as written) and ran on this host (BASELINE_MEASURED.md):
0.79 Mpixel-iters/s on the 1000^2 4x MAP problem.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REFERENCE_MPIX_ITERS = 0.79  # measured C++ reference, BASELINE_MEASURED.md


def _dallas_problem(dtype, scale=4, shifts=((0, 0), (1, 1), (0, 1), (1, 0)),
                    rgb=False):
    import cv2
    import jax.numpy as jnp

    from super_resolution_tpu.models import ImageModel, ImageModelParameters
    from super_resolution_tpu.motion import MotionShiftSequence

    flag = cv2.IMREAD_COLOR if rgb else cv2.IMREAD_GRAYSCALE
    gt = cv2.imread("/root/reference/test_data/dallas.jpg", flag)
    gt = gt.astype(np.float32) / 255.0
    gt = np.moveaxis(gt, -1, 0) if rgb else gt[None]
    gt = jnp.asarray(gt, dtype)
    seq = MotionShiftSequence(list(shifts))
    model = ImageModel.create(
        ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.5,
                             motion_sequence=seq)
    )
    observations = jnp.stack([model.apply(gt, k) for k in range(len(shifts))])
    shifts_arr = jnp.asarray(seq.as_array(), dtype)
    kernel = jnp.asarray(model.blur_operator.kernel, dtype)
    return gt, observations, shifts_arr, kernel


def _psnr(a, b) -> float:
    from super_resolution_tpu.evaluation.metrics import psnr

    value = float(psnr(np.asarray(a), np.asarray(b)))
    # Exact reconstructions (e.g. shift-add re-interleaving noiseless integer
    # shifts) give PSNR = inf; cap it so the JSON line stays strict-parseable
    # (any numerical corruption drops the value below the cap).
    return round(min(value, 99.99), 2)


def _quality(result: dict, floor_db: float) -> dict:
    """Attach the config's quality FLOOR and a machine-readable verdict:
    a TPU-side numerical break (e.g. a Mosaic miscompile the interpret-mode
    CPU tests never execute) drops the benched solve's PSNR below the floor
    and FAILS the bench visibly, instead of shipping a fast wrong number.
    Floors sit ~1-2 dB under the recorded round-4 anchors — loose enough
    for iteration-count/threshold drift, tight enough that a corrupted
    gradient (tens of dB off) can't pass."""
    # Round 5: floors are REFERENCE-DERIVED wherever the C++ reference can
    # run the geometry. The A/B/C parity goldens anchor the map configs
    # (config C: reference 23.794 dB, BASELINE_MEASURED.md); the wavelet and
    # PCA geometries were run through the rebuilt reference itself
    # (/tmp/refbuild2 drivers, round 5): reference wavelet solve 18.17 dB,
    # reference PCA solve 17.14 dB on the identical inputs and iteration
    # budgets — each floor sits 0.25 dB under its reference number (the
    # north-star <=0.1 dB contract + session noise).
    result["psnr_floor_db"] = floor_db
    result["quality_ok"] = bool(result.get("psnr_db", 0.0) >= floor_db)
    if not result["quality_ok"]:
        print(
            f"QUALITY FAILURE: {result['metric']} psnr_db="
            f"{result.get('psnr_db')} < floor {floor_db}",
            file=sys.stderr, flush=True,
        )
    return result


# Production inner solver for every solve-throughput config (round 5):
# exact-step CG for the quadratic IRLS inner subproblem — ONE objective
# evaluation per iteration instead of the Wolfe search's measured 1.56,
# AND better per-iteration progress (measured on the wavelet geometry at 25
# iters, f64 CPU: linear_cg cost 204.9 / 18.20 dB vs Wolfe-CG 277.9 /
# 17.35 dB vs the C++ reference's ALGLIB CG 206.1 / 18.17 dB — the exact
# quadratic step beats both line searches). Quality floors below gate any
# regression.
SOLVER_METHOD = "linear_cg"


def _solve_throughput(observations, shifts, kernel, scale, regs, iters,
                      pallas_tile, hr_shape, dynamic_bound=None, repeats=3,
                      count_pixels=None, method=None, **vg_kwargs):
    """Mpixel-iters/s of a fixed-iteration fused-Pallas CG solve.

    Returns ``(best, spread, x_final)``: the best of ``repeats`` warm timed
    solves, the [min, max] spread across them, and the solved image (the
    quality anchor is computed from the BENCHED program's actual output).
    ``count_pixels`` overrides the element count per iteration (lane-padded
    geometries count only real pixels). ``dynamic_bound``: route through the
    SHIFT-GENERIC kernel (runtime SMEM tap tables, one executable per
    |shift| bound) instead of the trace-specialized one — the production
    path for estimated motion."""
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.solvers import make_map_value_and_grad, minimize

    use_pallas = jax.default_backend() != "cpu"
    weights = (jnp.ones(hr_shape, observations.dtype),) if regs else ()
    static_shifts = np.asarray(shifts)
    max_shift = max(3, int(np.ceil(np.max(np.abs(static_shifts)))) + 1)

    @jax.jit
    def solve(x0, observations, shifts, weights):
        vg = make_map_value_and_grad(
            observations, shifts, kernel, scale, regs, max_shift=max_shift,
            static_shifts=(
                static_shifts if use_pallas and dynamic_bound is None else None
            ),
            use_pallas=use_pallas,
            pallas_tile=pallas_tile if use_pallas else 0,
            pallas_shift_bound=(
                dynamic_bound if use_pallas and dynamic_bound is not None else 0.0
            ),
            # Production solver state: polyphase planes across the whole CG
            # solve (converted once at each boundary; numerically identical).
            phase_io=use_pallas,
            **vg_kwargs,
        )
        x_start = jnp.zeros(hr_shape, observations.dtype)
        if use_pallas:
            x_start = vg.to_planes(x_start)
        result = minimize(
            vg.prepare(weights), x_start,
            method=method or SOLVER_METHOD, max_iterations=iters,
            gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
            parameter_variation_threshold=0.0,
        )
        if use_pallas:
            result = result._replace(x=vg.from_planes(result.x))
        return result

    x0 = jnp.zeros(hr_shape, observations.dtype)
    result = solve(x0, observations, shifts, weights)  # compile + warm
    jax.block_until_ready(result.x)
    npix = int(count_pixels or np.prod(hr_shape))
    values = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        result = solve(x0, observations, shifts, weights)
        jax.block_until_ready(result.x)
        elapsed = time.perf_counter() - t0
        values.append(int(result.iterations) * npix / elapsed / 1e6)
    spread = [round(min(values), 3), round(max(values), 3)]
    return round(max(values), 3), spread, result.x


def bench_map_tv(dtype=np.float32, iters=50, repeats=3):
    """Flagship: dallas 4-frame 4x MAP + fused TV, CG (BASELINE config 2
    geometry at production scale)."""
    gt, observations, shifts, kernel = _dallas_problem(dtype)
    value, spread, x = _solve_throughput(
        observations, shifts, kernel, 4, _tv_regs(), iters,
        # Pinned tile: (512, 1024) beat (256, 1024) in BOTH sessions that
        # compared them on the full 50-iter solve (+4% r3 roofline, +5%
        # r4 probe maxima); (1024, 1024) blows the scoped VMEM limit. The
        # VMEM model over-estimates large static tiles (~37 MB est for a
        # tile that runs), so the auto ladder cannot pick this itself.
        (512, 1024), gt.shape, repeats=repeats,
    )
    return _quality({
        "metric": "map_solver_throughput_4x_dallas",
        "value": value,
        "unit": "Mpixel-iters/s/chip",
        "vs_baseline": round(value / REFERENCE_MPIX_ITERS, 3),
        "spread": spread,
        "psnr_db": _psnr(x, gt),
    }, floor_db=23.0)


def _tv_regs():
    from super_resolution_tpu.ops.tv import TotalVariationRegularizer

    return [(TotalVariationRegularizer(), 0.01)]


def bench_map_btv(dtype=np.float32, iters=50, repeats=3):
    """North-star quality geometry: dallas 4x MAP + fused BTV(range 3,
    decay 0.5) — BASELINE config 3 / the reference RegularizationTest
    setup (test_map_solver.cpp:369-481) at production size."""
    from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer

    gt, observations, shifts, kernel = _dallas_problem(dtype)
    regs = [(BilateralTotalVariationRegularizer(3, 0.5), 0.01)]
    # Pinned tile: the round-4 minimal margins shrink BTV's VMEM footprint
    # enough for (128, 1024) (estimated 12.5 MB; compiles fine), which
    # measured 1100 Mpix-it/s vs 893-928 for the auto ladder's (128, 512)
    # and 1019 at (256, 512) — the 9 MB auto budget is deliberately
    # conservative (the estimate has ~30% worst-case error vs scoped
    # allocations), so the bench pins the measured winner. (256, 1024)
    # still blows the 16 MB scoped limit (est 22.7 MB).
    value, spread, x = _solve_throughput(
        observations, shifts, kernel, 4, regs, iters, (128, 1024), gt.shape,
        repeats=repeats,
    )
    return _quality({
        "metric": "map_btv_throughput_4x_dallas",
        "value": value,
        "unit": "Mpixel-iters/s/chip",
        "vs_baseline": round(value / REFERENCE_MPIX_ITERS, 3),
        "spread": spread,
        "psnr_db": _psnr(x, gt),
    }, floor_db=23.0)


def bench_map_btv_estimated(dtype=np.float32, iters=50, repeats=3):
    """BASELINE config 3 VERBATIM + the round-4 'beat the reference' loop:
    RGB dallas, 4x, BTV IRLS geometry, *estimated* subpixel registration
    (phase correlation on the LR frames; LR-px shifts x scale = HR-px
    motion), solved with the SHIFT-GENERIC fused kernel — then the motion is
    REFINED against the solved HR estimate (damped Gauss-Newton on the data
    term, motion/refinement.py) and the solve resumes on the SAME compiled
    executable (shifts are runtime SMEM data; zero recompiles). The
    reference estimates once and never revisits (registration.cpp:161-201).

    Reports PSNR for the whole ladder: bilinear baseline, estimated-motion
    solve, refined-motion solve, known-true-motion solve — the refined
    solve's done-criterion is closing the gap to the known-motion solve."""
    import cv2
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.motion.refinement import make_shift_refiner
    from super_resolution_tpu.motion.registration import translational_registration
    from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
    from super_resolution_tpu.ops.pallas.degrade import shift_bound_bucket
    from super_resolution_tpu.solvers import make_map_value_and_grad, minimize

    scale = 4
    true_shifts = ((0, 0), (1.5, 0.5), (-0.75, 1.25), (0.5, -1.5))
    gt, observations, _, kernel = _dallas_problem(
        dtype, scale=scale, shifts=true_shifts, rgb=True
    )
    t_reg = time.perf_counter()
    est = translational_registration([np.asarray(observations[k]) for k in range(4)])
    est_hr = np.asarray(
        [[s.dx * scale, s.dy * scale] for s in est], np.float64
    )
    t_reg = time.perf_counter() - t_reg
    # +0.25 HR px of headroom lets the refinement clip freely without
    # jumping a power-of-two bucket (bucket 4 doubles the shift-generic
    # kernel's candidate fan-out: measured 360 vs 538 Mpix-it/s in-session).
    bound = float(shift_bound_bucket(float(np.max(np.abs(est_hr))) + 0.25))
    regs = [(BilateralTotalVariationRegularizer(3, 0.5), 0.01)]
    use_pallas = jax.default_backend() != "cpu"
    weights = (jnp.ones(gt.shape, dtype),)

    @jax.jit
    def solve(x0, shifts):
        vg = make_map_value_and_grad(
            observations, shifts, kernel, scale, regs, max_shift=4,
            use_pallas=use_pallas, pallas_shift_bound=bound if use_pallas else 0.0,
            phase_io=use_pallas,
        )
        x_start = vg.to_planes(x0) if use_pallas else x0
        result = minimize(
            vg.prepare(weights), x_start, method=SOLVER_METHOD,
            max_iterations=iters,
            gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
            parameter_variation_threshold=0.0,
        )
        if use_pallas:
            result = result._replace(x=vg.from_planes(result.x))
        return result

    x0 = jnp.zeros(gt.shape, dtype)
    est_j = jnp.asarray(est_hr, dtype)
    result = solve(x0, est_j)  # compile + warm
    jax.block_until_ready(result.x)
    values = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        result = solve(x0, est_j)
        jax.block_until_ready(result.x)
        values.append(
            int(result.iterations) * gt.size / (time.perf_counter() - t0) / 1e6
        )
    x_est = result.x

    # The refinement loop: alternate Gauss-Newton against the current solve
    # with re-solves — every round reuses the SAME two executables (shifts
    # are a traced argument of `solve`; x/shifts of the refiner). Multiple
    # rounds matter: x absorbs part of the motion error, so the fixed-point
    # iteration contracts geometrically (measured ~0.5-0.65x/round on
    # under-determined stacks, experiments/tpu_refine_loo.py).
    refiner = make_shift_refiner(kernel, scale, num_iterations=2, max_shift=4)
    t_ref = time.perf_counter()
    refined = est_j
    x_refined = x_est
    err_trajectory = []
    for _ in range(4):
        refined = jnp.clip(
            refiner(x_refined, observations, refined), -bound, bound
        )
        result_r = solve(x0, refined)
        x_refined = result_r.x
        err_trajectory.append(round(float(
            np.max(np.abs(np.asarray(refined) - np.asarray(true_shifts)))
        ), 4))
    jax.block_until_ready(x_refined)
    t_ref = time.perf_counter() - t_ref

    # Anchors: known-true-motion solve (upper bound), bilinear baseline.
    x_true = solve(x0, jnp.asarray(true_shifts, dtype)).x
    bilinear = jnp.asarray(
        np.moveaxis(
            cv2.resize(
                np.moveaxis(np.asarray(observations[0]), 0, -1),
                (gt.shape[2], gt.shape[1]), interpolation=cv2.INTER_LINEAR,
            ),
            -1, 0,
        ),
        dtype,
    )

    err_est = float(np.max(np.abs(est_hr - np.asarray(true_shifts))))
    err_ref = float(np.max(np.abs(np.asarray(refined) - np.asarray(true_shifts))))
    value = round(max(values), 3)
    return _quality({
        "metric": "map_btv_estimated_motion_throughput_4x_dallas_rgb",
        "value": value,
        "unit": "Mpixel-iters/s/chip",
        "vs_baseline": round(value / REFERENCE_MPIX_ITERS, 3),
        "spread": [round(min(values), 3), round(max(values), 3)],
        "registration_seconds": round(t_reg, 3),
        "registration_max_err_hr_px": round(err_est, 4),
        "refined_max_err_hr_px": round(err_ref, 4),
        "refined_err_trajectory": err_trajectory,
        "refine_and_resolve_seconds": round(t_ref, 3),
        "shift_bound": bound,
        "psnr_db": _psnr(x_refined, gt),
        "psnr_bilinear_db": _psnr(bilinear, gt),
        "psnr_estimated_db": _psnr(x_est, gt),
        "psnr_known_motion_db": _psnr(x_true, gt),
    }, floor_db=24.0)


def bench_hyperspectral(dtype=np.float32, iters=20, bands=64, repeats=3):
    """BASELINE config 4 geometry on one chip: 64-band MAP solve with the
    channel-blocked fused kernel (per-channel solving semantics,
    irls_map_solver.cpp:200-229; band sharding adds devices, this measures
    the per-chip kernel)."""
    import cv2
    import jax.numpy as jnp

    from super_resolution_tpu.models import ImageModel, ImageModelParameters
    from super_resolution_tpu.motion import MotionShiftSequence

    base = cv2.imread("/root/reference/test_data/dallas_half.jpg",
                      cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
    base = base[:256, :256]
    rng = np.random.default_rng(0)
    gains = rng.uniform(0.5, 1.5, size=(bands, 1, 1)).astype(np.float32)
    gt = jnp.asarray(base[None] * gains, dtype)  # synthetic correlated bands
    seq = MotionShiftSequence([(0, 0), (1, 1), (0, 1), (1, 0)])
    scale = 2
    model = ImageModel.create(
        ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.5,
                             motion_sequence=seq)
    )
    observations = jnp.stack([model.apply(gt, k) for k in range(4)])
    shifts = jnp.asarray(seq.as_array(), dtype)
    kernel = jnp.asarray(model.blur_operator.kernel, dtype)
    value, spread, x = _solve_throughput(
        observations, shifts, kernel, scale, _tv_regs(), iters, 0, gt.shape,
        repeats=repeats,
    )
    # Mpixel counts all bands: bands x H x W per iteration.
    return _quality({
        "metric": f"map_hyperspectral_{bands}band_throughput",
        "value": value,
        "unit": "Mpixel-iters/s/chip",
        "vs_baseline": round(value / REFERENCE_MPIX_ITERS, 3),
        "spread": spread,
        "psnr_db": _psnr(x, gt),
    }, floor_db=31.0)


def bench_hyperspectral_pca(dtype=np.float32, iters=20, bands=64, repeats=3):
    """BASELINE config 4 VERBATIM: ENVI data with spectral PCA.

    The reference's example ENVI cube is a 9x5x10 unit-test fixture, so a
    production-scale synthetic (64 bands, 512^2, low spectral rank like real
    HSI) is WRITTEN through spectral/envi.py, LOADED back through
    HyperspectralDataLoader (native streaming reader when available), PCA-
    projected (spectral_pca.cpp:165-189 semantics), solved channel-blocked
    in PCA space, back-projected to the full cube and compared against the
    ground-truth cube (the end-to-end quality anchor). I/O + PCA time are
    reported separately; the throughput metric counts the solved PCA-space
    elements."""
    import tempfile

    import cv2
    import jax.numpy as jnp

    from super_resolution_tpu.models import ImageModel, ImageModelParameters
    from super_resolution_tpu.motion import MotionShiftSequence
    from super_resolution_tpu.spectral import HyperspectralDataLoader, SpectralPCA

    base = cv2.imread("/root/reference/test_data/dallas.jpg",
                      cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
    # Low-spectral-rank cube like real HSI: 4 spatial abundance maps (image
    # patches) mixed by smooth spectral signatures + small iid noise.
    # 512^2: PCA collapses 64 bands to ~4, so a 256^2 cube left the chip
    # dispatch-bound in the solve (measured 200 Mpix-it/s); production HSI
    # frames are megapixel-scale.
    h = w = 512
    maps = np.stack([
        base[:h, :w], base[128 : 128 + h, 64 : 64 + w],
        base[32 : 32 + h, 256 : 256 + w], base[192 : 192 + h, 128 : 128 + w],
    ])  # [4, H, W]
    lam = np.linspace(0.0, 1.0, bands)[:, None]
    sigs = np.stack([
        np.exp(-((lam - mu) ** 2) / (2 * 0.18**2)) for mu in (0.15, 0.4, 0.65, 0.9)
    ], axis=-1)[:, 0, :]  # [bands, 4]
    rng = np.random.default_rng(7)
    cube = (sigs @ maps.reshape(4, -1)).reshape(bands, h, w)
    cube += 0.002 * rng.standard_normal(cube.shape)
    cube = cube.astype(np.float32)

    tmp = tempfile.mkdtemp(prefix="srtpu_envi_")
    path = os.path.join(tmp, "bench_cube")
    t_io = time.perf_counter()
    HyperspectralDataLoader(path).save_image(cube)
    loader = HyperspectralDataLoader(path + ".config")
    loader.load_image_from_envi_file()
    gt = jnp.asarray(np.asarray(loader.get_image().array), dtype)
    t_io = time.perf_counter() - t_io

    seq = MotionShiftSequence([(0, 0), (1, 1), (0, 1), (1, 0)])
    scale = 2
    model = ImageModel.create(
        ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.5,
                             motion_sequence=seq)
    )
    observations = jnp.stack([model.apply(gt, k) for k in range(4)])
    shifts = jnp.asarray(seq.as_array(), dtype)
    kernel = jnp.asarray(model.blur_operator.kernel, dtype)

    # PCA trained from the LR observations (what a real pipeline has),
    # 99.9% retained variance (test_spectral_pca.cpp:104-107 semantics).
    t_pca = time.perf_counter()
    pca = SpectralPCA([np.asarray(o) for o in observations],
                      retained_variance=0.999)
    k_pca = pca.num_pca_bands
    obs_pca = jnp.stack([pca.project(observations[k]) for k in range(4)])
    t_pca = time.perf_counter() - t_pca

    hr_pca = (k_pca, h, w)
    # Pinned (256, 512) x 1-band channel grid: +12% over the auto choice on
    # the 4-band 512^2 s=2 geometry (633 vs 563 Mpix-it/s, r4 probe) — the
    # conservative channel-grid VMEM budget keeps auto at (128, 512).
    value, spread, x_pca = _solve_throughput(
        obs_pca, shifts, kernel, scale, _tv_regs(), iters, (256, 512), hr_pca,
        repeats=repeats, pallas_channel_block=1,
    )
    # End-to-end quality anchor: the SOLVED PCA-space image back-projected
    # to the full spectral cube vs the ground-truth cube (one matmul,
    # untimed), plus the projection round trip alone for attribution.
    recon_solve = pca.back_project(x_pca)
    recon_rt = pca.back_project(pca.project(gt))
    return _quality({
        "metric": f"map_hyperspectral_pca_{bands}band_throughput",
        "value": value,
        "unit": "Mpixel-iters/s/chip",
        "vs_baseline": round(value / REFERENCE_MPIX_ITERS, 3),
        "spread": spread,
        "num_pca_bands": int(k_pca),
        "envi_io_seconds": round(t_io, 3),
        "pca_seconds": round(t_pca, 3),
        "psnr_db": _psnr(recon_solve, gt),
        "pca_roundtrip_psnr_db": _psnr(recon_rt, gt),
        # The C++ reference (SpectralPca + IRLS, identical cube/budget)
        # measures 17.14 dB here (round-5 driver); floor = ref - 0.25.
    }, floor_db=16.9)


def bench_shift_add(dtype=np.float32, repeats=3):
    """BASELINE config 1: shift-add fusion of a 4-frame dallas_qtr stack,
    2x, known motion (shift_add_fusion.cpp behavior). One-shot op: Mpixel/s
    of fused HR output. The frames are REAL degraded observations (decimated
    shifted copies of the image), so the fused HR output carries a PSNR
    anchor against the original."""
    import cv2
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.motion import MotionShiftSequence
    from super_resolution_tpu.ops.resize import decimate
    from super_resolution_tpu.ops.warp import translate_static
    from super_resolution_tpu.solvers.shift_add import shift_add_fusion

    img = cv2.imread("/root/reference/test_data/dallas_qtr.jpg",
                     cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
    gt = jnp.asarray(img[None], dtype)
    seq = MotionShiftSequence([(0, 0), (1, 1), (0, 1), (1, 0)])
    shifts = np.asarray(seq.as_array())
    # LR frames: shift-then-decimate (no blur — shift-add's model,
    # shift_add_fusion.cpp) so fusion re-interleaves the true HR samples.
    frames = jnp.stack([
        decimate(translate_static(gt, float(dx), float(dy)), 2)[0]
        for dx, dy in shifts
    ])

    fuse = jax.jit(lambda f: shift_add_fusion(f, shifts, 2))
    out = jax.block_until_ready(fuse(frames))
    reps = 50
    values = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fuse(frames)
        jax.block_until_ready(out)
        elapsed = (time.perf_counter() - t0) / reps
        hr_pixels = out.shape[-1] * out.shape[-2]
        values.append(hr_pixels / elapsed / 1e6)
    # Interior PSNR (the warp's border rows are zero-padding artifacts, as
    # in the reference's border-cropped comparisons, test_util.cpp).
    crop = (slice(None), slice(4, -4), slice(4, -4))
    gt_c = np.asarray(gt[0])[None][crop]
    out_c = np.asarray(out)[None][crop] if out.ndim == 2 else np.asarray(out)[crop]
    return _quality({
        "metric": "shift_add_fusion_throughput_2x_dallas_qtr",
        "value": round(max(values), 3),
        "unit": "Mpixel/s/chip",
        "vs_baseline": None,
        "spread": [round(min(values), 3), round(max(values), 3)],
        "psnr_db": _psnr(out_c, gt_c),
    }, floor_db=60.0)


def bench_wavelet(dtype=np.float32, iters=25, repeats=3, pad_to=512,
                  channel_block=0, tile=0):
    """BASELINE config 5 single-chip element: wavelet-domain MAP solve.

    The reference loops the four subbands serially
    (super_resolution.cpp:201-267); the subband objectives are fully
    channel-separable (same model, same motion, 2D TV never mixes channels),
    so LL/LH/HL/HH are STACKED as 4 channels of ONE solve — the fused
    kernel's channel-block grid batches them (round 3: 2.9x the serial
    form). Round 4: the 500^2 subband geometry is LANE-ALIGNED by zero-
    padding the problem to ``pad_to``^2 (125-wide LR planes pad to exactly
    128 vector lanes); the throughput metric counts REAL pixels only, so
    padding overhead shows up honestly. ``channel_block``/``tile`` expose
    the kernel grid knobs for measurement (0 = automatic)."""
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.wavelet.haar import wavelet_transform

    gt, observations, shifts, kernel = _dallas_problem(dtype)
    # [K, 4, h/2, w/2]: the four subbands of each (grayscale) observation
    # ride the channel axis of one stacked solve.
    subbands = jax.vmap(
        lambda y: jnp.concatenate(tuple(wavelet_transform(y)), axis=0), in_axes=0
    )(observations)
    hr_sub = (4 * gt.shape[0], gt.shape[1] // 2, gt.shape[2] // 2)
    real_pixels = int(np.prod(hr_sub))
    scale = 4
    if pad_to and pad_to > hr_sub[1]:
        pad_lr = (pad_to - hr_sub[1]) // scale
        subbands = jnp.pad(
            subbands, [(0, 0), (0, 0), (0, pad_lr), (0, pad_lr)]
        )
        hr_sub = (hr_sub[0], pad_to, pad_to)

    value, spread, x = _solve_throughput(
        subbands, shifts, kernel, scale, _tv_regs(), iters, tile, hr_sub,
        repeats=repeats, count_pixels=real_pixels,
        pallas_channel_block=channel_block,
    )
    # Quality anchor: the solved subbands against the ground truth's own
    # wavelet subbands (interior crop: the zero-padded rim pulls the border
    # of the padded solve toward zero, which is padding bias, not a kernel
    # break).
    gt_sub = np.asarray(
        jnp.concatenate(tuple(wavelet_transform(gt)), axis=0)
    )
    hs = gt_sub.shape[1]
    x_real = np.asarray(x)[:, :hs, :hs]
    crop = (slice(None), slice(2, -2), slice(2, -2))
    return _quality({
        "metric": "map_wavelet_domain_throughput_4x_dallas",
        "value": value,
        "unit": "Mpixel-iters/s/chip",
        "vs_baseline": round(value / REFERENCE_MPIX_ITERS, 3),
        "spread": spread,
        # The C++ reference (its own WaveletTransform + IRLS on the same
        # stacked-subband problem and budget) measures 18.17 dB (round-5
        # driver); floor = ref - 0.25. Reaching it REQUIRES the exact-step
        # linear_cg inner solver — the Wolfe CG undershoots to 17.35 dB at
        # this budget on the mixed-scale subband channels.
        "psnr_db": _psnr(x_real[crop], gt_sub[crop]),
    }, floor_db=17.9)


def bench_video(dtype=np.float32, num_frames=8, repeats=1):
    """Video super-resolution (the reference's dead ``video/super_resolver``
    wrapper made functional, ``super_resolver.cpp:14-72`` intent): a camera
    panning over dallas_half, super-resolved frame by frame with the
    sliding-window MAP+BTV pipeline — per-window phase-correlation
    registration + IRLS solve on the shift-generic fused kernel.

    The metric is steady-state output frames/s over frames 1..N-1: frame 0
    pays the one-time build, and every later window reuses the SAME compiled
    executable through the module-wide solver cache (shift VALUES are
    excluded from the key on the shift-generic path — the cache exists for
    exactly this workload). ``pallas_shift_bound`` is pinned to one bucket
    so window-to-window motion spread cannot silently split executables.

    Quality anchor: mean PSNR of the output frames against the ground truth
    warped to each frame's pose (interior crop — the pan slides content in
    and out of the border)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.models import ImageModel, ImageModelParameters
    from super_resolution_tpu.motion import MotionShiftSequence
    from super_resolution_tpu.ops.warp import translate_static
    from super_resolution_tpu.video.super_resolver import VideoSuperResolver
    from super_resolution_tpu.solvers.map_solver import IRLSMapSolverOptions

    scale = 2
    gt = cv2.imread("/root/reference/test_data/dallas_half.jpg",
                    cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
    gt = jnp.asarray(gt[None], dtype)
    # Slow fractional pan, bounded so every window's motion stays inside
    # one shift-generic bucket (max relative HR shift < 2).
    rng = np.random.default_rng(3)
    drift = np.cumsum(rng.uniform(-0.6, 0.6, size=(num_frames, 2)), axis=0)
    drift -= drift[0]
    drift = np.clip(drift, -1.5, 1.5)
    seq = MotionShiftSequence([tuple(d) for d in drift])
    model = ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.0,
                                 motion_sequence=seq)
    gen = ImageModel.create(model)
    frames = np.stack([np.asarray(gen.apply(gt, k)) for k in range(num_frames)])

    vsr = VideoSuperResolver(
        scale=scale, temporal_window=4, blur_radius=3, blur_sigma=1.0,
        btv_scale_range=2, btv_spatial_decay=0.7,
        regularization_parameter=0.01,
        solver_options=IRLSMapSolverOptions(
            max_num_irls_iterations=2, max_num_solver_iterations=15,
            # Fixed budget (deterministic work per frame) + one pinned
            # shift bucket (one executable for every window).
            irls_cost_difference_threshold=0.0,
            gradient_norm_threshold=0.0, parameter_variation_threshold=0.0,
            cost_decrease_threshold=0.0,
            pallas_shift_bound=2.0,
            # One dispatch per window: the whole 2-IRLS-iteration solve as
            # a single fused graph (each host-loop IRLS iteration costs a
            # ~25 ms tunnel round trip — a large slice of a 500^2 frame).
            fused_irls=True,
            least_squares_solver="linear_cg",
        ),
    )

    t_build = time.perf_counter()
    outputs = [vsr.super_resolve_frame(frames, 0)]  # build + warm
    t_build = time.perf_counter() - t_build
    t0 = time.perf_counter()
    for i in range(1, num_frames):
        outputs.append(vsr.super_resolve_frame(frames, i))
    elapsed = time.perf_counter() - t0
    fps = (num_frames - 1) / elapsed

    # Anchor: each output against the gt warped to that frame's pose.
    crop = (slice(None), slice(4, -4), slice(4, -4))
    psnrs = []
    for i in range(num_frames):
        pose = translate_static(gt, float(drift[i][0] * scale),
                                float(drift[i][1] * scale))
        psnrs.append(_psnr(np.asarray(outputs[i])[crop], np.asarray(pose)[crop]))
    return _quality({
        "metric": "video_sliding_window_fps_2x_dallas_half",
        "value": round(fps, 3),
        "unit": "frames/s",
        # The reference's video path never ran (dead wrapper) — no baseline.
        "vs_baseline": None,
        "frames": num_frames,
        "build_and_first_frame_seconds": round(t_build, 3),
        "psnr_db": round(float(np.mean(psnrs)), 2),
        "psnr_per_frame_db": psnrs,
    }, floor_db=24.0)


def bench_scaling(dtype=np.float32, iters=5, repeats=2, device_counts=None,
                  hr=64, frames=8):
    """North-star scaling harness (BASELINE.json: near-linear frames/s at
    1 chip -> 1 host -> >=2 hosts): the frame-sharded fused-Pallas solve
    (shift-generic kernel, per-device shifts as SMEM data, cost+grad psum)
    over 1..N-device FRAME meshes, emitting frame-iters/s per device count
    plus the per-evaluation collective counts from the optimized HLO (the
    schedule contract: counts must stay FLAT as N grows — the psums are
    scalar/one-image regardless of mesh size).

    Real multi-chip hardware absent (the axon tunnel exposes ONE chip), the
    harness forces N virtual CPU devices — validating the SPMD program and
    the collective schedule it would run on a pod slice, where this config
    runs unchanged (set SRTPU_SCALING_REAL=1 to use the live backend's
    devices). CPU-virtual timings are NOT chip numbers; the collective
    counts and the program structure are the artifact. Reference anchor:
    the serial frame loop this parallelizes (objective_data_term.cpp:104-115).
    """
    import jax

    already_cpu = getattr(jax.config, "jax_platforms", None) == "cpu"
    if not int(os.environ.get("SRTPU_SCALING_REAL", "0")) and not already_cpu:
        # Force virtual CPU devices BEFORE any backend init (the axon
        # sitecustomize pins a 1-chip tunnel; jax.devices() would block on
        # the handshake). Mirrors __graft_entry__.dryrun_multichip. Skipped
        # when the process already runs on CPU (pytest conftest: 8 virtual
        # devices) — clear_backends there would destroy live arrays and
        # shrink the device count for everything after us in the process.
        import jax._src.api as _api

        jax.config.update("jax_platforms", "cpu")
        _api.clear_backends()
        try:
            jax.config.update("jax_num_cpu_devices", frames)
        except RuntimeError:
            pass  # backend already live: use its devices
    import jax.numpy as jnp

    from super_resolution_tpu.models import ImageModel, ImageModelParameters
    from super_resolution_tpu.motion import MotionShiftSequence
    from super_resolution_tpu.ops.tv import TotalVariationRegularizer
    from super_resolution_tpu.parallel import FRAME_AXIS, make_mesh
    from super_resolution_tpu.parallel.pallas_sharded import (
        make_frame_sharded_pallas_vg,
    )
    from super_resolution_tpu.solvers import minimize

    devices = jax.devices()
    n_max = min(len(devices), frames)
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_max]
    env = "real" if int(os.environ.get("SRTPU_SCALING_REAL", "0")) else "cpu-virtual"

    rng = np.random.default_rng(5)
    scale = 2
    gt = jnp.asarray(rng.random((1, hr, hr)), dtype)
    seq = MotionShiftSequence(
        [(0.0, 0.0)] + [tuple(rng.uniform(-1.5, 1.5, 2)) for _ in range(frames - 1)]
    )
    model = ImageModel.create(
        ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.0,
                             motion_sequence=seq)
    )
    observations = jnp.stack([model.apply(gt, k) for k in range(frames)])
    shifts = jnp.asarray(seq.as_array(), dtype)
    kernel = jnp.asarray(model.blur_operator.kernel, dtype)
    regs = [(TotalVariationRegularizer(), 0.01)]
    weights = (jnp.ones(gt.shape, dtype),)

    points = []
    for n in device_counts:
        mesh = make_mesh({FRAME_AXIS: n}, devices[:n])
        from super_resolution_tpu.parallel.data_parallel import shard_problem

        x0, obs_n, shifts_n = shard_problem(
            mesh, jnp.zeros(gt.shape, dtype), observations, shifts
        )
        vg = make_frame_sharded_pallas_vg(
            mesh, obs_n, shifts_n, kernel, scale, regs, shift_bound=2.0,
            phase_io=True,
        )

        @jax.jit
        def solve(x0, w):
            result = minimize(
                vg.prepare(w), vg.to_planes(x0), method="cg",
                max_iterations=iters, gradient_norm_threshold=0.0,
                cost_decrease_threshold=0.0, parameter_variation_threshold=0.0,
            )
            return result._replace(x=vg.from_planes(result.x))

        # Collective counts from the optimized HLO (the schedule contract).
        hlo = solve.lower(x0, weights).compile().as_text()
        n_ar = hlo.count("all-reduce-start") or hlo.count("all-reduce(")
        n_cp = hlo.count("collective-permute-start") or hlo.count(
            "collective-permute("
        )
        result = solve(x0, weights)
        jax.block_until_ready(result.x)
        best = np.inf
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            result = solve(x0, weights)
            jax.block_until_ready(result.x)
            best = min(best, time.perf_counter() - t0)
        points.append({
            "devices": n,
            "frame_iters_per_s": round(frames * int(result.iterations) / best, 1),
            # STATIC program counts (the psums live inside the CG while_loop
            # body, so this is the per-evaluation schedule): must stay flat
            # as the mesh grows.
            "all_reduce": n_ar,
            "collective_permute": n_cp,
        })
    return {
        "metric": "scaling_frame_mesh_frame_iters",
        "value": points[-1]["frame_iters_per_s"],
        "unit": f"frame-iters/s@{points[-1]['devices']}dev",
        "vs_baseline": None,
        "environment": env,
        "points": points,
    }


CONFIGS = {
    "map_tv": bench_map_tv,
    "map_btv": bench_map_btv,
    "map_btv_estimated": bench_map_btv_estimated,
    "hyperspectral": bench_hyperspectral,
    "hyperspectral_pca": bench_hyperspectral_pca,
    "shift_add": bench_shift_add,
    "wavelet": bench_wavelet,
    "video": bench_video,
    "scaling": bench_scaling,
}


def _run_one(name: str, repeats: int) -> None:
    """Run one config in this process and print its JSON line."""
    import jax

    # Persistent compilation cache: this environment's remote-compile path
    # takes minutes for the large solver program; cache it across runs.
    cache_dir = os.environ.get("SRTPU_COMPILE_CACHE", "/tmp/srtpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    print(json.dumps(CONFIGS[name](repeats=repeats)), flush=True)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--all", action="store_true",
                        help="bench every BASELINE config (one line each), "
                             "each in its own subprocess (PJRT poisoning "
                             "isolation; the compile cache is shared)")
    parser.add_argument("--config", choices=sorted(CONFIGS),
                        help="bench one named config in-process")
    parser.add_argument("--repeats", type=int, default=3,
                        help="timed warm repeats per measurement; max is "
                             "reported, [min, max] spread is recorded "
                             "(~2-7% shared-chip/tunnel noise)")
    args = parser.parse_args()

    if not args.all:
        _run_one(args.config or "map_tv", args.repeats)
        return

    # --all: one subprocess per config. CLAUDE.md's measured failure mode:
    # one UNIMPLEMENTED op poisons the PJRT client for every later
    # device_put in the same process — isolation keeps one broken config
    # from silently corrupting every later number.
    import subprocess

    for name in sorted(CONFIGS):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--config", name,
                 "--repeats", str(args.repeats)],
                capture_output=True, text=True, timeout=3600,
            )
        except subprocess.TimeoutExpired as e:
            # A hung tunnel/compile must not abort the sweep NOR break the
            # one-line-per-config contract.
            sys.stderr.write((e.stderr or b"").decode() if isinstance(
                e.stderr, bytes) else (e.stderr or ""))
            print(json.dumps({"metric": name, "value": None,
                              "error": "timeout 3600s"}), flush=True)
            continue
        line = None
        for out_line in (proc.stdout or "").splitlines():
            out_line = out_line.strip()
            if out_line.startswith("{"):
                line = out_line  # last JSON line wins
        if proc.returncode == 0 and line:
            print(line, flush=True)
        else:
            # One machine-readable line per requested config, even on
            # failure (consumers count lines).
            sys.stderr.write(proc.stderr or "")
            print(json.dumps({
                "metric": name,
                "value": None,
                "error": f"exit {proc.returncode}",
            }), flush=True)


if __name__ == "__main__":
    main()
