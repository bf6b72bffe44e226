"""Benchmarks for the BASELINE.json measurement configs on the available chip.

Default: prints ONE JSON line (the flagship MAP+TV throughput config — the
driver's contract). ``--all`` benches every config, one JSON line each;
``--config NAME`` benches one. Numbers are recorded in BENCH_CONFIGS.md.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
speedup over the ACTUAL C++ reference, which we built (-O3 -march=native,
single-threaded as written) and ran on this host (BASELINE_MEASURED.md):
0.79 Mpixel-iters/s on the 1000^2 4x MAP problem.
"""

import argparse
import json
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


def _solve_throughput(observations, shifts, kernel, scale, regs, iters,
                      pallas_tile, hr_shape, **vg_kwargs):
    """Mpixel-iters/s of a fixed-iteration fused-Pallas CG solve."""
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.solvers import make_map_value_and_grad, minimize

    use_pallas = jax.default_backend() != "cpu"
    weights = (jnp.ones(hr_shape, observations.dtype),) if regs else ()
    static_shifts = np.asarray(shifts)

    @jax.jit
    def solve(x0, observations, shifts, weights):
        vg = make_map_value_and_grad(
            observations, shifts, kernel, scale, regs, max_shift=3,
            static_shifts=static_shifts if use_pallas else None,
            use_pallas=use_pallas,
            pallas_tile=pallas_tile if use_pallas else 0,
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
            method="cg", max_iterations=iters,
            gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
            parameter_variation_threshold=0.0,
        )
        if use_pallas:
            result = result._replace(x=vg.from_planes(result.x))
        return result

    x0 = jnp.zeros(hr_shape, observations.dtype)
    result = solve(x0, observations, shifts, weights)
    jax.block_until_ready(result.x)
    t0 = time.perf_counter()
    result = solve(x0, observations, shifts, weights)
    jax.block_until_ready(result.x)
    elapsed = time.perf_counter() - t0
    n_iters = int(result.iterations)
    # Mpixel counts every solved element (bands x H x W).
    return n_iters * int(np.prod(hr_shape)) / elapsed / 1e6


def bench_map_tv(dtype=np.float32, iters=50):
    """Flagship: dallas 4-frame 4x MAP + fused TV, CG (BASELINE config 2
    geometry at production scale)."""
    gt, observations, shifts, kernel = _dallas_problem(dtype)
    value = _solve_throughput(
        observations, shifts, kernel, 4, _tv_regs(), iters,
        # Wide-short tiles map onto the 128-wide lanes; (256, 1024) measured
        # fastest on the full 50-iter solve (experiments/tpu_tile_sweep.py).
        (256, 1024), gt.shape,
    )
    return {
        "metric": "map_solver_throughput_4x_dallas",
        "value": round(value, 3),
        "unit": "Mpixel-iters/s/chip",
        "vs_baseline": round(value / REFERENCE_MPIX_ITERS, 3),
    }


def _tv_regs():
    from super_resolution_tpu.ops.tv import TotalVariationRegularizer

    return [(TotalVariationRegularizer(), 0.01)]


def bench_map_btv(dtype=np.float32, iters=50):
    """North-star quality geometry: dallas 4x MAP + fused BTV(range 3,
    decay 0.5) — BASELINE config 3 / the reference RegularizationTest
    setup (test_map_solver.cpp:369-481) at production size."""
    from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer

    gt, observations, shifts, kernel = _dallas_problem(dtype)
    regs = [(BilateralTotalVariationRegularizer(3, 0.5), 0.01)]
    # Automatic tile: BTV's window planes + intermediates don't fit at the
    # TV bench's pinned (256, 1024) (measured 21.11 MB scoped > 16 MB).
    value = _solve_throughput(
        observations, shifts, kernel, 4, regs, iters, 0, gt.shape
    )
    return {
        "metric": "map_btv_throughput_4x_dallas",
        "value": round(value, 3),
        "unit": "Mpixel-iters/s/chip",
        "vs_baseline": round(value / REFERENCE_MPIX_ITERS, 3),
    }


def bench_hyperspectral(dtype=np.float32, iters=20, bands=64):
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
    value = _solve_throughput(
        observations, shifts, kernel, scale, _tv_regs(), iters, 0, gt.shape
    )
    # Mpixel counts all bands: bands x H x W per iteration.
    return {
        "metric": f"map_hyperspectral_{bands}band_throughput",
        "value": round(value, 3),
        "unit": "Mpixel-iters/s/chip",
        "vs_baseline": round(value / REFERENCE_MPIX_ITERS, 3),
    }


def bench_shift_add(dtype=np.float32):
    """BASELINE config 1: shift-add fusion of the 4-frame dallas_qtr stack,
    2x, known motion (shift_add_fusion.cpp behavior). One-shot op: Mpixel/s
    of fused HR output."""
    import cv2
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.motion import MotionShiftSequence
    from super_resolution_tpu.solvers.shift_add import shift_add_fusion

    img = cv2.imread("/root/reference/test_data/dallas_qtr.jpg",
                     cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
    gt = jnp.asarray(img[None], dtype)
    seq = MotionShiftSequence([(0, 0), (1, 1), (0, 1), (1, 0)])
    frames = jnp.stack([gt[0]] * 4)  # [K, H, W]; content irrelevant here
    shifts = np.asarray(seq.as_array())

    fuse = jax.jit(lambda f: shift_add_fusion(f, shifts, 2))
    out = jax.block_until_ready(fuse(frames))
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fuse(frames)
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / reps
    hr_pixels = out.shape[-1] * out.shape[-2]
    return {
        "metric": "shift_add_fusion_throughput_2x_dallas_qtr",
        "value": round(hr_pixels / elapsed / 1e6, 3),
        "unit": "Mpixel/s/chip",
        "vs_baseline": None,
    }


def bench_wavelet(dtype=np.float32, iters=25):
    """BASELINE config 5 single-chip element: wavelet-domain MAP solve — 4
    subband solves at half resolution (super_resolution.cpp:201-267
    semantics), fused-TV kernel per subband."""
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.wavelet.haar import (
        inverse_wavelet_transform,
        wavelet_transform,
    )

    gt, observations, shifts, kernel = _dallas_problem(dtype)
    # Subband stacks: DWT of each observation; solve each subband at the
    # same scale (the reference solves 4 independent problems).
    subbands = jax.vmap(
        lambda y: jnp.stack(tuple(wavelet_transform(y))), in_axes=0
    )(observations)
    hr_sub = (gt.shape[0], gt.shape[1] // 2, gt.shape[2] // 2)

    total_pixels = 0
    t_total = 0.0
    for b in range(4):
        obs_b = subbands[:, b]
        value = _solve_throughput(
            obs_b, shifts, kernel, 4, _tv_regs(), iters, 0, hr_sub
        )
        # value = Mpix-iters/s for this subband; accumulate as time.
        px_iters = hr_sub[-1] * hr_sub[-2] * iters
        t_total += px_iters / (value * 1e6)
        total_pixels += px_iters
    # idwt sanity (excluded from timing; trivial cost).
    from super_resolution_tpu.wavelet.haar import WaveletCoefficients

    _ = inverse_wavelet_transform(
        WaveletCoefficients(*[jnp.zeros(hr_sub, dtype) for _ in range(4)])
    )
    value = total_pixels / t_total / 1e6
    return {
        "metric": "map_wavelet_domain_throughput_4x_dallas",
        "value": round(value, 3),
        "unit": "Mpixel-iters/s/chip",
        "vs_baseline": round(value / REFERENCE_MPIX_ITERS, 3),
    }


CONFIGS = {
    "map_tv": bench_map_tv,
    "map_btv": bench_map_btv,
    "hyperspectral": bench_hyperspectral,
    "shift_add": bench_shift_add,
    "wavelet": bench_wavelet,
}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--all", action="store_true",
                        help="bench every BASELINE config (one line each)")
    parser.add_argument("--config", choices=sorted(CONFIGS),
                        help="bench one named config")
    parser.add_argument("--repeats", type=int, default=1,
                        help="repeat each measurement N times (max reported)")
    args = parser.parse_args()

    import os

    import jax

    # Persistent compilation cache: this environment's remote-compile path
    # takes minutes for the large solver program; cache it across runs.
    cache_dir = os.environ.get("SRTPU_COMPILE_CACHE", "/tmp/srtpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    names = (
        sorted(CONFIGS) if args.all else [args.config or "map_tv"]
    )
    for name in names:
        best = None
        for _ in range(max(1, args.repeats)):
            result = CONFIGS[name]()
            if best is None or (result["value"] or 0) > (best["value"] or 0):
                best = result
        print(json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
