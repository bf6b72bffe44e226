"""Benchmark: MAP solver throughput at 4x upscale on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpixel-iters/s/chip", "vs_baseline": N}

The metric counts CG iterations x HR pixels per second for the full MAP
objective (4-frame degrade + adjoint gradient + IRLS-weighted TV) on the
dallas 4x configuration from BASELINE.json. The reference publishes no
numbers (BASELINE.md), so ``vs_baseline`` is the speedup over the ACTUAL
C++ reference, which we built (-O3 -march=native, single-threaded as
written) and ran on this host's CPU for the same 1000^2 4x problem:
28 CG iterations in 35.3 s = 0.79 Mpixel-iters/s (BASELINE_MEASURED.md).
"""

import json
import time

import numpy as np


def _build_problem(dtype):
    import cv2
    import jax.numpy as jnp

    from super_resolution_tpu.models import ImageModel, ImageModelParameters
    from super_resolution_tpu.motion import MotionShiftSequence

    # The north-star config: dallas 4-frame sequence at 4x (BASELINE.json) —
    # a 1000x1000 HR reconstruction from four 250x250 LR observations.
    gt = cv2.imread("/root/reference/test_data/dallas.jpg", cv2.IMREAD_GRAYSCALE)
    gt = jnp.asarray(gt.astype(np.float32) / 255.0, dtype)[None]  # [1, 1000, 1000]
    scale = 4
    seq = MotionShiftSequence([(0, 0), (1, 1), (0, 1), (1, 0)])
    model = ImageModel.create(
        ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.5, motion_sequence=seq)
    )
    observations = jnp.stack([model.apply(gt, k) for k in range(4)])
    shifts = jnp.asarray(seq.as_array(), dtype)
    kernel = jnp.asarray(model.blur_operator.kernel, dtype)
    x0 = jnp.zeros_like(gt)
    return x0, observations, shifts, kernel, scale


def _run(device, iters, dtype):
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.ops.tv import TotalVariationRegularizer
    from super_resolution_tpu.solvers import make_map_value_and_grad, minimize

    with jax.default_device(device):
        x0, observations, shifts, kernel, scale = _build_problem(dtype)
        tv = TotalVariationRegularizer()
        weights = (jnp.ones_like(x0),)

        # The production hot path: the fully fused Pallas MAP objective
        # (polyphase warp->blur->decimate + adjoint + IRLS-weighted TV in one
        # kernel), with the weight windows packed once outside the CG loop.
        static_shifts = np.asarray(shifts)
        use_pallas = jax.default_backend() != "cpu"

        @jax.jit
        def solve(x0, observations, shifts, weights):
            vg = make_map_value_and_grad(
                observations, shifts, kernel, scale, [(tv, 0.01)], max_shift=3,
                static_shifts=static_shifts if use_pallas else None,
                use_pallas=use_pallas,
                # Wide-short tiles map better onto the 128-wide vector lanes:
                # (256, 1024) measured 529 vs 520 Mpix-it/s @512 square on the
                # full 50-iter solve (choose_tile's ladder prefers it too).
                pallas_tile=(256, 1024) if use_pallas else 0,
            )
            # Zero thresholds: run exactly `iters` CG iterations for timing.
            return minimize(
                vg.prepare(weights),
                x0,
                method="cg",
                max_iterations=iters,
                gradient_norm_threshold=0.0,
                cost_decrease_threshold=0.0,
                parameter_variation_threshold=0.0,
            )

        # Warm-up / compile.
        result = solve(x0, observations, shifts, weights)
        jax.block_until_ready(result.x)
        t0 = time.perf_counter()
        result = solve(x0, observations, shifts, weights)
        jax.block_until_ready(result.x)
        elapsed = time.perf_counter() - t0
        n_iters = int(result.iterations)
        hr_pixels = x0.shape[-1] * x0.shape[-2]
        return n_iters * hr_pixels / elapsed / 1e6, n_iters, elapsed


def main():
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

    accel = jax.devices()[0]
    dtype = np.float32
    value, n_iters, elapsed = _run(accel, iters=50, dtype=dtype)

    # Measured C++ reference throughput on the identical problem
    # (BASELINE_MEASURED.md): 0.79 Mpixel-iters/s, single CPU thread.
    reference_throughput = 0.79
    vs_baseline = value / reference_throughput

    print(
        json.dumps(
            {
                "metric": "map_solver_throughput_4x_dallas",
                "value": round(value, 3),
                "unit": "Mpixel-iters/s/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
