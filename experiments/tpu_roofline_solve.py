"""Solve-based attribution of the phase-plane production eval (round-3).

STANDALONE single-eval timings through the axon tunnel are unreliable at the
sub-ms scale (measured 0.39-1.21 ms for the SAME kernel across variants in
one session, while the full 50-iteration solve bounded the in-graph eval at
<=0.46 ms) — per-dispatch latency and tunnel jitter swamp the signal. So
every attribution here is a FULL 50-iteration CG solve (one jitted program,
second call timed): variant deltas isolate one factor each with the CG
algebra/line-search cost held constant.

Variants: baseline (256,1024) / extent masks removed / data term only /
K=1 / tile sweep / image-space state (the pre-phase-io historical path).

Run on the chip (single process!):
    nohup timeout 5400 python experiments/tpu_roofline_solve.py > /tmp/roofsolve.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/srtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import jax.numpy as jnp

from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShiftSequence
from super_resolution_tpu.ops.pallas.degrade import hr_to_planes
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.solvers import make_map_value_and_grad, minimize

HBM_GBPS = 819.0  # v5e
ITERS = 50


def run_variant(label, observations, shifts, kernel, scale, regs, tile,
                weights, hr_shape, phase_io=True, skip_masks=False, reps=3):
    static_shifts = np.asarray(shifts)
    vg = make_map_value_and_grad(
        observations, shifts, kernel, scale, regs, max_shift=3,
        static_shifts=static_shifts, use_pallas=True, pallas_tile=tile,
        phase_io=phase_io, pallas_skip_extent_masks=bool(skip_masks),
    )

    @jax.jit
    def solve(x0, w):
        prepared = vg.prepare(w)
        return minimize(
            prepared, x0, method="cg", max_iterations=ITERS,
            gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
            parameter_variation_threshold=0.0,
        )

    x0 = jnp.zeros(hr_shape, jnp.float32)
    if phase_io:
        x0 = hr_to_planes(x0, scale)
    t_c = time.perf_counter()
    result = solve(x0, weights)
    jax.block_until_ready(result.x)
    t_compile = time.perf_counter() - t_c
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        result = solve(x0, weights)
        jax.block_until_ready(result.x)
        best = min(best, time.perf_counter() - t0)
    n_iters = int(result.iterations)
    n_evals = int(result.num_evaluations)
    npix = int(np.prod(hr_shape))
    mpix = n_iters * npix / best / 1e6
    print(
        f"{label}: {best * 1e3:8.2f} ms solve | {best / n_iters * 1e3:6.3f} "
        f"ms/iter | {best / n_evals * 1e3:6.3f} ms/eval-bound | "
        f"{mpix:7.1f} Mpix-it/s | {n_evals} evals "
        f"(compile {t_compile:.0f}s)",
        flush=True,
    )
    return best, n_iters, n_evals


def main():
    gt = cv2.imread("/root/reference/test_data/dallas.jpg", cv2.IMREAD_GRAYSCALE)
    gt = jnp.asarray(gt.astype(np.float32) / 255.0)[None]
    scale = 4
    shift_list = [(0, 0), (1, 1), (0, 1), (1, 0)]
    seq = MotionShiftSequence(shift_list)
    model = ImageModel.create(
        ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.5,
                             motion_sequence=seq)
    )
    observations = jnp.stack([model.apply(gt, k) for k in range(4)])
    shifts = jnp.asarray(seq.as_array(), jnp.float32)
    kernel = jnp.asarray(model.blur_operator.kernel, jnp.float32)
    regs = [(TotalVariationRegularizer(), 0.01)]
    weights = (jnp.ones(gt.shape, jnp.float32),)

    base = run_variant("base (256,1024) masked TV K=4", observations, shifts,
                       kernel, scale, regs, (256, 1024), weights, gt.shape)
    nomask = run_variant("no extent masks (perf-only)  ", observations, shifts,
                         kernel, scale, regs, (256, 1024), weights, gt.shape,
                         skip_masks=True)
    dataonly = run_variant("data term only (no fused TV) ", observations,
                           shifts, kernel, scale, [], (256, 1024), (),
                           gt.shape)
    k1 = run_variant("K=1 frame                    ", observations[:1],
                     shifts[:1], kernel, scale, regs, (256, 1024), weights,
                     gt.shape)
    for tile in ((512, 1024), (128, 1024), (64, 1024), (256, 512)):
        run_variant(f"tile {tile}               ", observations, shifts,
                    kernel, scale, regs, tile, weights, gt.shape)
    img_state = run_variant("image-space state (round-1)  ", observations,
                            shifts, kernel, scale, regs, (256, 1024), weights,
                            gt.shape, phase_io=False)

    t_b, it_b, ev_b = base
    t_nm, _, ev_nm = nomask
    t_do, _, ev_do = dataonly
    t_k1, _, ev_k1 = k1
    print("\n--- attribution (per-eval deltas vs base, CG algebra constant) ---",
          flush=True)
    print(f"extent masks: {(t_b / ev_b - t_nm / ev_nm) * 1e3:+.3f} ms/eval",
          flush=True)
    print(f"fused TV:     {(t_b / ev_b - t_do / ev_do) * 1e3:+.3f} ms/eval",
          flush=True)
    print(f"3 extra frames: {(t_b / ev_b - t_k1 / ev_k1) * 1e3:+.3f} ms/eval",
          flush=True)
    print(f"image-state penalty: "
          f"{(img_state[0] / img_state[2] - t_b / ev_b) * 1e3:+.3f} ms/eval",
          flush=True)

    # HBM floor recap (phase-io traffic model, see tpu_roofline.py).
    print("\nHBM floor context: 38.4 MB/eval modeled -> 0.047 ms at 819 GB/s.",
          flush=True)
    print("ROOFLINE SOLVE DONE", flush=True)


if __name__ == "__main__":
    main()
