"""Leave-one-out (LOO) motion refinement probe on the bench geometry.

Standard alternation refines frame k against an HR estimate x that INCLUDES
frame k's own wrongly-shifted data — at the bench geometry (K=4 frames at
s=4: under-determined) x absorbs most of the shift error and the fixed-point
contraction measured only ~0.92/round. LOO removes the self-consistency
bias: frame k is refined against x_{-k}, solved from the OTHER frames. The
shift-generic kernel makes this cheap — the [3, ...]-frame solve is ONE
executable reused for all 4 leave-outs (observations and shifts are traced
arguments).

Run SOLO on the chip.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import cv2
import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/srtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from super_resolution_tpu.evaluation import psnr
from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShiftSequence
from super_resolution_tpu.motion.refinement import refine_shifts
from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
from super_resolution_tpu.ops.pallas.degrade import shift_bound_bucket
from super_resolution_tpu.solvers import make_map_value_and_grad, minimize

ITERS = 50


def main():
    dtype = jnp.float32
    scale = 4
    true = np.asarray([(0, 0), (1.5, 0.5), (-0.75, 1.25), (0.5, -1.5)])
    gt_img = cv2.imread("/root/reference/test_data/dallas.jpg", cv2.IMREAD_COLOR)
    gt = jnp.asarray(
        np.moveaxis(gt_img.astype(np.float32) / 255.0, -1, 0), dtype
    )
    seq = MotionShiftSequence([tuple(r) for r in true])
    model = ImageModel.create(
        ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.5,
                             motion_sequence=seq)
    )
    obs = jnp.stack([model.apply(gt, k) for k in range(4)])
    kernel = jnp.asarray(model.blur_operator.kernel, dtype)
    regs = [(BilateralTotalVariationRegularizer(3, 0.5), 0.01)]
    weights = (jnp.ones(gt.shape, dtype),)
    rng = np.random.default_rng(4)
    pert = true + np.where(np.arange(4)[:, None] == 0, 0.0,
                           rng.uniform(-0.14, 0.14, (4, 2)))
    bound = float(shift_bound_bucket(float(np.max(np.abs(pert))) + 0.5))

    def make_solver(k_frames):
        @jax.jit
        def solve(observations, shifts):
            vg = make_map_value_and_grad(
                observations, shifts, kernel, scale, regs, max_shift=4,
                use_pallas=True, pallas_shift_bound=bound, phase_io=True,
            )
            x0 = vg.to_planes(jnp.zeros(gt.shape, dtype))
            result = minimize(
                vg.prepare(weights), x0, method="cg", max_iterations=ITERS,
                gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
                parameter_variation_threshold=0.0,
            )
            return vg.from_planes(result.x)

        return solve

    solve4 = make_solver(4)
    solve3 = make_solver(3)

    def report(tag, shifts, x=None):
        err = float(np.max(np.abs(np.asarray(shifts) - true)))
        extra = "" if x is None else (
            f" psnr={float(psnr(np.asarray(x), np.asarray(gt))):.3f}"
        )
        print(f"{tag}: err={err:.5f}{extra}", flush=True)

    # Baseline: standard alternation (matches bench_map_btv_estimated).
    s_std = jnp.asarray(pert, dtype)
    x = solve4(obs, s_std)
    report("start", s_std, x)
    t0 = time.time()
    for it in range(4):
        s_std = refine_shifts(x, obs, s_std, kernel, scale, num_iterations=2)
        x = solve4(obs, s_std)
        report(f"std round {it}", s_std, x)
    print(f"std total {time.time() - t0:.1f}s", flush=True)

    # LOO alternation: frame k refined against the 3-frame solve without it.
    s_loo = jnp.asarray(pert, dtype)
    t0 = time.time()
    for it in range(4):
        new_rows = [s_loo[0]]
        for k in range(1, 4):
            keep = [j for j in range(4) if j != k]
            keep_idx = np.asarray(keep)
            x_mk = solve3(obs[keep_idx], s_loo[keep_idx])
            refined = refine_shifts(
                x_mk, obs[k : k + 1], s_loo[k : k + 1], kernel, scale,
                num_iterations=2, pin_first=False,
            )
            new_rows.append(refined[0])
        s_loo = jnp.stack(new_rows)
        x_full = solve4(obs, s_loo)
        report(f"loo round {it}", s_loo, x_full)
    print(f"loo total {time.time() - t0:.1f}s", flush=True)

    x_true = solve4(obs, jnp.asarray(true, dtype))
    report("known-motion", jnp.asarray(true, dtype), x_true)


if __name__ == "__main__":
    main()
