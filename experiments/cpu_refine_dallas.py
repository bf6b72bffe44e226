"""CPU experiment: motion-refinement contraction on the bench geometry.

Small dallas crop, 4 frames, 4x, BTV — measures how fast alternating
(partial solve | Gauss-Newton refine) recovers realistic registration error
(~0.14 HR px), and what the refined solve's PSNR ladder looks like vs the
estimated-only and known-motion solves. Informs the bench_map_btv_estimated
refinement schedule (bench.py).
"""

import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import cv2
import numpy as np
import jax.numpy as jnp

from super_resolution_tpu.evaluation import psnr
from super_resolution_tpu.models.image_model import degrade
from super_resolution_tpu.motion.refinement import refine_shifts
from super_resolution_tpu.ops.blur import gaussian_kernel_2d
from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
from super_resolution_tpu.solvers.least_squares import minimize
from super_resolution_tpu.solvers.objective import make_map_value_and_grad


def main():
    img = cv2.imread("/root/reference/test_data/dallas.jpg", cv2.IMREAD_GRAYSCALE)
    gt = jnp.asarray(img[200:456, 300:556].astype(np.float64) / 255.0)[None]
    kernel = jnp.asarray(gaussian_kernel_2d(3, 1.5))
    s = 4
    true = np.asarray([(0, 0), (1.5, 0.5), (-0.75, 1.25), (0.5, -1.5)])
    obs = jnp.stack([degrade(gt, float(dx), float(dy), kernel, s) for dx, dy in true])
    r2 = np.random.default_rng(4)
    pert = true + np.where(
        np.arange(4)[:, None] == 0, 0.0, r2.uniform(-0.14, 0.14, (4, 2))
    )
    regs = [(BilateralTotalVariationRegularizer(3, 0.5), 0.01)]
    w = (jnp.ones_like(gt),)

    def inner(shifts, x0, iters):
        vg = make_map_value_and_grad(
            obs, jnp.asarray(shifts), kernel, s, regs, max_shift=4
        )
        return minimize(vg.prepare(w), x0, method="cg", max_iterations=iters).x

    def report(tag, x, shifts):
        err = float(np.max(np.abs(np.asarray(shifts) - true)))
        print(
            f"{tag}: err={err:.5f} "
            f"psnr={float(psnr(np.asarray(x), np.asarray(gt))):.2f}",
            flush=True,
        )

    # Scheme A: 4 x (12-iter solve + refine), then a 50-iter final solve.
    t0 = time.time()
    s_a = jnp.asarray(pert)
    x = jnp.zeros_like(gt)
    for it in range(4):
        x = inner(s_a, x, 12)
        report(f"A round {it}", x, s_a)
        s_a = refine_shifts(x, obs, s_a, kernel, s, num_iterations=2)
    x_a = inner(s_a, x, 50)
    report(f"A final ({time.time() - t0:.0f}s)", x_a, s_a)

    x_est = inner(jnp.asarray(pert), jnp.zeros_like(gt), 50)
    report("est-only 50it", x_est, pert)
    x_true = inner(jnp.asarray(true), jnp.zeros_like(gt), 50)
    report("true 50it", x_true, true)

    # Scheme B: one refine on the 50-iter estimate, then 50 more.
    s_b = refine_shifts(x_est, obs, jnp.asarray(pert), kernel, s, num_iterations=2)
    x_b = inner(s_b, x_est, 50)
    report("B refine@50 (+50)", x_b, s_b)
    # Scheme C: three refine rounds warm-started from the 50-iter estimate.
    s_c = jnp.asarray(pert)
    x_c = x_est
    for it in range(3):
        s_c = refine_shifts(x_c, obs, s_c, kernel, s, num_iterations=2)
        x_c = inner(s_c, x_c, 15)
        report(f"C round {it}", x_c, s_c)
    x_c = inner(s_c, x_c, 35)
    report("C final", x_c, s_c)


if __name__ == "__main__":
    main()
