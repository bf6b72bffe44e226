"""Line-search tuning on the production solve: evals/iter vs solve quality.

Each CG iteration costs >= 1 fused-objective evaluation; extra line-search
trials are the gap between the 1.46 ms objective eval and the ~2.0 ms
per-iteration wall time. This sweeps the strong-Wolfe curvature constant c2
(strict 0.4 -> loose 0.9) on the dallas 1000^2 4x MAP solve and reports
time, total evaluations, and the final cost after exactly 50 CG iterations
(quality guard: the final cost must not regress meaningfully).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python experiments/tpu_linesearch_tuning.py
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
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.solvers import make_map_value_and_grad, minimize
from super_resolution_tpu.solvers.least_squares import LineSearchConfig


def main():
    print("backend:", jax.default_backend(), flush=True)
    gt = cv2.imread("/root/reference/test_data/dallas.jpg", cv2.IMREAD_GRAYSCALE)
    x = jnp.asarray(gt.astype(np.float32) / 255.0)[None]
    scale = 4
    seq = MotionShiftSequence([(0, 0), (1, 1), (0, 1), (1, 0)])
    model = ImageModel.create(
        ImageModelParameters(
            scale=scale, blur_radius=3, blur_sigma=1.5, motion_sequence=seq
        )
    )
    obs = jnp.stack([model.apply(x, k) for k in range(4)])
    shifts = jnp.asarray(seq.as_array(), jnp.float32)
    shifts_np = seq.as_array()
    kernel = jnp.asarray(model.blur_operator.kernel.astype(np.float32))
    tv = TotalVariationRegularizer()
    weights = (jnp.ones_like(x),)

    vg = make_map_value_and_grad(
        obs, shifts, kernel, scale, [(tv, 0.01)], max_shift=3,
        static_shifts=shifts_np, use_pallas=True, pallas_tile=512,
    )

    for label, cfg in [
        ("c2=0.4 (current)", LineSearchConfig(c2=0.4)),
        ("c2=0.9 (loose)  ", LineSearchConfig(c2=0.9)),
        ("c2=0.7          ", LineSearchConfig(c2=0.7)),
    ]:
        solve = jax.jit(
            lambda x0, w, c=cfg: minimize(
                vg.prepare(w), x0, method="cg", max_iterations=50,
                gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
                parameter_variation_threshold=0.0, line_search=c,
            )
        )
        r = solve(jnp.zeros_like(x), weights)
        jax.block_until_ready(r.x)
        t0 = time.perf_counter()
        r = solve(jnp.zeros_like(x), weights)
        jax.block_until_ready(r.x)
        dt = time.perf_counter() - t0
        mpix = 50 * x.size / dt / 1e6
        print(
            f"{label}: {dt*1e3:7.1f} ms, evals={int(r.num_evaluations):3d} "
            f"({int(r.num_evaluations)/50:.2f}/iter), cost={float(r.cost):.4f}, "
            f"{mpix:.0f} Mpixel-iters/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
