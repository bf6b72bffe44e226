"""Host-loop IRLS vs all-in-graph fused IRLS on the chip (VERDICT item 7).

Run single-process on the axon chip:

    nohup timeout 3500 python experiments/tpu_irls_mode_bench.py > /tmp/irlsmode.log 2>&1 &

Same problem both ways: dallas 1000^2 4x, fused Pallas MAP+TV, 5 IRLS
iterations x 10 CG each (thresholds zeroed so both run the identical
iteration count). The host loop re-enters jit per IRLS iteration (device
round-trip: cost scalar + reweighting stays on device, but the while-loop
control is Python); the fused path is ONE XLA program
(lax.while_loop around the CG while_loop).
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
from super_resolution_tpu.solvers import IRLSMapSolver, IRLSMapSolverOptions


def build():
    gt = cv2.imread("/root/reference/test_data/dallas.jpg", cv2.IMREAD_GRAYSCALE)
    gt = jnp.asarray(gt.astype(np.float32) / 255.0)[None]
    seq = MotionShiftSequence([(0, 0), (1, 1), (0, 1), (1, 0)])
    model = ImageModel.create(
        ImageModelParameters(scale=4, blur_radius=3, blur_sigma=1.5,
                             motion_sequence=seq)
    )
    obs = [np.asarray(model.apply(gt, k)) for k in range(4)]
    return gt, model, obs


def run(fused: bool, model, obs, shape):
    opts = IRLSMapSolverOptions(
        max_num_irls_iterations=5,
        max_num_solver_iterations=10,
        irls_cost_difference_threshold=0.0,
        gradient_norm_threshold=0.0,
        cost_decrease_threshold=0.0,
        parameter_variation_threshold=0.0,
        fused_irls=fused,
        use_pallas_data_term=True,
        pallas_tile=(256, 1024),
    )
    solver = IRLSMapSolver(opts, model, obs, print_solver_output=False)
    solver.add_regularizer(TotalVariationRegularizer(), 0.01)
    x0 = np.zeros(shape, np.float32)
    out = solver.solve(x0)          # compile + first run
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = solver.solve(x0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    label = "fused " if fused else "host-loop"
    print(f"{label}: {dt:.3f} s for 5 IRLS x 10 CG "
          f"({dt / 50 * 1e3:.2f} ms/CG-iter)", flush=True)
    return dt, np.asarray(out)


def main():
    gt, model, obs = build()
    t_host, x_host = run(False, model, obs, gt.shape)
    t_fused, x_fused = run(True, model, obs, gt.shape)
    diff = float(np.max(np.abs(x_host - x_fused)))
    print(f"fused speedup over host loop: {t_host / t_fused:.3f}x; "
          f"max |x_host - x_fused| = {diff:.3e}", flush=True)


if __name__ == "__main__":
    main()
