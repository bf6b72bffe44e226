"""Roofline + per-iteration breakdown of the production MAP solve (VERDICT
round-1 item 3). Run on the axon chip (single process!):

    nohup timeout 3500 python experiments/tpu_roofline.py > /tmp/roofline.log 2>&1 &

Decomposition of one CG iteration on the flagship problem (dallas 1000^2,
4 frames, 4x, fused Pallas MAP+TV, tile (256, 1024)):

  T_iter  = full 50-iteration solve / 50
  T_eval  = one fused objective evaluation (cost+grad), jitted alone
  E       = objective evaluations per iteration (minimize reports the count)
  residue = T_iter - E * T_eval   -> CG vector algebra + line-search logic

HBM roofline: every buffer the fused evaluation provably moves (window
stacks written+read, observations, packed TV constants, gradient phases,
final gradient assembly) is summed from the kernel geometry; the attainable
floor is bytes / 819 GB/s (v5e HBM). Achieved fraction = floor / T_eval.
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
from super_resolution_tpu.ops.pallas.degrade import _geometry, _round_up, _warp_taps
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.solvers import make_map_value_and_grad, minimize

HBM_GBPS = 819.0  # v5e


def timeit(fn, *args, n=30, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {ms:.4f} ms", flush=True)
    return ms / 1e3


def main():
    gt = cv2.imread("/root/reference/test_data/dallas.jpg", cv2.IMREAD_GRAYSCALE)
    gt = jnp.asarray(gt.astype(np.float32) / 255.0)[None]
    scale, iters = 4, 50
    shift_list = [(0, 0), (1, 1), (0, 1), (1, 0)]
    seq = MotionShiftSequence(shift_list)
    model = ImageModel.create(
        ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.5,
                             motion_sequence=seq)
    )
    observations = jnp.stack([model.apply(gt, k) for k in range(4)])
    shifts = jnp.asarray(seq.as_array(), jnp.float32)
    kernel = jnp.asarray(model.blur_operator.kernel, jnp.float32)
    kernel_np = np.asarray(kernel)
    static_shifts = np.asarray(shifts)
    tile = (256, 1024)
    regs = [(TotalVariationRegularizer(), 0.01)]
    weights = (jnp.ones(gt.shape, jnp.float32),)
    x0 = jnp.zeros(gt.shape, jnp.float32)

    vg = make_map_value_and_grad(
        observations, shifts, kernel, scale, regs, max_shift=3,
        static_shifts=static_shifts, use_pallas=True, pallas_tile=tile,
    )

    # --- T_eval: one fused objective evaluation (cost + grad) ---
    prepared = jax.jit(lambda x, w: vg.prepare(w)(x))
    t_eval = timeit(prepared, gt, weights, n=100, label="T_eval (fused cost+grad)")

    # --- Full solve -> T_iter and evals/iter ---
    @jax.jit
    def solve(x0, w):
        return minimize(
            vg.prepare(w), x0, method="cg", max_iterations=iters,
            gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
            parameter_variation_threshold=0.0,
        )

    result = solve(x0, weights)
    jax.block_until_ready(result.x)
    t0 = time.perf_counter()
    result = solve(x0, weights)
    jax.block_until_ready(result.x)
    t_solve = time.perf_counter() - t0
    n_iters = int(result.iterations)
    n_evals = int(result.num_evaluations)
    t_iter = t_solve / n_iters
    evals_per_iter = n_evals / n_iters
    print(f"solve: {t_solve:.3f} s, {n_iters} iters, {n_evals} evals "
          f"({evals_per_iter:.2f}/iter)", flush=True)
    print(f"T_iter: {t_iter * 1e3:.3f} ms", flush=True)
    eval_part = evals_per_iter * t_eval
    residue = t_iter - eval_part
    print(f"breakdown: evals {eval_part * 1e3:.3f} ms ({eval_part / t_iter:.1%}), "
          f"CG algebra + line-search logic {residue * 1e3:.3f} ms "
          f"({residue / t_iter:.1%})", flush=True)

    # --- HBM roofline for one evaluation ---
    s = scale
    wt = [_warp_taps(dx, dy) for dx, dy in shift_list]
    wat = [_warp_taps(-dx, -dy) for dx, dy in shift_list]
    g = _geometry(wt, wat, kernel_np, s, tile, False, 0)
    tr, tc = g["tile"]
    c, h, w = gt.shape
    k = observations.shape[0]
    hp, wp = _round_up(h, tr), _round_up(w, tc)
    n_tiles = (hp // tr) * (wp // tc)
    s2 = s * s
    area = lambda key: g[key][0] * g[key][1]
    f32 = 4
    # Window stacks are materialized by XLA: each is WRITTEN once (from x /
    # obs / constants) and READ once by the kernel.
    xw = n_tiles * s2 * c * area("lrw") * f32
    yw = n_tiles * k * c * area("ext_lr") * f32
    mw = n_tiles * area("ext_lr") * f32
    cw = n_tiles * s2 * c * area("nxt") * f32
    grad_phases = n_tiles * s2 * c * area("tlr") * f32
    x_raw = c * h * w * f32
    obs_raw = k * c * (h // s) * (w // s) * f32
    writes_reads = 2 * (xw + yw + mw + cw) + 2 * grad_phases
    sources = x_raw + obs_raw + x_raw  # read x, obs, weights once to pack
    final_grad = 2 * x_raw  # phase planes -> [C, H, W] reassembly write+read
    total_bytes = writes_reads + sources + final_grad
    floor = total_bytes / (HBM_GBPS * 1e9)
    print(f"eval traffic: {total_bytes / 1e6:.1f} MB "
          f"(windows w+r {writes_reads / 1e6:.1f}, sources {sources / 1e6:.1f}, "
          f"grad assembly {final_grad / 1e6:.1f})", flush=True)
    print(f"HBM floor: {floor * 1e3:.3f} ms -> achieved {floor / t_eval:.1%} "
          f"of speed-of-light at {HBM_GBPS:.0f} GB/s", flush=True)
    print(f"achieved bandwidth: {total_bytes / t_eval / 1e9:.1f} GB/s", flush=True)

    # Kernel-intrinsic floor (if windows were never materialized — i.e. a
    # direct-from-HBM kernel): read x + obs + weights once, write grad once.
    intrinsic = 3 * x_raw + obs_raw
    print(f"intrinsic floor (no window copies): "
          f"{intrinsic / (HBM_GBPS * 1e9) * 1e3:.3f} ms "
          f"({intrinsic / 1e6:.1f} MB)", flush=True)

    # --- CG vector algebra microbench: one axpy + one dot at HR size ---
    v = jnp.ones((c, h, w), jnp.float32)

    @jax.jit
    def axpy_dot(a, b):
        y = a + 0.5 * b
        return y, jnp.vdot(y, b)

    timeit(axpy_dot, v, v, n=100, label="axpy+dot at HR size")


if __name__ == "__main__":
    main()
