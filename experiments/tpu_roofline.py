"""Roofline + attribution of the PHASE-PLANE production eval (round-3 item:
re-roofline the 0.259 ms eval and set a ceiling).

Run on the axon chip (single process!):

    nohup timeout 3500 python experiments/tpu_roofline.py > /tmp/roofline.log 2>&1 &

Decomposition of one CG iteration on the flagship problem (dallas 1000^2,
4 frames, 4x, fused Pallas MAP+TV, phase-plane IO, tile (256, 1024)):

  T_iter  = full 50-iteration solve / 50
  T_eval  = one fused objective evaluation (cost+grad), jitted alone
  E       = objective evaluations per iteration (minimize reports the count)

Attribution experiments on top of the round-1 HBM roofline:
  - host-packing share: a jitted function that performs ONLY the host-side
    window packing (pad + overlapping-window stack of x/obs) and the grad
    tile reassembly, no kernel launch;
  - extent-mask share: the same eval with skip_extent_masks=True
    (all in-kernel global-extent predicates + multiplies removed — wrong at
    borders, perf-only);
  - TV share: data-term-only vg (no fused TV);
  - frame-loop scaling: K=1 vs K=4 (is the frame loop still pipelined?);
  - grid-depth sweep: tile row extent 512/256/128/64 at 1024 cols (4 tiles
    -> 8 -> 16 -> 32 grid steps; pipeline ramp vs per-step overhead);
  - bf16 probe: same eval with bf16 planes/observations/constants.
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
from super_resolution_tpu.ops.pallas import degrade
from super_resolution_tpu.ops.pallas.degrade import (
    _geometry,
    _round_up,
    _warp_taps,
    hr_to_planes,
)
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.solvers import make_map_value_and_grad, minimize

HBM_GBPS = 819.0  # v5e


def timeit(fn, *args, n=100, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {ms:.4f} ms", flush=True)
    return ms / 1e3


def build_eval(observations, shifts, kernel, scale, regs, tile, weights,
               dtype=jnp.float32, skip_masks=False):
    static_shifts = np.asarray(shifts)
    vg = make_map_value_and_grad(
        observations.astype(dtype), shifts.astype(dtype),
        kernel.astype(dtype), scale, regs, max_shift=3,
        static_shifts=static_shifts, use_pallas=True, pallas_tile=tile,
        phase_io=True, pallas_skip_extent_masks=skip_masks,
    )
    w = tuple(wi.astype(dtype) for wi in weights)
    return jax.jit(vg.prepare(w)), vg


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
    tile = (256, 1024)
    regs = [(TotalVariationRegularizer(), 0.01)]
    weights = (jnp.ones(gt.shape, jnp.float32),)
    xpl = hr_to_planes(jnp.zeros(gt.shape, jnp.float32), scale) + 0.3

    # --- T_eval: the production phase-io evaluation ---
    prepared, vg = build_eval(observations, shifts, kernel, scale, regs, tile,
                              weights)
    t_eval = timeit(prepared, xpl, label="T_eval phase-io (256,1024)")

    # --- Full solve -> T_iter and evals/iter ---
    @jax.jit
    def solve(x0p, w):
        return minimize(
            vg.prepare(w), x0p, method="cg", max_iterations=iters,
            gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
            parameter_variation_threshold=0.0,
        )

    x0p = hr_to_planes(jnp.zeros(gt.shape, jnp.float32), scale)
    result = solve(x0p, weights)
    jax.block_until_ready(result.x)
    t0 = time.perf_counter()
    result = solve(x0p, weights)
    jax.block_until_ready(result.x)
    t_solve = time.perf_counter() - t0
    n_iters = int(result.iterations)
    n_evals = int(result.num_evaluations)
    t_iter = t_solve / n_iters
    evals_per_iter = n_evals / n_iters
    print(f"solve: {t_solve:.3f} s, {n_iters} iters, {n_evals} evals "
          f"({evals_per_iter:.2f}/iter) -> "
          f"{n_iters * gt.size / t_solve / 1e6:.1f} Mpix-it/s", flush=True)
    print(f"T_iter: {t_iter * 1e3:.3f} ms", flush=True)
    eval_part = evals_per_iter * t_eval
    residue = t_iter - eval_part
    print(f"breakdown: evals {eval_part * 1e3:.3f} ms ({eval_part / t_iter:.1%}), "
          f"CG algebra + line-search logic {residue * 1e3:.3f} ms "
          f"({residue / t_iter:.1%})", flush=True)

    # --- HBM roofline of one phase-io evaluation ---
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
    xw = n_tiles * s2 * c * area("lrw") * f32     # window stacks: w once, r once
    yw = n_tiles * k * c * area("ext_lr") * f32
    mw = n_tiles * area("ext_lr") * f32
    cw = n_tiles * s2 * c * area("nxt") * f32     # packed ONCE per solve, read per eval
    grad_phases = n_tiles * s2 * c * area("tlr") * f32
    x_planes = c * h * w * f32                    # phase-io: read planes to window
    writes_reads = 2 * (xw + yw + mw) + cw + 2 * grad_phases
    sources = x_planes                            # read x-planes once to pack
    final_grad = 2 * x_planes                     # tile reassembly write + state write
    total_bytes = writes_reads + sources + final_grad
    floor = total_bytes / (HBM_GBPS * 1e9)
    print(f"eval traffic (phase-io): {total_bytes / 1e6:.1f} MB "
          f"(windows w+r {writes_reads / 1e6:.1f}, sources {sources / 1e6:.1f}, "
          f"grad assembly {final_grad / 1e6:.1f})", flush=True)
    print(f"HBM floor: {floor * 1e3:.3f} ms -> achieved {floor / t_eval:.1%} "
          f"of speed-of-light at {HBM_GBPS:.0f} GB/s "
          f"({total_bytes / t_eval / 1e9:.1f} GB/s achieved)", flush=True)
    intrinsic = (2 * x_planes + k * c * (h // s) * (w // s) * f32 + x_planes)
    print(f"intrinsic floor (no window copies): "
          f"{intrinsic / (HBM_GBPS * 1e9) * 1e3:.3f} ms "
          f"({intrinsic / 1e6:.1f} MB)", flush=True)

    # --- Attribution 1: host-side packing + reassembly alone ---
    qe = g["q_halo"] // s
    lrw_r, lrw_c = g["lrw"]
    tlr_r, tlr_c = g["tlr"]
    n_ty, n_tx = hp // tr, wp // tc

    @jax.jit
    def pack_only(xp, gphases):
        xph = jnp.pad(
            xp, [(0, 0), (0, 0), (qe, qe + (hp - h) // s), (qe, qe + (wp - w) // s)]
        )
        xwl = []
        for ti in range(n_ty):
            for tj in range(n_tx):
                r0, c0 = ti * tlr_r, tj * tlr_c
                xwl.append(xph[:, :, r0 : r0 + lrw_r, c0 : c0 + lrw_c])
        xws = jnp.stack(xwl)
        gp = gphases.reshape(n_ty, n_tx, s2, c, tlr_r, tlr_c)
        gp = gp.transpose(2, 3, 0, 4, 1, 5)
        grad = gp.reshape(s2, c, hp // s, wp // s)[:, :, : h // s, : w // s]
        return jnp.sum(xws), grad

    gphases = jnp.zeros((n_tiles, s2, c, tlr_r, tlr_c), jnp.float32)
    timeit(pack_only, xpl, gphases, label="host packing + grad reassembly only")

    # --- Attribution 2: extent masks ---
    prep_nm, _ = build_eval(observations, shifts, kernel, scale, regs,
                            tile, weights, skip_masks=True)
    timeit(prep_nm, xpl, label="T_eval WITHOUT extent masks (perf-only)")

    # --- Attribution 3: TV share (data term only) ---
    prep_dt, _ = build_eval(observations, shifts, kernel, scale, [], tile, ())
    timeit(prep_dt, xpl, label="T_eval data term only (no fused TV)")

    # --- Attribution 4: frame-loop scaling (K=1) ---
    prep_k1, _ = build_eval(observations[:1], shifts[:1], kernel, scale, regs,
                            tile, weights)
    timeit(prep_k1, xpl, label="T_eval K=1 (frame-loop pipelining probe)")

    # --- Attribution 5: grid-depth sweep ---
    for tile_r in (512, 128, 64):
        try:
            prep_t, _ = build_eval(observations, shifts, kernel, scale, regs,
                                   (tile_r, 1024), weights)
            timeit(prep_t, xpl, label=f"T_eval tile ({tile_r},1024)")
        except Exception as e:  # noqa: BLE001
            print(f"tile ({tile_r},1024): FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    # --- Attribution 6: bf16 arithmetic probe ---
    try:
        prep_bf, vg_bf = build_eval(observations, shifts, kernel, scale, regs,
                                    tile, weights, dtype=jnp.bfloat16)
        xbf = xpl.astype(jnp.bfloat16)
        timeit(prep_bf, xbf, label="T_eval bf16 planes/obs/constants")
        cf32, gf32 = prepared(xpl)
        cbf, gbf = prep_bf(xbf)
        gerr = float(jnp.max(jnp.abs(gbf.astype(jnp.float32) - gf32))
                     / (jnp.max(jnp.abs(gf32)) + 1e-30))
        print(f"bf16 cost rel err {abs(float(cbf) - float(cf32)) / abs(float(cf32)):.2e}, "
              f"grad max rel err {gerr:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"bf16 probe FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)

    # --- CG vector algebra microbench at plane-state size ---
    v = jnp.ones(xpl.shape, jnp.float32)

    @jax.jit
    def axpy_dot(a, b):
        y = a + 0.5 * b
        return y, jnp.vdot(y, b)

    timeit(axpy_dot, v, v, label="axpy+dot at plane-state size")
    print("ROOFLINE DONE", flush=True)


if __name__ == "__main__":
    main()
