"""In-session A/B: round-4 minimal halo margins vs the round-3 margins,
plus the extent-mask memoization knob — all on FULL 50-iteration flagship
solves (standalone eval timings through the tunnel are unreliable at the
sub-ms scale; cross-session comparisons carry ~5-7% drift, so the old
geometry is reconstructed in-process by monkeypatching ``_geometry``).

Variants:
  new        round-4 margins (production)
  new+memo   round-4 margins, extent masks memoized across the frame loop
  new-nomask round-4 margins, masks skipped (perf attribution floor)
  old        round-3 margins (monkeypatched)
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

from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShiftSequence
from super_resolution_tpu.ops.pallas import degrade
from super_resolution_tpu.ops.pallas.degrade import _btv_margin, _round_up, _tile_pair, hr_to_planes
from super_resolution_tpu.ops.tv import TotalVariationRegularizer
from super_resolution_tpu.solvers import make_map_value_and_grad, minimize

ITERS = 50
TILE = (256, 1024)


def _geometry_old(warp_taps, warp_adj_taps, kernel, s, tile,
                  use_btv, btv_range, wr_override=None):
    """The round-3 margin arithmetic, reconstructed for in-session A/B."""
    if kernel is None:
        bp = 0
    else:
        kk = np.asarray(kernel)
        bp = max(kk.shape[0] // 2, kk.shape[1] // 2)
    wr = 1 if wr_override is None else int(wr_override)
    for taps in list(warp_taps) + list(warp_adj_taps):
        for dr, dc, _ in taps:
            wr = max(wr, abs(dr), abs(dc))
    za = (bp + s - 1) // s + 1
    ga = (wr + s - 1) // s + 1
    pe = max((wr + bp + s - 1) // s, ga + 1)
    p_ext = s * pe
    q_halo = _round_up(p_ext + s * za + wr + s, s)
    if use_btv:
        bm = _btv_margin(btv_range, s)
        q_halo = max(q_halo, s * max(bm, (btv_range + s - 1) // s, 1))
    qe = q_halo // s
    tr, tc = _tile_pair(tile, s)
    tlr_r, tlr_c = tr // s, tc // s
    nbm = _btv_margin(btv_range, s) if use_btv else 0
    return dict(
        bp=bp, wr=wr, za=za, ga=ga, pe=pe, p_ext=p_ext, q_halo=q_halo, qe=qe,
        tile=(tr, tc), tlr=(tlr_r, tlr_c),
        ext_lr=(tlr_r + 2 * pe, tlr_c + 2 * pe),
        lrw=((tr + 2 * q_halo) // s, (tc + 2 * q_halo) // s),
        n1=(tlr_r + 2 * pe + 2 * za, tlr_c + 2 * pe + 2 * za),
        z1off=qe - pe - za,
        ng1=(tlr_r + 2 * ga, tlr_c + 2 * ga),
        g1off=qe - ga,
        nxt=(tlr_r + 1, tlr_c + 1),
        nb=(tlr_r + nbm, tlr_c + nbm),
    )


def run_variant(label, observations, shifts, kernel, scale, regs, weights,
                hr_shape, memo=False, skip=False, reps=3):
    vg = make_map_value_and_grad(
        observations, shifts, kernel, scale, regs, max_shift=3,
        static_shifts=np.asarray(shifts), use_pallas=True, pallas_tile=TILE,
        phase_io=True, pallas_skip_extent_masks=skip,
        pallas_memo_extent_masks=memo,
    )

    @jax.jit
    def solve(x0, w):
        return minimize(
            vg.prepare(w), x0, method="cg", max_iterations=ITERS,
            gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
            parameter_variation_threshold=0.0,
        )

    x0 = hr_to_planes(jnp.zeros(hr_shape, jnp.float32), scale)
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
    npix = int(np.prod(hr_shape))
    print(
        f"{label:12s}: {best * 1e3:8.2f} ms solve | {best / n_iters * 1e3:6.3f}"
        f" ms/iter | {n_iters * npix / best / 1e6:7.1f} Mpix-it/s | cost "
        f"{float(result.cost):.4f} (compile {t_compile:.0f}s)",
        flush=True,
    )


def main():
    gt = cv2.imread("/root/reference/test_data/dallas.jpg", cv2.IMREAD_GRAYSCALE)
    gt = jnp.asarray(gt.astype(np.float32) / 255.0)[None]
    scale = 4
    seq = MotionShiftSequence([(0, 0), (1, 1), (0, 1), (1, 0)])
    model = ImageModel.create(
        ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.5,
                             motion_sequence=seq)
    )
    observations = jnp.stack([model.apply(gt, k) for k in range(4)])
    shifts = jnp.asarray(seq.as_array(), jnp.float32)
    kernel = jnp.asarray(model.blur_operator.kernel, jnp.float32)
    regs = [(TotalVariationRegularizer(), 0.01)]
    weights = (jnp.ones(gt.shape, jnp.float32),)

    g_new = degrade._geometry(
        [], [], np.asarray(kernel), scale, TILE, False, 0, wr_override=1
    )
    g_old = _geometry_old(
        [], [], np.asarray(kernel), scale, TILE, False, 0, wr_override=1
    )
    print(f"window halo qe: old={g_old['qe']} new={g_new['qe']} | "
          f"lrw old={g_old['lrw']} new={g_new['lrw']}", flush=True)

    run_variant("new", observations, shifts, kernel, scale, regs, weights,
                gt.shape)
    run_variant("new+memo", observations, shifts, kernel, scale, regs, weights,
                gt.shape, memo=True)
    run_variant("new-nomask", observations, shifts, kernel, scale, regs,
                weights, gt.shape, skip=True)
    orig = degrade._geometry
    degrade._geometry = _geometry_old
    try:
        run_variant("old", observations, shifts, kernel, scale, regs, weights,
                    gt.shape)
    finally:
        degrade._geometry = orig


if __name__ == "__main__":
    main()
