"""Empirical cost attribution inside the fused Pallas evaluation (VERDICT
item 3 follow-up): the roofline bounds (HBM 0.058 ms, raw VPU fma ~0.03 ms)
are both far below the measured ~1.2 ms/eval, so the time is in slicing /
masking / scheduling. Ablate by construction — every variant is an existing
kernel configuration:

  full        data term + fused TV, 4 frames, 7x7 blur   (production)
  data-only   no TV constants
  no-blur     kernel=None (drops both blur stages, margins shrink)
  k1          one frame (frame-loop share)
  square512   tile (512, 512) vs (256, 1024)
  dyn         shift-generic kernel (runtime taps) for comparison

Run single-process on the axon chip:
    nohup timeout 3500 python experiments/tpu_kernel_ablation.py > /tmp/ablate.log 2>&1 &
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
from super_resolution_tpu.ops.pallas.degrade import pallas_data_term_cost_and_grad


def timeit(fn, *args, n=200, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {ms:.4f} ms", flush=True)
    return ms


def main():
    gt = cv2.imread("/root/reference/test_data/dallas.jpg", cv2.IMREAD_GRAYSCALE)
    x = jnp.asarray(gt.astype(np.float32) / 255.0)[None]
    scale = 4
    shift_list = [(0, 0), (1, 1), (0, 1), (1, 0)]
    seq = MotionShiftSequence(shift_list)
    model = ImageModel.create(
        ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.5,
                             motion_sequence=seq)
    )
    obs = jnp.stack([model.apply(x, k) for k in range(4)])
    shifts_np = np.asarray(seq.as_array())
    kernel_np = np.asarray(model.blur_operator.kernel, np.float32)
    tv = jnp.full(x.shape, 0.01, jnp.float32)
    tile = (256, 1024)

    def run(label, observations=obs, static=shifts_np, kern=kernel_np,
            tile=tile, tv_c=tv, dynamic=False):
        kwargs = dict(tile=tile)
        if tv_c is not None:
            kwargs["tv_constants"] = tv_c
        if dynamic:
            fn = jax.jit(
                lambda xx, oo, ss: pallas_data_term_cost_and_grad(
                    xx, oo, None, kern, scale, dynamic_shifts=ss,
                    shift_bound=2.0, **kwargs,
                )
            )
            return timeit(fn, x, observations,
                          jnp.asarray(shifts_np, jnp.float32), label=label)
        fn = jax.jit(
            lambda xx, oo: pallas_data_term_cost_and_grad(
                xx, oo, static, kern, scale, **kwargs
            )
        )
        return timeit(fn, x, observations, label=label)

    t_full = run("full (data+TV, K=4, 7x7 blur, tile 256x1024)")
    t_data = run("data-only (no TV)", tv_c=None)
    t_noblur = run("no-blur (kernel=None)", kern=None)
    t_k1 = run("K=1 (one frame)", observations=obs[:1],
               static=shifts_np[:1])
    t_sq = run("square 512 tile", tile=(512, 512))
    t_dyn = run("shift-generic (runtime taps)", dynamic=True)

    print(f"\nTV share:        {t_full - t_data:.4f} ms", flush=True)
    print(f"blur share:      {t_data - t_noblur:.4f} ms (both blur stages)",
          flush=True)
    print(f"per-frame cost:  {(t_data - (t_full - t_full)) / 4:.4f} "
          f"(K=4 data {t_data:.4f} vs K=1 {t_k1:.4f})", flush=True)
    print(f"dyn overhead:    {t_dyn - t_full:.4f} ms", flush=True)


if __name__ == "__main__":
    main()
