"""Tile-size sweep for the fused Pallas MAP kernel on the production config.

Measures the fully fused MAP objective (data term + packed IRLS-TV) and the
bare data term at several Pallas tile sizes on the dallas 1000^2 4x problem,
plus the 50-iteration CG solve at the best tile. One process, persistent
compile cache (axon compiles take minutes the first time).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python experiments/tpu_tile_sweep.py
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
from super_resolution_tpu.ops.pallas.degrade import (
    pack_tv_constants,
    pallas_data_term_cost_and_grad,
)

REPS = 50


def timeit(fn, *args, label):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label}: {dt*1e3:.3f} ms/eval", flush=True)
    return dt


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
    shifts_np = seq.as_array()
    kernel_np = model.blur_operator.kernel.astype(np.float32)
    constants = 0.01 * jnp.ones_like(x)

    tiles = (128, 256, 512)
    if len(sys.argv) > 1 and sys.argv[1] == "rect":
        # Rectangular tiles: column extent maps to the 128-wide vector
        # lanes, so wide-short tiles waste fewer lanes per slice.
        tiles = ((512, 1024), (64, 1024), (256, 1024), 512, (256, 1024), 512)
    for tile in tiles:
        try:
            f = jax.jit(
                lambda v, t=tile: pallas_data_term_cost_and_grad(
                    v, obs, shifts_np, kernel_np, scale, tile=t
                )
            )
            timeit(f, x, label=f"data term          tile={tile}")
        except Exception as e:  # noqa: BLE001 — sweep survives OOM tiles
            print(f"data term          tile={tile}: FAILED "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
        try:
            packed = pack_tv_constants(constants, scale, tile)
            g = jax.jit(
                lambda v, p, t=tile: pallas_data_term_cost_and_grad(
                    v, obs, shifts_np, kernel_np, scale, tile=t,
                    tv_constants_packed=p,
                )
            )
            timeit(g, x, packed, label=f"fused MAP (TV)     tile={tile}")
        except Exception as e:  # noqa: BLE001
            print(f"fused MAP (TV)     tile={tile}: FAILED "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
