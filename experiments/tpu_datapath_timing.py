"""TPU data-path timing experiments (run on the axon chip).

Measures objective-eval variants in one process with the persistent compile
cache so re-runs are cheap. Results drive the optimization of the hot path.
"""

import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/srtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import cv2
import jax.numpy as jnp

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from super_resolution_tpu.models import ImageModel, ImageModelParameters
from super_resolution_tpu.motion import MotionShiftSequence
from super_resolution_tpu.ops.blur import correlate2d
from super_resolution_tpu.ops.blur_shifted import correlate2d_shifted
from super_resolution_tpu.ops.resize import decimate, zero_upsample
from super_resolution_tpu.ops.tv import TotalVariationRegularizer, tv_cost_and_grad
from super_resolution_tpu.ops.warp import translate_static
from super_resolution_tpu.solvers import make_map_value_and_grad, minimize
from super_resolution_tpu.solvers.objective import (
    data_term_cost_and_grad,
    data_term_cost_and_grad_static,
)


def timeit(fn, *args, n=50, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {ms:.3f} ms")
    return ms


def static_shifted_data_term(x, observations, shift_list, kernel_np, scale):
    """Static shifts + shifted-add blur (no conv dispatch)."""
    s2 = jnp.asarray(float(scale * scale), x.dtype)
    cost = jnp.zeros((), x.dtype)
    grad = jnp.zeros_like(x)
    for k, (dx, dy) in enumerate(shift_list):
        z = translate_static(x, dx, dy)
        z = correlate2d_shifted(z, kernel_np)
        r = decimate(z, scale) - observations[k]
        cost = cost + jnp.sum(r * r)
        g = zero_upsample(r, scale)
        g = correlate2d_shifted(g, kernel_np.T)
        grad = grad + translate_static(g, -dx, -dy)
    return s2 * cost, 2.0 * s2 * grad


def pallas_variant(x, obs, shifts_np, kernel_np, scale):
    from super_resolution_tpu.ops.pallas.degrade import pallas_data_term_cost_and_grad

    return pallas_data_term_cost_and_grad(x, obs, shifts_np, kernel_np, scale)


def main():
    gt = cv2.imread("/root/reference/test_data/dallas.jpg", cv2.IMREAD_GRAYSCALE)
    x = jnp.asarray(gt.astype(np.float32) / 255.0)[None]
    scale = 4
    seq = MotionShiftSequence([(0, 0), (1, 1), (0, 1), (1, 0)])
    model = ImageModel.create(
        ImageModelParameters(scale=scale, blur_radius=3, blur_sigma=1.5, motion_sequence=seq)
    )
    obs = jnp.stack([model.apply(x, k) for k in range(4)])
    shifts = jnp.asarray(seq.as_array(), jnp.float32)
    shifts_np = seq.as_array()
    shift_list = [(float(s[0]), float(s[1])) for s in shifts_np]
    kernel_np = model.blur_operator.kernel.astype(np.float32)
    kernel = jnp.asarray(kernel_np)

    timeit(jax.jit(lambda v: data_term_cost_and_grad(v, obs, shifts, kernel, scale, 3)),
           x, label="data term (traced shifts, conv)")
    timeit(jax.jit(lambda v: data_term_cost_and_grad_static(v, obs, shifts_np, kernel, scale)),
           x, label="data term (static shifts, conv)")
    timeit(jax.jit(lambda v: static_shifted_data_term(v, obs, shift_list, kernel_np, scale)),
           x, label="data term (static shifts, shifted-add blur)")
    timeit(jax.jit(lambda v: pallas_variant(v, obs, shifts_np, kernel_np, scale)),
           x, label="data term (fused pallas kernel)")
    timeit(jax.jit(lambda v: correlate2d(v, kernel)), x, label="conv blur alone")
    timeit(jax.jit(lambda v: correlate2d_shifted(v, kernel_np)), x, label="shifted blur alone")
    w = jnp.ones_like(x)
    timeit(jax.jit(lambda v: tv_cost_and_grad(v, 0.01 * w)), x, label="tv cost+grad")

    tv = TotalVariationRegularizer()
    weights = (w,)

    def time_solve(label, **vg_kwargs):
        solve = jax.jit(
            lambda x0: minimize(
                lambda z: make_map_value_and_grad(
                    obs, shifts, kernel, scale, [(tv, 0.01)], **vg_kwargs
                )(z, weights),
                x0,
                max_iterations=50,
                gradient_norm_threshold=0.0,
                cost_decrease_threshold=0.0,
                parameter_variation_threshold=0.0,
            )
        )
        r = solve(jnp.zeros_like(x))
        jax.block_until_ready(r.x)
        t0 = time.perf_counter()
        r = solve(jnp.zeros_like(x))
        jax.block_until_ready(r.x)
        dt = time.perf_counter() - t0
        print(f"50 CG iters ({label}): {dt*1e3:.1f} ms -> {dt*1e3/50:.2f} ms/iter "
              f"({50 * x.size / dt / 1e6:.1f} Mpixel-iters/s)  final cost {float(r.cost):.6f}")

    time_solve("traced+conv")
    time_solve("static+conv", static_shifts=shifts_np)
    time_solve("pallas fused", static_shifts=shifts_np, use_pallas=True)


if __name__ == "__main__":
    main()
