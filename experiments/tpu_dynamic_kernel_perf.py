"""TPU perf: shift-generic kernel vs specialized kernel vs traced path.

All variants evaluate the same MAP objective (dallas-bench geometry: 1000^2
HR, 4x, 4 frames, fused/added TV lambda=0.01) with the IRLS weight windows
packed ONCE via vg.prepare() — i.e. exactly what one CG iteration pays.
Also times the full 50-iteration CG solve for static vs dynamic.

Run:  python experiments/tpu_dynamic_kernel_perf.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/srtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from super_resolution_tpu.ops.blur import gaussian_kernel_2d  # noqa: E402
from super_resolution_tpu.ops.tv import TotalVariationRegularizer  # noqa: E402
from super_resolution_tpu.solvers import make_map_value_and_grad, minimize  # noqa: E402

SCALE = 4
H = W = 1000
K = 4
BOUND = 2.0

INT_SHIFTS = np.asarray([(0, 0), (1, 1), (0, 1), (1, 0)], np.float32)
FRAC_SHIFTS = np.asarray(
    [(0.3, -0.7), (1.1, 1.6), (-0.4, 1.2), (1.9, -0.2)], np.float32
)


def timed_eval(prepared, x, reps=50):
    out = jax.block_until_ready(prepared(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = prepared(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, H, W)), jnp.float32)
    obs = jnp.asarray(rng.random((K, 1, H // SCALE, W // SCALE)), jnp.float32)
    kernel = jnp.asarray(gaussian_kernel_2d(3, 1.5), jnp.float32)
    tv = TotalVariationRegularizer()
    regs = [(tv, 0.01)]
    weights = (jnp.ones_like(x),)

    def build(kind, tile, shifts_np):
        kwargs = dict(max_shift=3)
        if kind == "static":
            kwargs.update(static_shifts=shifts_np, use_pallas=True,
                          pallas_tile=tile)
        elif kind == "dynamic":
            kwargs.update(use_pallas=True, pallas_tile=tile,
                          pallas_shift_bound=BOUND)
        elif kind == "traced":
            pass  # vmapped traced-shift path (the estimated-motion fallback)
        elif kind == "traced_static":
            kwargs.update(static_shifts=shifts_np)
        vg = make_map_value_and_grad(
            obs, jnp.asarray(shifts_np), kernel, SCALE, regs, **kwargs
        )
        prepared = vg.prepare(weights)
        return jax.jit(prepared)

    cases = [
        ("static  (256,1024) int ", "static", (256, 1024), INT_SHIFTS),
        ("static  (128,1024) int ", "static", (128, 1024), INT_SHIFTS),
        ("static  (128,1024) frac", "static", (128, 1024), FRAC_SHIFTS),
        ("dynamic (128,1024) int ", "dynamic", (128, 1024), INT_SHIFTS),
        ("dynamic (128,1024) frac", "dynamic", (128, 1024), FRAC_SHIFTS),
        ("dynamic (256,1024) int ", "dynamic", (256, 1024), INT_SHIFTS),
        ("dynamic (256, 512) int ", "dynamic", (256, 512), INT_SHIFTS),
        ("dynamic (128, 512) frac", "dynamic", (128, 512), FRAC_SHIFTS),
        ("traced  (vmap)     frac", "traced", 0, FRAC_SHIFTS),
    ]
    for label, kind, tile, shifts_np in cases:
        try:
            t0 = time.perf_counter()
            fn = build(kind, tile, shifts_np)
            ms = timed_eval(fn, x)
            print(f"{label}: {ms:7.3f} ms/eval  "
                  f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)

    # Full 50-iteration CG solves (the bench's unit): static vs dynamic.
    def build_solve(kind, tile):
        def solve(x0, observations, shifts, weights):
            kwargs = dict(max_shift=3)
            if kind == "static":
                kwargs.update(static_shifts=INT_SHIFTS, use_pallas=True,
                              pallas_tile=tile)
            else:
                kwargs.update(use_pallas=True, pallas_tile=tile,
                              pallas_shift_bound=BOUND)
            vg = make_map_value_and_grad(
                observations, shifts, kernel, SCALE, regs, **kwargs
            )
            return minimize(
                vg.prepare(weights), x0, method="cg", max_iterations=50,
                gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
                parameter_variation_threshold=0.0,
            )
        return jax.jit(solve)

    hr_pixels = H * W
    for kind, tile in (("static", (256, 1024)), ("dynamic", (128, 1024)),
                       ("dynamic", (256, 1024))):
        try:
            fn = build_solve(kind, tile)
            args = (jnp.zeros_like(x), obs, jnp.asarray(INT_SHIFTS), weights)
            r = jax.block_until_ready(fn(*args))
            t0 = time.perf_counter()
            r = fn(*args)
            jax.block_until_ready(r.x)
            dt = time.perf_counter() - t0
            mpix = int(r.iterations) * hr_pixels / dt / 1e6
            print(f"solve {kind} {tile}: {dt:.3f} s / {int(r.iterations)} iters "
                  f"= {mpix:.1f} Mpix-it/s, cost {float(r.cost):.4f}, "
                  f"evals {int(r.num_evaluations)}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"solve {kind} {tile}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)

    print("PERF DONE", flush=True)


if __name__ == "__main__":
    main()
