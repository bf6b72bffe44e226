"""TPU validation of the shift-generic fused kernel (ops/pallas/degrade.py).

1. Compile the dynamic kernel at bench scale (dallas 1000^2, 4x, 4 frames,
   fused TV) and check numerics against the shift-specialized kernel.
2. Prove ONE compiled executable serves multiple shift sets (jit cache size).
3. Time static vs dynamic on integer and fractional shift sets.

Run:  python experiments/tpu_dynamic_kernel_check.py
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
from super_resolution_tpu.ops.pallas.degrade import (  # noqa: E402
    choose_tile,
    pallas_data_term_cost_and_grad,
)

SCALE = 4
H = W = 1000
K = 4
BOUND = 2.0


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, H, W)), jnp.float32)
    obs = jnp.asarray(rng.random((K, 1, H // SCALE, W // SCALE)), jnp.float32)
    kernel = np.asarray(gaussian_kernel_2d(3, 1.5), np.float32)
    tvc = jnp.asarray(rng.random((1, H, W)), jnp.float32) * 0.01

    int_shifts = np.asarray([(0, 0), (1, 1), (0, 1), (1, 0)], np.float32)
    frac_shifts = np.asarray(
        [(0.3, -0.7), (1.1, 1.6), (-0.4, 1.2), (1.9, -0.2)], np.float32
    )

    tile = choose_tile(1, SCALE, K, None, kernel, use_tv=True,
                       shift_bound=BOUND)
    print("tile (dynamic geometry):", tile, flush=True)

    @jax.jit
    def dyn(x, obs, shifts, tvc):
        return pallas_data_term_cost_and_grad(
            x, obs, None, kernel, SCALE, tile=tile, tv_constants=tvc,
            dynamic_shifts=shifts, shift_bound=BOUND,
        )

    t0 = time.perf_counter()
    c_d, g_d = jax.block_until_ready(dyn(x, obs, jnp.asarray(int_shifts), tvc))
    print(f"dynamic kernel compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

    # Static (specialized) references for both shift sets.
    results = {}
    for name, shifts in (("int", int_shifts), ("frac", frac_shifts)):
        fn = jax.jit(
            lambda x, obs, tvc, shifts=shifts: pallas_data_term_cost_and_grad(
                x, obs, shifts, kernel, SCALE, tile=tile, tv_constants=tvc
            )
        )
        t0 = time.perf_counter()
        c_s, g_s = jax.block_until_ready(fn(x, obs, tvc))
        print(f"static[{name}] compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
        results[name] = (fn, c_s, g_s)

    # Numerics: dynamic == static on both sets, one executable for both.
    for name, shifts in (("int", int_shifts), ("frac", frac_shifts)):
        c_d, g_d = jax.block_until_ready(dyn(x, obs, jnp.asarray(shifts), tvc))
        _, c_s, g_s = results[name]
        cerr = abs(float(c_d) - float(c_s)) / max(abs(float(c_s)), 1e-30)
        gerr = float(jnp.max(jnp.abs(g_d - g_s)))
        gref = float(jnp.max(jnp.abs(g_s)))
        print(f"{name}: rel cost err {cerr:.2e}, grad err {gerr:.3e} "
              f"(max |g| {gref:.3e})", flush=True)
        assert cerr < 1e-5 and gerr < 1e-4 * max(gref, 1.0), "numerics mismatch"
    n_compiles = dyn._cache_size()
    print(f"dynamic jit cache size after 2 shift sets: {n_compiles}", flush=True)
    assert n_compiles == 1, "expected ONE compiled executable"

    # Timing: 30 back-to-back evals, serialized through a data dependency.
    def timed(fn, *args, reps=30):
        out = jax.block_until_ready(fn(*args))  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1e3

    for name, shifts in (("int", int_shifts), ("frac", frac_shifts)):
        fn_s = results[name][0]
        t_s = timed(fn_s, x, obs, tvc)
        t_d = timed(dyn, x, obs, jnp.asarray(shifts), tvc)
        print(f"{name}: static {t_s:.3f} ms/eval, dynamic {t_d:.3f} ms/eval, "
              f"ratio {t_d/t_s:.3f}", flush=True)

    print("CHECK PASS", flush=True)


if __name__ == "__main__":
    main()
