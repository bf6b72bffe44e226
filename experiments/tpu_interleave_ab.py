"""Interleaved flagship A/B: Wolfe-CG vs linear_cg, paired samples.

The tunnel drifts 10-30% on hour scales and even minutes apart (round-5
sessions measured the SAME cached program at 788-949 Mpix-it/s within one
hour), so adjacent-but-serial A/Bs cannot resolve a ~10% question. This
harness compiles BOTH solvers first, then alternates timed solves
A,B,A,B,... and reports the PAIRED ratio per round — drift cancels to
first order within each pair.

Question it settles: does the exact-step linear_cg's eval-count win
(51 vs 78 evaluations per 50 iterations) survive as wall-clock on the TV
flagship, where serial comparisons suggested parity?
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(rounds=6):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SRTPU_COMPILE_CACHE", "/tmp/srtpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import bench
    from super_resolution_tpu.ops.tv import TotalVariationRegularizer
    from super_resolution_tpu.solvers import make_map_value_and_grad, minimize

    gt, observations, shifts, kernel = bench._dallas_problem(np.float32)
    regs = [(TotalVariationRegularizer(), 0.01)]
    weights = (jnp.ones(gt.shape, jnp.float32),)
    static_shifts = np.asarray(shifts)

    def build(method):
        @jax.jit
        def solve(x0, observations, shifts, weights):
            vg = make_map_value_and_grad(
                observations, shifts, kernel, 4, regs, max_shift=3,
                static_shifts=static_shifts, use_pallas=True,
                pallas_tile=(512, 1024), phase_io=True,
            )
            result = minimize(
                vg.prepare(weights), vg.to_planes(jnp.zeros(gt.shape, jnp.float32)),
                method=method, max_iterations=50,
                gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
                parameter_variation_threshold=0.0,
            )
            return result._replace(x=vg.from_planes(result.x))
        return solve

    solvers = {"cg": build("cg"), "linear_cg": build("linear_cg")}
    x0 = jnp.zeros(gt.shape, jnp.float32)

    def timed(name):
        t0 = time.perf_counter()
        r = solvers[name](x0, observations, shifts, weights)
        jax.block_until_ready(r.x)
        dt = time.perf_counter() - t0
        return 50 * gt.size / dt / 1e6, r

    # Compile + warm both BEFORE any timing.
    for name in solvers:
        _, r = timed(name)
        print(json.dumps({"warm": name, "evals": int(r.num_evaluations),
                          "cost": round(float(r.cost), 4)}), flush=True)

    pairs = []
    for i in range(rounds):
        a, _ = timed("cg")
        b, _ = timed("linear_cg")
        b2, _ = timed("linear_cg")
        a2, _ = timed("cg")   # ABBA ordering kills linear drift
        ratio = (b + b2) / (a + a2)
        pairs.append({"round": i, "cg": [round(a, 1), round(a2, 1)],
                      "linear_cg": [round(b, 1), round(b2, 1)],
                      "ratio_linear_over_cg": round(ratio, 4)})
        print(json.dumps(pairs[-1]), flush=True)
    ratios = [p["ratio_linear_over_cg"] for p in pairs]
    print(json.dumps({
        "metric": "flagship_linear_cg_vs_cg_paired",
        "median_ratio": round(sorted(ratios)[len(ratios) // 2], 4),
        "ratios": ratios,
    }), flush=True)


if __name__ == "__main__":
    main()
