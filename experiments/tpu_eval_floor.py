"""Eval-only floor for the flagship solve: what would 50 bare objective
evaluations cost with ZERO solver algebra between them?

Attribution for the round-5 linear_cg frontier: the paired A/B took the
flagship to 1.09x Wolfe-CG at 51-vs-78 evaluations — if 51 bare evals in a
fori_loop run much faster than the 51-eval linear_cg solve, the residual
per-iteration algebra (4 reduction passes + ~6 map passes over the
phase-plane state) is the next target; if they run at similar speed, the
evaluation itself is the wall and the solver is done.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SRTPU_COMPILE_CACHE", "/tmp/srtpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    import bench
    from super_resolution_tpu.ops.tv import TotalVariationRegularizer
    from super_resolution_tpu.solvers import make_map_value_and_grad, minimize

    gt, observations, shifts, kernel = bench._dallas_problem(np.float32)
    regs = [(TotalVariationRegularizer(), 0.01)]
    weights = (jnp.ones(gt.shape, jnp.float32),)
    static_shifts = np.asarray(shifts)

    def build_vg():
        return make_map_value_and_grad(
            observations, shifts, kernel, 4, regs, max_shift=3,
            static_shifts=static_shifts, use_pallas=True,
            pallas_tile=(512, 1024), phase_io=True,
        )

    @jax.jit
    def eval_only(x0, weights):
        vg = build_vg()
        prepared = vg.prepare(weights)

        def body(i, carry):
            x, acc = carry
            # A minimal data dependence chain (x drifts by a scaled copy of
            # the gradient) so the 50 evaluations cannot be collapsed, with
            # only ONE map pass between evals.
            f, g = prepared(x)
            return x - 1e-6 * g, acc + f

        x, acc = lax.fori_loop(
            0, 50, body, (vg.to_planes(jnp.zeros(gt.shape, jnp.float32)),
                          jnp.zeros((), jnp.float32))
        )
        return acc, vg.from_planes(x)

    @jax.jit
    def solve_lin(x0, observations, shifts, weights):
        vg = build_vg()
        result = minimize(
            vg.prepare(weights), vg.to_planes(jnp.zeros(gt.shape, jnp.float32)),
            method="linear_cg", max_iterations=50,
            gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
            parameter_variation_threshold=0.0,
        )
        return result._replace(x=vg.from_planes(result.x))

    x0 = jnp.zeros(gt.shape, jnp.float32)

    def timed(fn, *args):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
        return time.perf_counter() - t0

    timed(eval_only, x0, weights)  # compile
    timed(solve_lin, x0, observations, shifts, weights)
    pairs = []
    for i in range(5):
        a = timed(eval_only, x0, weights)
        b = timed(solve_lin, x0, observations, shifts, weights)
        b2 = timed(solve_lin, x0, observations, shifts, weights)
        a2 = timed(eval_only, x0, weights)
        pairs.append(round((b + b2) / (a + a2), 4))
        print(json.dumps({
            "round": i, "eval_only_s": [round(a, 4), round(a2, 4)],
            "linear_cg_s": [round(b, 4), round(b2, 4)],
            "solve_over_evalfloor": pairs[-1],
        }), flush=True)
    print(json.dumps({
        "metric": "flagship_linear_cg_vs_eval_floor",
        "median_ratio": sorted(pairs)[len(pairs) // 2],
        "note": "ratio-1 = fraction of the solve that is loop algebra, "
                "not objective evaluations",
    }), flush=True)


if __name__ == "__main__":
    main()
