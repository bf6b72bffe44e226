"""Round-5 chip session: slice-graph variants + linear_cg + bf16 A/Bs.

Every comparison is BACK-TO-BACK within one process (the tunnel drifts
5-30% across windows — only in-session deltas are trustworthy, CLAUDE.md),
with the round-4 production configuration re-measured first in every group
as the anchor. Groups run in separate processes (a poisoned PJRT client
must not corrupt later groups): run via

    for g in base composite stacked btv bf16; do
        nohup timeout 3500 python experiments/tpu_round5_ab.py --group $g \
            >> /tmp/r5ab_$g.log 2>&1
    done

Each variant prints ONE JSON line: flagship (dallas 4x MAP+TV, 50 CG iters,
(512,1024) tile, phase-plane state) full-solve throughput, final cost, and
PSNR vs ground truth.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _setup():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SRTPU_COMPILE_CACHE", "/tmp/srtpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _problem(dtype=np.float32, rgb=False, shifts=((0, 0), (1, 1), (0, 1), (1, 0))):
    import bench

    return bench._dallas_problem(dtype, scale=4, shifts=shifts, rgb=rgb)


def flagship_variant(name, method="cg", composite=False, stacked=False,
                     regs="tv", iters=50, repeats=3, dtype=np.float32,
                     tile=None):
    """One full-solve measurement; returns the JSON dict (or error)."""
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.evaluation.metrics import psnr
    from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
    from super_resolution_tpu.ops.tv import TotalVariationRegularizer
    from super_resolution_tpu.solvers import make_map_value_and_grad, minimize

    gt, observations, shifts, kernel = _problem(dtype)
    reg_list = (
        [(TotalVariationRegularizer(), 0.01)]
        if regs == "tv"
        else [(BilateralTotalVariationRegularizer(3, 0.5), 0.01)]
    )
    if tile is None:
        tile = (512, 1024) if regs == "tv" else (128, 1024)
    weights = (jnp.ones(gt.shape, dtype),)
    static_shifts = np.asarray(shifts)

    @jax.jit
    def solve(x0, observations, shifts, weights):
        vg = make_map_value_and_grad(
            observations, shifts, kernel, 4, reg_list, max_shift=3,
            static_shifts=static_shifts, use_pallas=True, pallas_tile=tile,
            phase_io=True,
            pallas_composite_data_term=composite,
            **({"pallas_tv_stacked": True} if stacked else {}),
        )
        result = minimize(
            vg.prepare(weights), vg.to_planes(jnp.zeros(gt.shape, dtype)),
            method=method, max_iterations=iters,
            gradient_norm_threshold=0.0, cost_decrease_threshold=0.0,
            parameter_variation_threshold=0.0,
        )
        return result._replace(x=vg.from_planes(result.x))

    x0 = jnp.zeros(gt.shape, dtype)
    try:
        t_c = time.perf_counter()
        result = solve(x0, observations, shifts, weights)
        jax.block_until_ready(result.x)
        t_c = time.perf_counter() - t_c
        values = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            result = solve(x0, observations, shifts, weights)
            jax.block_until_ready(result.x)
            values.append(
                int(result.iterations) * gt.size / (time.perf_counter() - t0) / 1e6
            )
        interior = (slice(None), slice(8, -8), slice(8, -8))
        out = {
            "variant": name,
            "mpix_iters_per_s": round(max(values), 1),
            "spread": [round(min(values), 1), round(max(values), 1)],
            "final_cost": round(float(result.cost), 4),
            "evals": int(result.num_evaluations),
            "iters": int(result.iterations),
            "psnr_db": round(float(psnr(np.asarray(result.x), np.asarray(gt))), 3),
            "psnr_interior_db": round(float(
                psnr(np.asarray(result.x)[interior], np.asarray(gt)[interior])
            ), 3),
            "compile_or_warm_s": round(t_c, 1),
        }
    except Exception as e:  # noqa: BLE001 — record, don't crash the group
        out = {"variant": name, "error": f"{type(e).__name__}: {e}"[:500]}
    print(json.dumps(out), flush=True)
    return out


def group_base():
    flagship_variant("r4_prod_cg", method="cg")
    flagship_variant("linear_cg", method="linear_cg")


def group_composite():
    flagship_variant("anchor_cg", method="cg")
    flagship_variant("composite_cg", method="cg", composite=True)
    flagship_variant("composite_linear_cg", method="linear_cg", composite=True)


def group_stacked():
    flagship_variant("anchor_cg", method="cg")
    flagship_variant("tv_stacked_cg", method="cg", stacked=True)
    flagship_variant("full_stack_linear_cg", method="linear_cg",
                     composite=True, stacked=True)


def group_bigtile():
    """Composite mode frees the z1/g1 VMEM intermediates — probe whether
    the freed headroom lets bigger tiles (fewer grid steps, less per-step
    scheduling) win on the full production stack."""
    flagship_variant("prod_512x1024", method="linear_cg", composite=True,
                     stacked=True)
    flagship_variant("prod_1024x1024", method="linear_cg", composite=True,
                     stacked=True, tile=(1024, 1024))
    flagship_variant("prod_512x2048", method="linear_cg", composite=True,
                     stacked=True, tile=(512, 2048))
    flagship_variant("prod_256x1024", method="linear_cg", composite=True,
                     stacked=True, tile=(256, 1024))
    flagship_variant("btv_256x1024", method="linear_cg", composite=True,
                     regs="btv", tile=(256, 1024))


def group_btv():
    flagship_variant("btv_cg", method="cg", regs="btv")
    flagship_variant("btv_linear_cg", method="linear_cg", regs="btv")
    flagship_variant("btv_composite_linear_cg", method="linear_cg",
                     regs="btv", composite=True)


def group_bf16():
    """Re-probe bf16 kernel arithmetic (r3: remote Mosaic HTTP 500)."""
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.ops.pallas.degrade import (
        pallas_data_term_cost_and_grad,
    )

    gt, observations, shifts, kernel = _problem(np.float32)
    static_shifts = np.asarray(shifts)

    def eval_once(dtype):
        x = jnp.asarray(np.asarray(gt), dtype)
        obs = jnp.asarray(np.asarray(observations), dtype)

        @jax.jit
        def f(x, obs):
            return pallas_data_term_cost_and_grad(
                x, obs, static_shifts, np.asarray(kernel), 4, tile=(512, 1024)
            )

        c, g = f(x, obs)
        jax.block_until_ready(g)
        ts = []
        for _ in range(30):
            t0 = time.perf_counter()
            c, g = f(x, obs)
            jax.block_until_ready(g)
            ts.append(time.perf_counter() - t0)
        return float(c), np.asarray(g, np.float32), min(ts)

    try:
        c32, g32, t32 = eval_once(jnp.float32)
        out32 = {"variant": "bf16_probe_f32", "eval_s": round(t32, 5),
                 "cost": c32}
        print(json.dumps(out32), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": "bf16_probe_f32",
                          "error": str(e)[:300]}), flush=True)
        return
    try:
        c16, g16, t16 = eval_once(jnp.bfloat16)
        rel = float(np.linalg.norm(g16 - g32) / max(np.linalg.norm(g32), 1e-30))
        print(json.dumps({
            "variant": "bf16_probe_bf16", "eval_s": round(t16, 5),
            "cost": c16, "speedup_vs_f32": round(t32 / t16, 3),
            "grad_rel_err": round(rel, 6),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": "bf16_probe_bf16",
                          "error": str(e)[:500]}), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--group", required=True,
                   choices=["base", "composite", "stacked", "btv", "bf16",
                            "bigtile"])
    args = p.parse_args()
    _setup()
    {"base": group_base, "composite": group_composite,
     "stacked": group_stacked, "btv": group_btv, "bf16": group_bf16,
     "bigtile": group_bigtile}[args.group]()


if __name__ == "__main__":
    main()
