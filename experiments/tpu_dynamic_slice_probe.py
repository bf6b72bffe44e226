"""Probe: which dynamic-indexing constructs does this Mosaic toolchain
support (and at what cost)?  Feeds the shift-generic fused-kernel design.

Constructs probed, each as a minimal pallas kernel:
  A. dynamic index on a leading (non-tiled) axis of a VMEM ref
  B. dynamic slice start on the sublane (2nd-minor) axis
  C. dynamic slice start on the lane (minor) axis
  D. pltpu.roll with a traced shift along the lane axis
  E. all of A+B+C combined (the access shape the generic kernel needs)

Run CPU (interpret): python experiments/tpu_dynamic_slice_probe.py cpu
Run TPU (compile):   python experiments/tpu_dynamic_slice_probe.py tpu
"""

import sys
import time

import numpy as np

interpret = len(sys.argv) > 1 and sys.argv[1] == "cpu"
if interpret:
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/srtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, C, H, W = 8, 2, 64, 256
N = 32  # slice extent


def make(kernel, out_shape):
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((3,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((P, C, H, W), lambda i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(out_shape, lambda i: tuple(0 for _ in out_shape)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        interpret=interpret,
    )


def kernel_a(s_ref, x_ref, o_ref):  # dynamic leading-axis index
    p = s_ref[0]
    o_ref[:] = x_ref[p, 0, :N, :N]


def kernel_b(s_ref, x_ref, o_ref):  # dynamic sublane start
    r = s_ref[1]
    o_ref[:] = x_ref[0, 0, pl.ds(r, N), :N]


def kernel_c(s_ref, x_ref, o_ref):  # dynamic lane start
    c = s_ref[2]
    o_ref[:] = x_ref[0, 0, :N, pl.ds(c, N)]


def kernel_d(s_ref, x_ref, o_ref):  # dynamic lane roll + static slice
    c = s_ref[2]
    row = pltpu.roll(x_ref[0, 0, :N, :], c, 1)
    o_ref[:] = row[:, :N]


def kernel_e(s_ref, x_ref, o_ref):  # combined dynamic plane+sublane+lane
    p, r, c = s_ref[0], s_ref[1], s_ref[2]
    o_ref[:] = x_ref[p, 1, pl.ds(r, N), pl.ds(c, N)]


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((P, C, H, W)), jnp.float32)
    xn = np.asarray(x)
    s = jnp.asarray([3, 5, 7], jnp.int32)

    cases = {
        "A_dyn_plane": (kernel_a, lambda: xn[3, 0, :N, :N]),
        "B_dyn_sublane": (kernel_b, lambda: xn[0, 0, 5 : 5 + N, :N]),
        "C_dyn_lane": (kernel_c, lambda: xn[0, 0, :N, 7 : 7 + N]),
        "D_dyn_roll": (kernel_d, lambda: np.roll(xn[0, 0, :N, :], -7, 1)[:, :N]),
        "E_combined": (kernel_e, lambda: xn[3, 1, 5 : 5 + N, 7 : 7 + N]),
    }
    for name, (kern, ref) in cases.items():
        try:
            t0 = time.perf_counter()
            fn = jax.jit(lambda s, x, kern=kern: make(kern, (N, N))(s, x))
            out = np.asarray(jax.block_until_ready(fn(s, x)))
            dt = time.perf_counter() - t0
            ok = np.allclose(out, ref())
            print(f"{name}: {'OK' if ok else 'WRONG RESULT'} (compile+run {dt:.1f}s)")
            if ok:
                # Hot-loop timing: 200 calls.
                t0 = time.perf_counter()
                for _ in range(200):
                    out = fn(s, x)
                jax.block_until_ready(out)
                print(f"  200 calls: {(time.perf_counter()-t0)*1e3:.1f} ms")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split(chr(10))[0][:300]
            print(f"{name}: FAILED — {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
