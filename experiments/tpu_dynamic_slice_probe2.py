"""Probe round 2: supported primitives for the shift-generic kernel gathers.

Round 1 (tpu_dynamic_slice_probe.py) established: dynamic leading-axis
indexing compiles (A); dynamic pl.ds starts on sublane/lane axes crash the
Mosaic remote compiler (B/C/E). This round probes the workarounds and their
relative cost at realistic plane sizes:

  F. lax.switch with array results (static slices inside branches)
  G. pltpu.roll with traced shift, sublane + lane axes, semantics check
  H. VMEM scratch: static-index write, dynamic-index read (adjoint g1 path)
  I. scalar-predicate jnp.where between two static slices
  J. cost microbench: static slice+FMA vs dyn-plane vs 4-way select vs rolls

Run CPU (interpret): python experiments/tpu_dynamic_slice_probe2.py cpu
Run TPU (compile):   python experiments/tpu_dynamic_slice_probe2.py tpu
"""

import sys
import time

import numpy as np

interpret = len(sys.argv) > 1 and sys.argv[1] == "cpu"
import jax

if interpret:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/srtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, R, C = 16, 80, 272   # like s*s phase planes of a (256,1024)/s=4 window
N_R, N_C = 72, 264      # n1-like extent


def make(kernel, out_shape, n_smem=3, scratch=None):
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_smem,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((P, R, C), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(out_shape, lambda i: tuple(0 for _ in out_shape)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=scratch or [],
        interpret=interpret,
    )


def kernel_f(s_ref, x_ref, o_ref):  # lax.switch, array results
    p = s_ref[0]
    q = s_ref[1]  # 0..2 selects which static row offset

    def mk(off):
        return lambda: x_ref[p, off : off + N_R, :N_C] * 2.0

    o_ref[:] = lax.switch(q, [mk(0), mk(1), mk(2)])


def kernel_g(s_ref, x_ref, o_ref):  # roll semantics: sublane and lane
    r = s_ref[1]
    c = s_ref[2]
    plane = x_ref[0]
    rolled = pltpu.roll(plane, R - r, 0)   # want plane[r:r+N_R] at rows 0..
    rolled = pltpu.roll(rolled, C - c, 1)  # want cols c:c+N_C at cols 0..
    o_ref[:] = rolled[:N_R, :N_C]


def kernel_h(s_ref, x_ref, o_ref, scr):  # scratch static write, dyn read
    p = s_ref[0]
    for i in range(4):
        scr[i] = x_ref[i, :N_R, :N_C] * (i + 1.0)
    o_ref[:] = scr[p]


def kernel_i(s_ref, x_ref, o_ref):  # scalar-pred select of two static slices
    q = s_ref[1]
    p = s_ref[0]
    a = x_ref[p, 0:N_R, :N_C]
    b = x_ref[p, 1 : 1 + N_R, :N_C]
    o_ref[:] = jnp.where(q == 1, b, a)


REPS = 48  # taps per timing kernel ~= one frame's stage-1 gather count


def kernel_j_static(s_ref, x_ref, o_ref):
    acc = jnp.zeros((N_R, N_C), jnp.float32)
    for i in range(REPS):
        acc = acc + x_ref[i % P, (i % 3) : (i % 3) + N_R, :N_C] * (1.0 + i)
    o_ref[:] = acc


def kernel_j_dynplane(s_ref, x_ref, o_ref):
    acc = jnp.zeros((N_R, N_C), jnp.float32)
    for i in range(REPS):
        p = (s_ref[0] + i) % P
        acc = acc + x_ref[p, (i % 3) : (i % 3) + N_R, :N_C] * (1.0 + i)
    o_ref[:] = acc


def kernel_j_select4(s_ref, x_ref, o_ref):
    qr = s_ref[1]
    qc = s_ref[2]
    acc = jnp.zeros((N_R, N_C), jnp.float32)
    for i in range(REPS):
        p = (s_ref[0] + i) % P
        s00 = x_ref[p, 0:N_R, 0:N_C]
        s01 = x_ref[p, 0:N_R, 1 : 1 + N_C]
        s10 = x_ref[p, 1 : 1 + N_R, 0:N_C]
        s11 = x_ref[p, 1 : 1 + N_R, 1 : 1 + N_C]
        row = jnp.where(qr == 1, s10, s00)
        row2 = jnp.where(qr == 1, s11, s01)
        sl = jnp.where(qc == 1, row2, row)
        acc = acc + sl * (1.0 + i)
    o_ref[:] = acc


def kernel_j_roll(s_ref, x_ref, o_ref):
    qr = s_ref[1]
    qc = s_ref[2]
    acc = jnp.zeros((N_R, N_C), jnp.float32)
    for i in range(REPS):
        p = (s_ref[0] + i) % P
        plane = pltpu.roll(pltpu.roll(x_ref[p], R - qr, 0), C - qc, 1)
        acc = acc + plane[:N_R, :N_C] * (1.0 + i)
    o_ref[:] = acc


def kernel_j_switch9(s_ref, x_ref, o_ref):
    qr = s_ref[1]
    qc = s_ref[2]
    acc = jnp.zeros((N_R, N_C), jnp.float32)
    for i in range(REPS):
        p = (s_ref[0] + i) % P

        def mk(orr, occ):
            return lambda: x_ref[p, orr : orr + N_R, occ : occ + N_C]

        sl = lax.switch(qr * 3 + qc, [mk(a, b) for a in range(3) for b in range(3)])
        acc = acc + sl * (1.0 + i)
    o_ref[:] = acc


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((P, R, C)), jnp.float32)
    xn = np.asarray(x)
    s = jnp.asarray([3, 1, 2], jnp.int32)

    def run(name, kern, ref, scratch=None, time_it=False):
        try:
            t0 = time.perf_counter()
            fn = jax.jit(
                lambda s, x, kern=kern: make(kern, (N_R, N_C), scratch=scratch)(s, x)
            )
            out = np.asarray(jax.block_until_ready(fn(s, x)))
            dt = time.perf_counter() - t0
            ok = ref is None or np.allclose(out, ref, atol=1e-6)
            print(f"{name}: {'OK' if ok else 'WRONG RESULT'} (compile+run {dt:.1f}s)")
            if time_it:
                for _ in range(3):
                    jax.block_until_ready(fn(s, x))
                t0 = time.perf_counter()
                for _ in range(300):
                    out = fn(s, x)
                jax.block_until_ready(out)
                print(f"  300 calls: {(time.perf_counter()-t0)*1e3:.1f} ms")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split(chr(10))[0][:240]
            print(f"{name}: FAILED — {type(e).__name__}: {msg}")

    run("F_switch_array", kernel_f, xn[3, 1 : 1 + N_R, :N_C] * 2.0)
    run("G_roll_extract", kernel_g, xn[0, 1 : 1 + N_R, 2 : 2 + N_C])
    run("H_scratch_dyn_read", kernel_h, xn[3, :N_R, :N_C] * 4.0,
        scratch=[pltpu.VMEM((4, N_R, N_C), jnp.float32)])
    run("I_select2", kernel_i, xn[3, 1 : 1 + N_R, :N_C])

    # Timing ladder (all produce different results; correctness not checked
    # beyond finiteness — the point is relative cost of the gather styles).
    for name, kern in [
        ("J1_static", kernel_j_static),
        ("J2_dynplane", kernel_j_dynplane),
        ("J3_select4", kernel_j_select4),
        ("J4_roll", kernel_j_roll),
        ("J5_switch9", kernel_j_switch9),
    ]:
        run(name, kern, None, time_it=True)


if __name__ == "__main__":
    main()
