"""Fused Pallas TPU kernel for the MAP data term (cost + gradient).

This is Pallas target #1 from SURVEY.md §3.3 — the innermost hot loop. For
each HR tile, one kernel invocation:

1. DMAs the tile plus a composite-stencil halo of the (pre-padded) HR
   estimate from HBM into VMEM once;
2. for every frame, applies the *composite* warp+blur+decimate stencil —
   warp taps (bilinear, <= 4) convolved with blur taps collapse into one
   static tap table, so the whole degradation is a sum of weighted shifted
   VMEM slices (pure VPU work, no conv dispatch, no intermediate HBM
   round-trips);
3. computes the masked LR residual against the observation tile and
   accumulates the squared-residual cost;
4. applies the composite *adjoint* stencil (zero-upsample + transposed blur +
   reverse warp, exactly the reference's gradient chain,
   ``objective_data_term.cpp:54-72``) and accumulates the gradient tile
   across frames — the gradient is written to HBM once per tile total.

HBM traffic per objective evaluation drops from ~20 materialized
intermediates to: read x (1 + halo overlap), read y, write grad, write
per-tile cost partials — within ~2x of the bandwidth lower bound.

Shifts must be compile-time constants (host-known motion — true for every
non-distributed solve). Semantics are identical to
``data_term_cost_and_grad_static``; the test suite checks equality to 1e-5
(f32) against the unfused path.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_data_term_cost_and_grad", "composite_taps"]


def _warp_taps(dx: float, dy: float):
    """Bilinear warp as taps: out(u) = sum_a w_a x(u + o_a).

    out(r, c) = x(r - dy, c - dx) bilinearly: with iy = floor(dy),
    fy = dy - iy, value = sum over a, b of w weights at offsets
    (-(iy + a), -(ix + b)).
    """
    iy, ix = math.floor(dy), math.floor(dx)
    fy, fx = dy - iy, dx - ix
    taps = []
    for a, wy in ((0, 1.0 - fy), (1, fy)):
        for b, wx in ((0, 1.0 - fx), (1, fx)):
            w = wy * wx
            if w != 0.0:
                taps.append((-(iy + a), -(ix + b), w))
    return taps


def composite_taps(dx: float, dy: float, kernel: np.ndarray | None):
    """Collapse warp+blur into one tap table, and build the adjoint table.

    Forward:  z(u) = sum_b k_b [warp x](u + o_b) = sum_{a,b} k_b w_a x(u + o_b + o_a)
    Adjoint (reference chain — warp by -shift after correlation with k^T):
              g(p) = sum_{a',b'} w_a' kT_b' r_up(p + o_b' + o_a')
    where the adjoint warp taps come from ``_warp_taps(-dx, -dy)``.
    Returns (fwd_taps, adj_taps) as lists of (dr, dc, weight).
    """
    if kernel is None:
        blur = [(0, 0, 1.0)]
        blur_t = [(0, 0, 1.0)]
    else:
        k = np.asarray(kernel, dtype=np.float64)
        kh, kw = k.shape
        mid_r, mid_c = kh // 2, kw // 2
        blur = [
            (i - mid_r, j - mid_c, float(k[i, j]))
            for i in range(kh)
            for j in range(kw)
            if k[i, j] != 0.0
        ]
        kt = k.T
        blur_t = [
            (i - kt.shape[0] // 2, j - kt.shape[1] // 2, float(kt[i, j]))
            for i in range(kt.shape[0])
            for j in range(kt.shape[1])
            if kt[i, j] != 0.0
        ]

    def merge(warp, blur_list):
        acc: dict[tuple[int, int], float] = {}
        for wr, wc, ww in warp:
            for br, bc, bw in blur_list:
                key = (wr + br, wc + bc)
                acc[key] = acc.get(key, 0.0) + ww * bw
        return [(r, c, w) for (r, c), w in acc.items() if w != 0.0]

    fwd = merge(_warp_taps(dx, dy), blur)
    adj = merge(_warp_taps(-dx, -dy), blur_t)
    return fwd, adj


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def pallas_data_term_cost_and_grad(
    x: jnp.ndarray,
    observations: jnp.ndarray,
    static_shifts,
    kernel: np.ndarray | None,
    scale: int,
    tile: int = 256,
    interpret: bool = False,
):
    """Fused data term: ``(cost, grad)`` of ``s^2 sum_k ||D B M_k x - y_k||^2``.

    ``x``: ``[C, H, W]``; ``observations``: ``[K, C, H/s, W/s]``;
    ``static_shifts``: host array ``[K, 2]`` of (dx, dy).
    """
    c, h, w = x.shape
    k_frames = observations.shape[0]
    s = int(scale)
    shift_list = [(float(sh[0]), float(sh[1])) for sh in np.asarray(static_shifts)]
    warp_taps = [_warp_taps(dx, dy) for dx, dy in shift_list]
    warp_adj_taps = [_warp_taps(-dx, -dy) for dx, dy in shift_list]
    if kernel is None:
        blur_taps = [(0, 0, 1.0)]
        blur_t_taps = [(0, 0, 1.0)]
        bp = 0
    else:
        kk = np.asarray(kernel, dtype=np.float64)
        kh, kw = kk.shape
        bp = max(kh // 2, kw // 2)
        blur_taps = [
            (i - kh // 2, j - kw // 2, float(kk[i, j]))
            for i in range(kh) for j in range(kw) if kk[i, j] != 0.0
        ]
        kt = kk.T
        blur_t_taps = [
            (i - kt.shape[0] // 2, j - kt.shape[1] // 2, float(kt[i, j]))
            for i in range(kt.shape[0]) for j in range(kt.shape[1]) if kt[i, j] != 0.0
        ]

    # Stencil reach and margins. wr = warp reach; bp = blur reach. The warp
    # output is cropped to the global image extent before the blur (reference
    # BORDER_CONSTANT semantics at each stage), so the stages stay separate
    # with an in-kernel global-extent mask between them.
    wr = 1
    for taps in warp_taps + warp_adj_taps:
        for dr, dc, _ in taps:
            wr = max(wr, abs(dr), abs(dc))
    r_reach = wr + bp
    p_ext = _round_up(r_reach, s)
    q_halo = p_ext + r_reach

    # Pad the problem: H, W up to tile multiples, plus Q on each side of x.
    hp = _round_up(h, tile)
    wp = _round_up(w, tile)
    n_ty, n_tx = hp // tile, wp // tile
    xp = jnp.pad(x, [(0, 0), (q_halo, q_halo + hp - h), (q_halo, q_halo + wp - w)])
    # Observations padded to the extended LR grid (+P/s each side).
    pe = p_ext // s
    yp = jnp.pad(
        observations,
        [(0, 0), (0, 0), (pe, pe + (hp - h) // s), (pe, pe + (wp - w) // s)],
    )
    # Validity mask of the global LR grid on the padded grid.
    mask_np = np.zeros((hp // s + 2 * pe, wp // s + 2 * pe), dtype=x.dtype)
    mask_np[pe : pe + h // s, pe : pe + w // s] = 1.0
    maskp = jnp.asarray(mask_np)

    ext = tile + 2 * p_ext          # HR extent of the residual region
    ext_lr = ext // s               # LR extent
    src = tile + 2 * q_halo         # HR extent of the x slice each tile reads

    def kernel_fn(xp_ref, yp_ref, mask_ref, grad_ref, cost_ref, xv, yv, mv, sems):
        ti = pl.program_id(0)
        tj = pl.program_id(1)

        # DMA x tile + halo, observation tiles, and mask tile into VMEM.
        copy_x = pltpu.make_async_copy(
            xp_ref.at[:, pl.ds(ti * tile, src), pl.ds(tj * tile, src)],
            xv,
            sems.at[0],
        )
        copy_y = pltpu.make_async_copy(
            yp_ref.at[:, :, pl.ds(ti * (tile // s), ext_lr), pl.ds(tj * (tile // s), ext_lr)],
            yv,
            sems.at[1],
        )
        copy_m = pltpu.make_async_copy(
            mask_ref.at[pl.ds(ti * (tile // s), ext_lr), pl.ds(tj * (tile // s), ext_lr)],
            mv,
            sems.at[2],
        )
        copy_x.start()
        copy_y.start()
        copy_m.start()
        copy_x.wait()
        copy_y.wait()
        copy_m.wait()

        xt = xv[:]          # [C, src, src]
        mask_t = mv[:]      # [ext_lr, ext_lr]
        grad_acc = jnp.zeros((c, tile, tile), dtype=xt.dtype)
        cost_acc = jnp.zeros((), dtype=jnp.float32)

        def hr_mask(region_size, lead):
            # Validity mask of the global HR extent [0,h)x[0,w) for a region
            # starting at global coords (ti*tile - lead, tj*tile - lead).
            gr0 = ti * tile - lead
            gc0 = tj * tile - lead
            rid = jax.lax.broadcasted_iota(jnp.int32, (region_size, region_size), 0)
            cid = jax.lax.broadcasted_iota(jnp.int32, (region_size, region_size), 1)
            valid = (
                (rid + gr0 >= 0) & (rid + gr0 < h) & (cid + gc0 >= 0) & (cid + gc0 < w)
            )
            return valid.astype(xt.dtype)

        ext1 = ext + 2 * bp            # warp-stage region (EXT + blur rim)
        off1 = q_halo - p_ext - bp     # its start in x-slice coords
        m_z1 = hr_mask(ext1, p_ext + bp)
        g1_size = tile + 2 * wr        # adjoint blur-stage region
        m_g1 = hr_mask(g1_size, wr)
        pe_l = p_ext // s

        for k in range(k_frames):
            # Stage 1: warp taps on x, then crop to the global extent.
            z1 = None
            for dr, dc, tw in warp_taps[k]:
                sl = xt[:, off1 + dr : off1 + dr + ext1, off1 + dc : off1 + dc + ext1]
                term = sl * jnp.asarray(tw, xt.dtype)
                z1 = term if z1 is None else z1 + term
            z1 = z1 * m_z1

            # Stage 2: blur taps on the dense EXT grid, then decimate by a
            # reshape + index-0 select (strided slices on 3D arrays lower to
            # unsupported >2D gathers in Mosaic; this form is pure slicing).
            z = None
            for dr, dc, tw in blur_taps:
                sl = z1[:, bp + dr : bp + dr + ext, bp + dc : bp + dc + ext]
                term = sl * jnp.asarray(tw, xt.dtype)
                z = term if z is None else z + term
            z_lr = z.reshape(c, ext_lr, s, ext_lr, s)[:, :, 0, :, 0]

            r = (z_lr - yv[k]) * mask_t
            # Cost: only this tile's own LR pixels (the EXT rim belongs to
            # neighboring tiles and would double-count).
            r_center = r[:, pe_l : pe_l + tile // s, pe_l : pe_l + tile // s]
            cost_acc = cost_acc + jnp.sum((r_center * r_center).astype(jnp.float32))

            # Adjoint stage 1: zero-upsample (interior-pad reshape) and apply
            # transposed blur taps over the tile +- warp-reach region.
            r_up = jnp.pad(
                r[:, :, None, :, None],
                ((0, 0), (0, 0), (0, s - 1), (0, 0), (0, s - 1)),
            ).reshape(c, ext, ext)
            g1 = None
            g1_off = p_ext - wr
            for dr, dc, tw in blur_t_taps:
                sl = r_up[
                    :, g1_off + dr : g1_off + dr + g1_size,
                    g1_off + dc : g1_off + dc + g1_size,
                ]
                term = sl * jnp.asarray(tw, xt.dtype)
                g1 = term if g1 is None else g1 + term
            g1 = g1 * m_g1

            # Adjoint stage 2: reverse-warp taps into the tile.
            for dr, dc, tw in warp_adj_taps[k]:
                sl = g1[:, wr + dr : wr + dr + tile, wr + dc : wr + dc + tile]
                grad_acc = grad_acc + sl * jnp.asarray(tw, xt.dtype)

        grad_ref[:] = grad_acc
        cost_ref[ti, tj] = cost_acc

    grad_padded, cost_tiles = pl.pallas_call(
        kernel_fn,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((c, tile, tile), lambda i, j: (0, i, j)),
            # Full-array SMEM block (TPU tiling rules forbid small blocked
            # outputs); each grid step writes its own (ti, tj) element.
            pl.BlockSpec((n_ty, n_tx), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, hp, wp), x.dtype),
            jax.ShapeDtypeStruct((n_ty, n_tx), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, src, src), x.dtype),
            pltpu.VMEM((k_frames, c, ext_lr, ext_lr), x.dtype),
            pltpu.VMEM((ext_lr, ext_lr), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(xp, yp, maskp)

    s2 = float(s * s)
    cost = s2 * jnp.sum(cost_tiles).astype(x.dtype)
    grad = 2.0 * s2 * grad_padded[:, :h, :w]
    return cost, grad
