"""Spatially tiled MAP objective with explicit halo exchange.

For HR images too large for one chip, the estimate is tiled over a
(``row``, ``col``) device mesh. The degradation stencil (translational warp +
PSF blur + decimation) reaches ``halo = ceil(max_shift) + 1 + kernel//2``
pixels past each tile edge, so:

- **forward**: each tile gathers a ``halo``-wide rim from its 4 neighbors
  (two ``ppermute`` rounds — rows then cols, which carries corners
  automatically), computes warp+blur on the padded tile, crops the center,
  and decimates. ``ppermute`` zero-fills edges with no sender, which is
  exactly the reference's BORDER_CONSTANT zero border.
- **adjoint**: the gradient is computed on a zero-embedded padded canvas and
  the rims are *scattered back* — sent to the owning neighbor and added
  (the exact adjoint of the halo gather), in reverse axis order.
- **cost**: per-tile partial sums reduced with ``psum`` over both mesh axes.

Tile sizes must be divisible by ``scale`` so local decimation equals the
cropped global decimation. The per-pixel TV term needs a radius-2 stencil for
its gradient, covered by a 2-pixel gather (no scatter needed: the gradient at
a pixel is a pure function of x within radius 2).

This is the hand-scheduled analog of what the XLA SPMD partitioner does for
spatially partitioned convolutions; owning the exchange keeps the collective
schedule explicit and lets the halo ride ICI once per objective evaluation.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from super_resolution_tpu.ops.blur import blur as blur_op, blur_adjoint as blur_adjoint_op
from super_resolution_tpu.ops.resize import decimate, zero_upsample
from super_resolution_tpu.ops.tv import tv_cost_and_grad
from super_resolution_tpu.ops.warp import translate, translate_adjoint
from super_resolution_tpu.parallel.mesh import COL_AXIS, ROW_AXIS

__all__ = ["required_halo", "make_tiled_map_value_and_grad", "halo_gather", "halo_scatter_sum"]


def required_halo(max_shift: float, kernel_size: int) -> int:
    """Stencil footprint of warp+blur: ceil(|shift|) + 1 (bilinear) + k//2."""
    return int(math.ceil(abs(max_shift))) + 1 + kernel_size // 2


def _replicate_edge(x: jnp.ndarray, halo: int, spatial_axis: int, leading: bool):
    idx = [slice(None)] * x.ndim
    idx[spatial_axis] = slice(0, 1) if leading else slice(-1, None)
    edge = x[tuple(idx)]
    return jnp.repeat(edge, halo, axis=spatial_axis)


def _exchange_axis(
    x: jnp.ndarray, halo: int, axis_name: str, n: int, spatial_axis: int,
    border: str = "zero",
):
    """Pad ``spatial_axis`` with ``halo`` rows from each neighbor along
    ``axis_name``. Global border fill: ``"zero"`` (BORDER_CONSTANT, for the
    warp/blur data term) or ``"edge"`` (replication, which makes forward
    differences vanish at the true image border — the TV truncation rule)."""
    if n == 1:
        if border == "edge":
            before = _replicate_edge(x, halo, spatial_axis, leading=True)
            after = _replicate_edge(x, halo, spatial_axis, leading=False)
            return jnp.concatenate([before, x, after], axis=spatial_axis)
        pad = [(0, 0)] * x.ndim
        pad[spatial_axis] = (halo, halo)
        return jnp.pad(x, pad)
    idx = [slice(None)] * x.ndim
    idx[spatial_axis] = slice(-halo, None)
    last = x[tuple(idx)]
    idx[spatial_axis] = slice(0, halo)
    first = x[tuple(idx)]
    # Tile i's leading pad comes from tile i-1's trailing rows.
    before = lax.ppermute(last, axis_name, [(i, i + 1) for i in range(n - 1)])
    # Tile i's trailing pad comes from tile i+1's leading rows.
    after = lax.ppermute(first, axis_name, [(i, i - 1) for i in range(1, n)])
    if border == "edge":
        pos = lax.axis_index(axis_name)
        before = jnp.where(
            pos == 0, _replicate_edge(x, halo, spatial_axis, leading=True), before
        )
        after = jnp.where(
            pos == n - 1, _replicate_edge(x, halo, spatial_axis, leading=False), after
        )
    return jnp.concatenate([before, x, after], axis=spatial_axis)


def halo_gather(
    x: jnp.ndarray, halo: int, n_row: int, n_col: int, border: str = "zero"
):
    """Gather a full halo rim: rows then cols (corners ride along)."""
    x = _exchange_axis(x, halo, ROW_AXIS, n_row, x.ndim - 2, border)
    x = _exchange_axis(x, halo, COL_AXIS, n_col, x.ndim - 1, border)
    return x


def _scatter_axis(g: jnp.ndarray, halo: int, axis_name: str, n: int, spatial_axis: int):
    """Adjoint of :func:`_exchange_axis`: crop the center and add the rims
    into the neighbors that own them."""
    size = g.shape[spatial_axis]
    idx = [slice(None)] * g.ndim
    idx[spatial_axis] = slice(halo, size - halo)
    center = g[tuple(idx)]
    if n == 1:
        return center
    idx[spatial_axis] = slice(0, halo)
    before_rim = g[tuple(idx)]
    idx[spatial_axis] = slice(size - halo, None)
    after_rim = g[tuple(idx)]
    # Tile i's leading rim overlaps tile i-1's trailing rows; send it there.
    recv_trailing = lax.ppermute(before_rim, axis_name, [(i, i - 1) for i in range(1, n)])
    # Tile i's trailing rim overlaps tile i+1's leading rows.
    recv_leading = lax.ppermute(after_rim, axis_name, [(i, i + 1) for i in range(n - 1)])
    csize = center.shape[spatial_axis]
    lead = [slice(None)] * g.ndim
    lead[spatial_axis] = slice(0, halo)
    trail = [slice(None)] * g.ndim
    trail[spatial_axis] = slice(csize - halo, None)
    center = center.at[tuple(lead)].add(recv_leading)
    center = center.at[tuple(trail)].add(recv_trailing)
    return center


def halo_scatter_sum(g: jnp.ndarray, halo: int, n_row: int, n_col: int):
    """Exact adjoint of :func:`halo_gather` (reverse axis order)."""
    g = _scatter_axis(g, halo, COL_AXIS, n_col, g.ndim - 1)
    g = _scatter_axis(g, halo, ROW_AXIS, n_row, g.ndim - 2)
    return g


def make_tiled_map_value_and_grad(
    mesh: Mesh,
    blur_kernel,
    scale: int,
    tv_lambda: float = 0.0,
    max_shift: int = 4,
):
    """Build ``value_and_grad(x, observations, shifts, tv_weights) ->
    (cost, grad)`` for spatially tiled global arrays.

    ``x``: ``[C, H, W]`` sharded PartitionSpec(None, 'row', 'col');
    ``observations``: ``[K, C, H/s, W/s]`` sharded (None, None, 'row', 'col');
    ``shifts``: ``[K, 2]`` replicated; ``tv_weights``: like x (IRLS weights).

    Returns a function usable directly by :func:`...solvers.minimize` — the
    tiled objective is just another fused cost+grad.
    """
    n_row = mesh.shape[ROW_AXIS]
    n_col = mesh.shape[COL_AXIS]
    kernel_size = 0 if blur_kernel is None else blur_kernel.shape[0]
    halo = required_halo(max_shift, kernel_size)
    # Single-hop exchange: each rim comes from the immediate neighbor, so the
    # halo cannot exceed the local tile extent (multi-hop would be needed).
    # Checked at call time against the actual local shapes.
    # The local translate's internal padding only needs to cover the shift.
    local_max_shift = int(math.ceil(max_shift)) + 1

    x_spec = PartitionSpec(None, ROW_AXIS, COL_AXIS)
    obs_spec = PartitionSpec(None, None, ROW_AXIS, COL_AXIS)

    def local_value_and_grad(x_local, obs_local, shifts, w_local):
        # --- Data term ---
        xp = halo_gather(x_local, halo, n_row, n_col)

        # Mask of padded-tile pixels inside the *global* image: the warp's
        # output is zero outside the global canvas (BORDER_CONSTANT) before
        # the blur sees it — without this, warped halo content leaks into the
        # blur at the true image border (visible for negative shifts).
        hp, wp = xp.shape[-2], xp.shape[-1]
        i = lax.axis_index(ROW_AXIS) if n_row > 1 else 0
        j = lax.axis_index(COL_AXIS) if n_col > 1 else 0
        ridx = jnp.arange(hp)
        cidx = jnp.arange(wp)
        rmask = jnp.where(jnp.equal(i, 0), ridx >= halo, True) & jnp.where(
            jnp.equal(i, n_row - 1), ridx < hp - halo, True
        )
        cmask = jnp.where(jnp.equal(j, 0), cidx >= halo, True) & jnp.where(
            jnp.equal(j, n_col - 1), cidx < wp - halo, True
        )
        inside = (rmask[:, None] & cmask[None, :]).astype(x_local.dtype)

        def per_frame(y_local, shift):
            z = translate(xp, shift[0], shift[1], max_shift=local_max_shift)
            z = z * inside
            if blur_kernel is not None:
                z = blur_op(z, blur_kernel)
            z = z[..., halo:-halo, halo:-halo]
            r = decimate(z, scale) - y_local
            cost_k = jnp.sum(r * r)
            # Adjoint on a zero-embedded padded canvas, rims scattered back
            # (adjoint of mask∘translate is translate^T∘mask).
            rp = zero_upsample(r, scale)
            pad = [(0, 0)] * (rp.ndim - 2) + [(halo, halo), (halo, halo)]
            rp = jnp.pad(rp, pad)
            if blur_kernel is not None:
                rp = blur_adjoint_op(rp, blur_kernel)
            rp = rp * inside
            rp = translate_adjoint(rp, shift[0], shift[1], max_shift=local_max_shift)
            return cost_k, rp

        costs, grads_padded = jax.vmap(per_frame)(obs_local, shifts)
        s2 = jnp.asarray(float(scale * scale), x_local.dtype)
        cost = s2 * jnp.sum(costs)
        grad_padded = 2.0 * s2 * jnp.sum(grads_padded, axis=0)
        grad = halo_scatter_sum(grad_padded, halo, n_row, n_col)

        # --- TV term (radius-2 stencil: gather-only with a 2-pixel rim) ---
        if tv_lambda > 0.0:
            # Edge-replicated border fill makes forward diffs vanish at the
            # true image border, matching the reference truncation rule.
            x2 = halo_gather(x_local, 2, n_row, n_col, border="edge")
            w2 = halo_gather(w_local, 2, n_row, n_col, border="edge")
            _, tv_grad_pad = tv_cost_and_grad(x2, tv_lambda * w2)
            # Cost: per-pixel separable — sum only the pixels this tile owns.
            from super_resolution_tpu.ops.tv import tv_residuals

            r2 = tv_residuals(x2)
            owned = (tv_lambda * w2) * r2 * r2
            tv_cost = jnp.sum(owned[..., 2:-2, 2:-2])
            cost = cost + tv_cost
            # Gradient at owned pixels is a radius-2 function of x — but rim
            # pixels of the padded array have wrong residuals only beyond
            # radius 1, so the center crop of the padded gradient is exact.
            grad = grad + tv_grad_pad[..., 2:-2, 2:-2]
        cost = lax.psum(lax.psum(cost, ROW_AXIS), COL_AXIS)
        return cost, grad

    tiled = jax.shard_map(
        local_value_and_grad,
        mesh=mesh,
        in_specs=(x_spec, obs_spec, PartitionSpec(None, None), x_spec),
        out_specs=(PartitionSpec(), x_spec),
    )

    def value_and_grad(x, observations, shifts, tv_weights=None):
        tile_h = x.shape[-2] // n_row
        tile_w = x.shape[-1] // n_col
        if halo > min(tile_h, tile_w):
            raise ValueError(
                f"Stencil halo ({halo}) exceeds the local tile size "
                f"({tile_h}x{tile_w}); use fewer tiles, a larger image, or a "
                f"smaller max_shift (single-hop halo exchange)."
            )
        if tv_weights is None:
            tv_weights = jnp.ones_like(x)
        return tiled(x, observations, shifts, tv_weights)

    return value_and_grad
