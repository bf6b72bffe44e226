"""Band-sharded MAP objective running the fused Pallas kernel per shard.

The GSPMD path (``data_parallel.py``) lets XLA partition the traced data
term; this module instead uses ``shard_map`` so each device runs the fused
Pallas MAP kernel (``ops/pallas/degrade.py``) on its local channel block —
the single-chip production hot path, unchanged, times N devices.

Why the band axis: the MAP objective with 2D TV/BTV is **band-separable**
(the data term's degradation chain and both spatial regularizers never mix
channels; only 3D spectral TV does, reference ``tv_regularizer.cpp:58-69``).
Sharding the channel axis of x, the observations, and the IRLS weights
therefore needs exactly ONE collective per objective evaluation — a scalar
``psum`` of the cost over the band axis — while the gradient stays local to
each shard. The motion shifts are shared by every shard, so the kernel's
host-known tap tables are identical on all devices (SPMD-safe).

3D spectral TV adds exactly TWO more (one-band, nearest-neighbor ring)
collectives per evaluation: a ``ppermute`` bringing each shard the next
shard's first band as a read-only halo channel (the kernel masks it out of
the data term; its TV constants are zero-padded so its own TV terms vanish),
and a reverse ``ppermute`` delivering the cross-shard gradient contribution
the kernel accumulates in that halo channel back to its owner's first band.
Both ride the ICI ring — no all-gather, no fallback to the traced path.

Frame-axis sharding additionally needs per-device shifts under one SPMD
program — the shift-generic kernel (runtime SMEM tap tables) provides it;
see :func:`make_frame_sharded_pallas_vg`. The trace-time-specialized kernel
remains incompatible with frame meshes.

The CG/L-BFGS loop runs outside the shard_map under ``jit``: its dot
products and axpy updates operate on band-sharded arrays and GSPMD inserts
the (cheap, scalar) reductions. This mirrors the reference's
``split_channels`` scaling axis (``irls_map_solver.cpp:200-229``) — the
serial per-channel loop becomes N devices running the fused kernel.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from super_resolution_tpu.parallel.mesh import BAND_AXIS, FRAME_AXIS
from super_resolution_tpu.solvers.least_squares import minimize

__all__ = [
    "make_band_sharded_pallas_vg",
    "make_band_sharded_pallas_solver",
    "make_frame_sharded_pallas_vg",
]


def _band_size(mesh: Mesh) -> int:
    return dict(zip(mesh.axis_names, mesh.devices.shape))[BAND_AXIS]


def _spectral_halo_extend(x_local, n_band: int, ch_axis: int):
    """Append the one-band spectral halo for 3D TV over a band-sharded stack:
    shard ``i`` receives shard ``i+1``'s FIRST band over the band ring
    (``ppermute``); the shard holding the global last band instead duplicates
    its own last band, so ``dz == 0`` there — the reference's zero forward
    difference at the final band (``tv_regularizer.cpp:58-69``)."""
    first = lax.slice_in_dim(x_local, 0, 1, axis=ch_axis)
    nxt = lax.ppermute(
        first, BAND_AXIS, [((i + 1) % n_band, i) for i in range(n_band)]
    )
    c_loc = x_local.shape[ch_axis]
    last = lax.slice_in_dim(x_local, c_loc - 1, c_loc, axis=ch_axis)
    is_last = lax.axis_index(BAND_AXIS) == n_band - 1
    halo = jnp.where(is_last, last, nxt)
    return jnp.concatenate([x_local, halo], axis=ch_axis)


def _spectral_halo_return(grad_ext, n_band: int, ch_axis: int):
    """Route the kernel's halo-channel gradient (the cross-shard 3D-TV
    contribution into the halo band) back to its owner and add it onto the
    owner's first band. The last shard's cross term is exactly zero by the
    ``dz == 0`` construction in :func:`_spectral_halo_extend`, so shard 0
    (which receives it around the ring) adds nothing."""
    c_loc = grad_ext.shape[ch_axis] - 1
    cross = lax.slice_in_dim(grad_ext, c_loc, c_loc + 1, axis=ch_axis)
    recv = lax.ppermute(
        cross, BAND_AXIS, [(i, (i + 1) % n_band) for i in range(n_band)]
    )
    grad = lax.slice_in_dim(grad_ext, 0, c_loc, axis=ch_axis)
    g0 = lax.slice_in_dim(grad, 0, 1, axis=ch_axis) + recv
    if c_loc == 1:
        return g0
    rest = lax.slice_in_dim(grad, 1, c_loc, axis=ch_axis)
    return jnp.concatenate([g0, rest], axis=ch_axis)


def make_band_sharded_pallas_vg(
    mesh: Mesh,
    observations: jnp.ndarray,
    static_shifts,
    blur_kernel,
    scale: int,
    regularizers: Sequence[tuple[object, float]] = (),
    pallas_tile: int = 0,
    interpret: bool = False,
    phase_io: bool = False,
):
    """Build ``value_and_grad(x, weights)`` (with ``.prepare(weights)``) whose
    evaluation is one fused Pallas kernel launch per device.

    ``observations``: ``[K, C, h, w]`` with C divisible by the band-axis
    size; ``static_shifts``: host-known ``[K, 2]``. A single TV (2D or 3D
    spectral) or BTV regularizer is fused into the kernel; 3D TV runs with
    the one-band ppermute halo (see module docstring). Empty
    ``regularizers`` gives the bare data term.

    ``phase_io=True``: the solver state is polyphase planes
    ``[s*s, C, H/s, W/s]`` sharded ``P(None, band, None, None)`` — same
    per-eval transpose elimination as the single-chip path (measured 3.9x
    per evaluation); convert at the solve boundaries with
    ``vg.to_planes`` / ``vg.from_planes`` (band-local, no collectives).
    """
    from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
    from super_resolution_tpu.ops.pallas.degrade import (
        choose_channel_block,
        choose_tile,
        pack_btv_constants,
        pack_tv_constants,
        pallas_data_term_cost_and_grad,
    )
    from super_resolution_tpu.ops.tv import TotalVariationRegularizer

    if BAND_AXIS not in mesh.axis_names:
        raise ValueError("Mesh must have a 'band' axis for band sharding.")
    frame_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(FRAME_AXIS, 1)
    if frame_size != 1:
        raise ValueError(
            "Frame-axis sharding is incompatible with the shift-specialized "
            "Pallas kernel (per-device shift tables would differ); use "
            "make_frame_sharded_pallas_vg (shift-generic kernel) or the "
            "GSPMD path (make_sharded_map_solver)."
        )
    regs = tuple(regularizers)
    if len(regs) > 1:
        raise ValueError("The fused kernel supports at most one regularizer.")
    fuse_tv = bool(regs) and isinstance(regs[0][0], TotalVariationRegularizer)
    fuse_btv = bool(regs) and isinstance(regs[0][0], BilateralTotalVariationRegularizer)
    # 3D spectral TV couples adjacent bands: each shard carries a one-band
    # ppermute halo (x of the next shard's first band in, the cross-shard
    # gradient contribution back out) so the fused kernel still runs
    # per-shard with exactly THREE collectives per evaluation (cost psum +
    # two one-band ppermutes) instead of falling back to the traced path.
    fuse_tv3d = fuse_tv and regs[0][0].use_3d
    if regs and not (fuse_tv or fuse_btv):
        raise ValueError(f"Unsupported regularizer type: {type(regs[0][0])!r}")

    n_band = _band_size(mesh)
    k, c, _, _ = observations.shape
    if c % n_band:
        raise ValueError(f"{c} channels not divisible by band axis size {n_band}.")
    c_local = c // n_band
    need_halo = fuse_tv3d and n_band > 1
    c_kernel = c_local + (1 if need_halo else 0)
    static_shifts = np.asarray(static_shifts)
    kernel_np = None if blur_kernel is None else np.asarray(blur_kernel)
    channel_block = 0
    explicit_tile = isinstance(pallas_tile, (tuple, list)) or pallas_tile > 0
    if explicit_tile and need_halo:
        # An explicit tile bypasses the auto choice that sizes VMEM for
        # c_local + 1 channels in spectral-halo mode — a tile pinned for
        # c_local bands can blow the ~16 MB scoped limit (the halo adds one
        # full channel to every per-frame intermediate). Validate up front.
        from super_resolution_tpu.ops.pallas.degrade import estimate_kernel_vmem

        est = estimate_kernel_vmem(
            pallas_tile, c_kernel, scale, k, static_shifts, kernel_np,
            use_tv=True,
        )
        if est > 15 * 2**20:
            raise ValueError(
                f"Explicit pallas_tile {pallas_tile} needs ~{est / 2**20:.1f} "
                f"MB VMEM for {c_kernel} channels (local bands + spectral "
                "halo) — over the ~16 MB scoped limit. Size pinned tiles for "
                "c_local + 1 channels in 3D-TV band-sharded mode, or use the "
                "automatic tile (pallas_tile=0)."
            )
    if not explicit_tile:
        if fuse_tv3d:
            # The kernel requires the full (local) stack per grid step for
            # spectral coupling — no channel blocking; size for the halo.
            pallas_tile = choose_tile(
                c_kernel, scale, k, static_shifts, kernel_np,
                use_tv=True, use_btv=False, btv_range=0,
                image_hw=(observations.shape[2] * scale,
                          observations.shape[3] * scale),
            )
        elif c_local > 1:
            channel_block, pallas_tile = choose_channel_block(
                c_local, scale, k, static_shifts, kernel_np,
                use_tv=fuse_tv, use_btv=fuse_btv,
                btv_range=regs[0][0].scale_range if fuse_btv else 0,
                image_hw=(observations.shape[2] * scale,
                          observations.shape[3] * scale),
            )
        else:
            pallas_tile = choose_tile(
                c_local, scale, k, static_shifts, kernel_np,
                use_tv=fuse_tv, use_btv=fuse_btv,
                btv_range=regs[0][0].scale_range if fuse_btv else 0,
                image_hw=(observations.shape[2] * scale,
                          observations.shape[3] * scale),
            )
    lam = regs[0][1] if regs else 0.0

    x_spec = (
        P(None, BAND_AXIS, None, None) if phase_io else P(BAND_AXIS, None, None)
    )
    w_spec = P(BAND_AXIS, None, None)  # IRLS weights stay image-space
    obs_spec = P(None, BAND_AXIS, None, None)

    # Round-5 kernel variants reach the sharded path too: phase-stacked
    # TV/BTV always (bit-exact), the composite tap table when the static
    # analysis proves it exact for the GLOBAL spatial geometry (band
    # sharding never changes the spatial borders).
    from super_resolution_tpu.ops.pallas.degrade import composite_is_exact

    _composite = composite_is_exact(
        static_shifts, kernel_np, scale,
        (observations.shape[2] * scale, observations.shape[3] * scale),
    )

    def _kernel(x_local, obs_local, **reg_kwargs):
        cost, grad = pallas_data_term_cost_and_grad(
            x_local, obs_local, static_shifts, kernel_np, scale,
            tile=pallas_tile, interpret=interpret,
            channel_block=channel_block, phase_io=phase_io,
            composite_data_term=_composite,
            tv_stacked=True, btv_stacked=True, **reg_kwargs,
        )
        # The one collective per evaluation: scalar cost over the band axis.
        return lax.psum(cost, BAND_AXIS), grad

    ch_ax = 1 if phase_io else 0

    def _tv3d_halo_call(xl, ol, **tv_kwargs):
        xe = _spectral_halo_extend(xl, n_band, ch_ax)
        oe = jnp.pad(ol, [(0, 0), (0, 1), (0, 0), (0, 0)])
        cost, grad = _kernel(xe, oe, tv_use_3d=True, spectral_halo=True,
                             **tv_kwargs)
        return cost, _spectral_halo_return(grad, n_band, ch_ax)

    def value_and_grad(x, weights=()):
        weights = tuple(weights)
        if fuse_tv and need_halo:
            local = lambda xl, ol, wl: _tv3d_halo_call(
                xl, ol,
                tv_constants=jnp.pad(lam * wl, [(0, 1), (0, 0), (0, 0)]),
            )
            specs = (x_spec, obs_spec, w_spec)
            args = (x, observations, weights[0])
        elif fuse_tv:
            local = lambda xl, ol, wl: _kernel(
                xl, ol, tv_constants=lam * wl, tv_use_3d=fuse_tv3d
            )
            specs = (x_spec, obs_spec, w_spec)
            args = (x, observations, weights[0])
        elif fuse_btv:
            local = lambda xl, ol, wl: _kernel(
                xl, ol, btv_constants=lam * wl,
                btv_range=regs[0][0].scale_range,
                btv_decay=regs[0][0].spatial_decay,
            )
            specs = (x_spec, obs_spec, w_spec)
            args = (x, observations, weights[0])
        else:
            local = lambda xl, ol: _kernel(xl, ol)
            specs = (x_spec, obs_spec)
            args = (x, observations)
        return jax.shard_map(
            local, mesh=mesh, in_specs=specs, out_specs=(P(), x_spec),
            check_vma=False,  # pallas_call out_shape carries no vma metadata
        )(*args)

    def prepare(weights):
        """Bind the IRLS weights, packing the constants windows ONCE per
        inner solve (per shard) — the same hoist the single-chip path does."""
        weights = tuple(weights)
        if fuse_tv:
            halo_pad = [(0, 1), (0, 0), (0, 0)] if need_halo else None
            pack = jax.shard_map(
                lambda wl: pack_tv_constants(
                    jnp.pad(lam * wl, halo_pad) if need_halo else lam * wl,
                    scale, pallas_tile,
                ),
                mesh=mesh, in_specs=(w_spec,),
                out_specs=P(None, None, BAND_AXIS, None, None),
                check_vma=False,
            )
            packed = pack(weights[0])
            if need_halo:
                local = lambda xl, ol, pl_: _tv3d_halo_call(
                    xl, ol, tv_constants_packed=pl_
                )
            else:
                local = lambda xl, ol, pl_: _kernel(
                    xl, ol, tv_constants_packed=pl_, tv_use_3d=fuse_tv3d
                )
            pspec = P(None, None, BAND_AXIS, None, None)
            return lambda x: jax.shard_map(
                local, mesh=mesh, in_specs=(x_spec, obs_spec, pspec),
                out_specs=(P(), x_spec), check_vma=False,
            )(x, observations, packed)
        if fuse_btv:
            pack = jax.shard_map(
                lambda wl: pack_btv_constants(
                    lam * wl, scale, regs[0][0].scale_range, pallas_tile
                ),
                mesh=mesh, in_specs=(w_spec,),
                out_specs=P(None, None, BAND_AXIS, None, None),
                check_vma=False,
            )
            packed = pack(weights[0])
            local = lambda xl, ol, pl_: _kernel(
                xl, ol, btv_constants_packed=pl_,
                btv_range=regs[0][0].scale_range,
                btv_decay=regs[0][0].spatial_decay,
            )
            pspec = P(None, None, BAND_AXIS, None, None)
            return lambda x: jax.shard_map(
                local, mesh=mesh, in_specs=(x_spec, obs_spec, pspec),
                out_specs=(P(), x_spec), check_vma=False,
            )(x, observations, packed)
        return lambda x: value_and_grad(x, weights)

    value_and_grad.prepare = prepare
    value_and_grad.phase_io = phase_io
    if phase_io:
        from super_resolution_tpu.ops.pallas.degrade import (
            hr_to_planes,
            planes_to_hr,
        )

        value_and_grad.to_planes = lambda x: hr_to_planes(x, scale)
        value_and_grad.from_planes = lambda p: planes_to_hr(p, scale)
    return value_and_grad


def make_frame_sharded_pallas_vg(
    mesh: Mesh,
    observations: jnp.ndarray,
    shifts: jnp.ndarray,
    blur_kernel,
    scale: int,
    regularizers: Sequence[tuple[object, float]] = (),
    shift_bound: float = 0.0,
    pallas_tile: int = 0,
    interpret: bool = False,
    phase_io: bool = False,
):
    """Frame(-and optionally band-)sharded MAP objective running the
    **shift-generic** fused Pallas kernel per shard.

    Frame-axis sharding requires every device to run the SAME program while
    holding different motion shifts — impossible for the trace-time-
    specialized kernel (its tap tables are compile-time constants), and the
    reason round 1 fell back to the ~3x-slower GSPMD traced path. With the
    shift-generic kernel the per-device shifts are *data* (SMEM tap tables),
    so the SPMD program is identical across the frame axis: each device
    evaluates its local frames' data term, and GSPMD reduces with one cost
    psum + one gradient psum over ``frame`` per evaluation (the gradient sum
    over frames, ``objective_data_term.cpp:104-115``, IS the collective
    seam). Bands compose orthogonally exactly as in
    :func:`make_band_sharded_pallas_vg`.

    ``shifts``: ``[K, 2]`` (dx, dy), placed sharded over ``frame``; traced —
    new shift sets reuse the compiled executable.
    """
    from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
    from super_resolution_tpu.ops.pallas.degrade import (
        choose_channel_block,
        choose_tile,
        pack_btv_constants,
        pack_tv_constants,
        pallas_data_term_cost_and_grad,
    )
    from super_resolution_tpu.ops.tv import TotalVariationRegularizer

    if not shift_bound > 0.0:
        raise ValueError("Frame sharding needs shift_bound > 0 (generic kernel).")
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    frame_size = axis_sizes.get(FRAME_AXIS, 1)
    band_size = axis_sizes.get(BAND_AXIS, 1)
    if FRAME_AXIS not in mesh.axis_names:
        raise ValueError("Mesh must have a 'frame' axis; use the band-only "
                         "builder otherwise.")
    regs = tuple(regularizers)
    if len(regs) > 1:
        raise ValueError("The fused kernel supports at most one regularizer.")
    fuse_tv = bool(regs) and isinstance(regs[0][0], TotalVariationRegularizer)
    fuse_btv = bool(regs) and isinstance(regs[0][0], BilateralTotalVariationRegularizer)
    # 3D spectral TV: no halo needed across the frame axis (x is replicated
    # there); across a band axis of size > 1 the same one-band ppermute halo
    # as the band-only builder applies.
    fuse_tv3d = fuse_tv and regs[0][0].use_3d
    if regs and not (fuse_tv or fuse_btv):
        raise ValueError(f"Unsupported regularizer type: {type(regs[0][0])!r}")

    k, c, _, _ = observations.shape
    if k % frame_size:
        raise ValueError(f"{k} frames not divisible by frame axis {frame_size}.")
    if c % band_size:
        raise ValueError(f"{c} channels not divisible by band axis {band_size}.")
    k_local = k // frame_size
    c_local = c // band_size
    need_halo = fuse_tv3d and band_size > 1
    c_kernel = c_local + (1 if need_halo else 0)
    kernel_np = None if blur_kernel is None else np.asarray(blur_kernel)
    channel_block = 0
    explicit_tile = isinstance(pallas_tile, (tuple, list)) or pallas_tile > 0
    if explicit_tile and need_halo:
        # Same guard as the band-only builder: pinned tiles must be sized
        # for c_local + 1 channels when the spectral halo rides along.
        from super_resolution_tpu.ops.pallas.degrade import estimate_kernel_vmem

        est = estimate_kernel_vmem(
            pallas_tile, c_kernel, scale, k_local, None, kernel_np,
            use_tv=True, shift_bound=shift_bound,
        )
        if est > 15 * 2**20:
            raise ValueError(
                f"Explicit pallas_tile {pallas_tile} needs ~{est / 2**20:.1f} "
                f"MB VMEM for {c_kernel} channels (local bands + spectral "
                "halo) — over the ~16 MB scoped limit. Size pinned tiles for "
                "c_local + 1 channels in 3D-TV band-sharded mode, or use the "
                "automatic tile (pallas_tile=0)."
            )
    if not explicit_tile:
        if fuse_tv3d:
            pallas_tile = choose_tile(
                c_kernel, scale, k_local, None, kernel_np,
                use_tv=True, use_btv=False, btv_range=0,
                shift_bound=shift_bound,
                image_hw=(observations.shape[2] * scale,
                          observations.shape[3] * scale),
            )
        elif c_local > 1:
            channel_block, pallas_tile = choose_channel_block(
                c_local, scale, k_local, None, kernel_np,
                use_tv=fuse_tv, use_btv=fuse_btv,
                btv_range=regs[0][0].scale_range if fuse_btv else 0,
                shift_bound=shift_bound,
                image_hw=(observations.shape[2] * scale,
                          observations.shape[3] * scale),
            )
        else:
            pallas_tile = choose_tile(
                c_local, scale, k_local, None, kernel_np,
                use_tv=fuse_tv, use_btv=fuse_btv,
                btv_range=regs[0][0].scale_range if fuse_btv else 0,
                shift_bound=shift_bound,
                image_hw=(observations.shape[2] * scale,
                          observations.shape[3] * scale),
            )
    # x (and the IRLS weights) are REPLICATED across the frame axis, so each
    # frame shard computes the full fused regularizer term; both its cost and
    # its gradient are linear in the packed constants, and both get psum'd
    # over `frame` — dividing lambda by frame_size makes the reduction sum
    # back to exactly one copy.
    lam = (regs[0][1] / frame_size) if regs else 0.0
    band = BAND_AXIS if BAND_AXIS in mesh.axis_names else None

    x_spec = P(None, band, None, None) if phase_io else P(band, None, None)
    w_spec = P(band, None, None)  # IRLS weights stay image-space
    obs_spec = P(FRAME_AXIS, band, None, None)
    shifts_spec = P(FRAME_AXIS, None)

    def _kernel(x_local, obs_local, shifts_local, **reg_kwargs):
        cost, grad = pallas_data_term_cost_and_grad(
            x_local, obs_local, None, kernel_np, scale,
            tile=pallas_tile, interpret=interpret,
            dynamic_shifts=shifts_local, shift_bound=shift_bound,
            channel_block=channel_block, phase_io=phase_io,
            tv_stacked=True, btv_stacked=True, **reg_kwargs,
        )
        # Collectives: scalar cost over every sharded axis; the per-frame
        # gradient partial sums over the frame axis (grad stays band-local).
        axes = (FRAME_AXIS,) + ((band,) if band else ())
        return lax.psum(cost, axes), lax.psum(grad, FRAME_AXIS)

    ch_ax = 1 if phase_io else 0

    def _tv3d_halo_call(xl, ol, sl, **tv_kwargs):
        xe = _spectral_halo_extend(xl, band_size, ch_ax)
        oe = jnp.pad(ol, [(0, 0), (0, 1), (0, 0), (0, 0)])
        cost, grad = _kernel(xe, oe, sl, tv_use_3d=True, spectral_halo=True,
                             **tv_kwargs)
        # _kernel already psum'd grad over `frame` (each frame row carries
        # lam/frame_size of the TV term, so the cross channel sums back to
        # one copy); route it over the band ring afterwards.
        return cost, _spectral_halo_return(grad, band_size, ch_ax)

    def value_and_grad(x, weights=()):
        weights = tuple(weights)
        if fuse_tv and need_halo:
            local = lambda xl, ol, sl, wl: _tv3d_halo_call(
                xl, ol, sl,
                tv_constants=jnp.pad(lam * wl, [(0, 1), (0, 0), (0, 0)]),
            )
            specs = (x_spec, obs_spec, shifts_spec, w_spec)
            args = (x, observations, shifts, weights[0])
        elif fuse_tv:
            local = lambda xl, ol, sl, wl: _kernel(
                xl, ol, sl, tv_constants=lam * wl, tv_use_3d=fuse_tv3d
            )
            specs = (x_spec, obs_spec, shifts_spec, w_spec)
            args = (x, observations, shifts, weights[0])
        elif fuse_btv:
            local = lambda xl, ol, sl, wl: _kernel(
                xl, ol, sl, btv_constants=lam * wl,
                btv_range=regs[0][0].scale_range,
                btv_decay=regs[0][0].spatial_decay,
            )
            specs = (x_spec, obs_spec, shifts_spec, w_spec)
            args = (x, observations, shifts, weights[0])
        else:
            local = lambda xl, ol, sl: _kernel(xl, ol, sl)
            specs = (x_spec, obs_spec, shifts_spec)
            args = (x, observations, shifts)
        return jax.shard_map(
            local, mesh=mesh, in_specs=specs, out_specs=(P(), x_spec),
            check_vma=False,
        )(*args)

    def prepare(weights):
        weights = tuple(weights)
        if fuse_tv:
            pack = jax.shard_map(
                lambda wl: pack_tv_constants(
                    jnp.pad(lam * wl, [(0, 1), (0, 0), (0, 0)])
                    if need_halo else lam * wl,
                    scale, pallas_tile,
                ),
                mesh=mesh, in_specs=(w_spec,),
                out_specs=P(None, None, band, None, None),
                check_vma=False,
            )
            packed = pack(weights[0])
            if need_halo:
                local = lambda xl, ol, sl, pk: _tv3d_halo_call(
                    xl, ol, sl, tv_constants_packed=pk
                )
            else:
                local = lambda xl, ol, sl, pk: _kernel(
                    xl, ol, sl, tv_constants_packed=pk, tv_use_3d=fuse_tv3d
                )
            pspec = P(None, None, band, None, None)
            return lambda x: jax.shard_map(
                local, mesh=mesh,
                in_specs=(x_spec, obs_spec, shifts_spec, pspec),
                out_specs=(P(), x_spec), check_vma=False,
            )(x, observations, shifts, packed)
        if fuse_btv:
            pack = jax.shard_map(
                lambda wl: pack_btv_constants(
                    lam * wl, scale, regs[0][0].scale_range, pallas_tile
                ),
                mesh=mesh, in_specs=(w_spec,),
                out_specs=P(None, None, band, None, None),
                check_vma=False,
            )
            packed = pack(weights[0])
            local = lambda xl, ol, sl, pk: _kernel(
                xl, ol, sl, btv_constants_packed=pk,
                btv_range=regs[0][0].scale_range,
                btv_decay=regs[0][0].spatial_decay,
            )
            pspec = P(None, None, band, None, None)
            return lambda x: jax.shard_map(
                local, mesh=mesh,
                in_specs=(x_spec, obs_spec, shifts_spec, pspec),
                out_specs=(P(), x_spec), check_vma=False,
            )(x, observations, shifts, packed)
        return lambda x: value_and_grad(x, weights)

    value_and_grad.prepare = prepare
    value_and_grad.phase_io = phase_io
    if phase_io:
        from super_resolution_tpu.ops.pallas.degrade import (
            hr_to_planes,
            planes_to_hr,
        )

        value_and_grad.to_planes = lambda x: hr_to_planes(x, scale)
        value_and_grad.from_planes = lambda p: planes_to_hr(p, scale)
    return value_and_grad


def make_band_sharded_pallas_solver(
    mesh: Mesh,
    observations: jnp.ndarray,
    static_shifts,
    blur_kernel,
    scale: int,
    regularizers: Sequence[tuple[object, float]] = (),
    method: str = "cg",
    max_iterations: int = 50,
    gradient_norm_threshold: float = 1e-6,
    cost_decrease_threshold: float = 1e-6,
    parameter_variation_threshold: float = 1e-6,
    pallas_tile: int = 0,
    interpret: bool = False,
    phase_io: bool = False,
):
    """Jitted band-sharded solve ``(x0, weights) -> MinimizeResult`` whose
    inner objective is the per-shard fused Pallas kernel; the CG/L-BFGS
    loop's vector algebra runs GSPMD-partitioned over the same sharding.
    With ``phase_io`` the solve state is polyphase planes internally
    (converted at the boundaries; the caller still passes/receives
    image-space arrays)."""
    vg = make_band_sharded_pallas_vg(
        mesh, observations, static_shifts, blur_kernel, scale, regularizers,
        pallas_tile=pallas_tile, interpret=interpret, phase_io=phase_io,
    )
    x_sharding = NamedSharding(mesh, P(BAND_AXIS, None, None))
    planes_sharding = NamedSharding(mesh, P(None, BAND_AXIS, None, None))

    @jax.jit
    def solve(x0, weights=()):
        x0 = lax.with_sharding_constraint(x0, x_sharding)
        if phase_io:
            x_start = lax.with_sharding_constraint(
                vg.to_planes(x0), planes_sharding
            )
        else:
            x_start = x0
        result = minimize(
            vg.prepare(weights),
            x_start,
            method=method,
            max_iterations=max_iterations,
            gradient_norm_threshold=gradient_norm_threshold,
            cost_decrease_threshold=cost_decrease_threshold,
            parameter_variation_threshold=parameter_variation_threshold,
        )
        if phase_io:
            result = result._replace(x=vg.from_planes(result.x))
        return result._replace(
            x=lax.with_sharding_constraint(result.x, x_sharding)
        )

    return solve
