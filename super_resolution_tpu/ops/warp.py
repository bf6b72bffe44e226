"""Translational warp with cv::warpAffine parity and a warp-based adjoint.

The reference's MotionModule (``src/image_model/motion_module.cpp``) warps each
channel with ``cv::warpAffine`` and kernel ``[1 0 dx; 0 1 dy]``: the output is
``dst(r, c) = src(r - dy, c - dx)`` with bilinear sampling and zero
(BORDER_CONSTANT) outside the image — content moves *down-right* for positive
shifts. Its "transpose" warps by ``(-dx, -dy)`` (``motion_module.cpp:40-51``),
which is the exact adjoint for integer shifts and the reference's accepted
approximation for fractional ones (solver tests crop a 1-px border).

Two implementations:

- :func:`translate` — shifts are traced scalars; bilinear combination of four
  ``lax.dynamic_slice`` reads from a zero-padded copy. ``vmap``-able over a
  frame axis with per-frame shifts, so a whole LR stack degrades in one fused
  XLA computation. ``max_shift`` bounds |dx|,|dy| (static padding).
- :func:`translate_static` — Python-float shifts; pure pad+slice, no dynamic
  indexing (marginally cheaper when shifts are compile-time constants).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

__all__ = ["translate", "translate_static", "translate_adjoint"]


def translate(
    x: jnp.ndarray,
    dx: jnp.ndarray | float,
    dy: jnp.ndarray | float,
    max_shift: int = 16,
) -> jnp.ndarray:
    """Warp ``[..., H, W]`` so that ``out(r, c) = x(r - dy, c - dx)`` (bilinear, zero border).

    ``dx``/``dy`` may be traced scalars; ``|dx|, |dy|`` must be < ``max_shift``.
    """
    h, w = x.shape[-2], x.shape[-1]
    dx = jnp.asarray(dx, dtype=x.dtype)
    dy = jnp.asarray(dy, dtype=x.dtype)
    # out(r, c) samples src at (r - dy, c - dx). Split shift into integer and
    # fractional parts: value at t = y0 - fy is (1-fy)*src(y0) + fy*src(y0-1)
    # where y0 = r - iy, iy = floor(dy), fy = dy - iy in [0, 1).
    iy = jnp.floor(dy)
    ix = jnp.floor(dx)
    fy = dy - iy
    fx = dx - ix
    iy = iy.astype(jnp.int32)
    ix = ix.astype(jnp.int32)

    p = int(max_shift) + 1
    pad = [(0, 0)] * (x.ndim - 2) + [(p, p), (p, p)]
    xp = jnp.pad(x, pad)

    zero = jnp.zeros((), dtype=jnp.int32)

    def shifted(a: int, b: int) -> jnp.ndarray:
        # src(r - iy - a, c - ix - b), zero outside: slice the padded array
        # starting at (p - iy - a, p - ix - b).
        r0 = (p - a - iy).astype(jnp.int32)
        c0 = (p - b - ix).astype(jnp.int32)
        starts = [zero] * (x.ndim - 2) + [r0, c0]
        return lax.dynamic_slice(xp, starts, x.shape)

    wy = (1.0 - fy, fy)
    wx = (1.0 - fx, fx)
    out = jnp.zeros_like(x)
    for a in range(2):
        for b in range(2):
            out = out + (wy[a] * wx[b]) * shifted(a, b)
    return out


def translate_static(x: jnp.ndarray, dx: float, dy: float) -> jnp.ndarray:
    """Same semantics as :func:`translate` for Python-float (static) shifts."""
    iy, ix = math.floor(dy), math.floor(dx)
    fy, fx = dy - iy, dx - ix

    def shifted(a: int, b: int) -> jnp.ndarray:
        m, n = iy + a, ix + b  # out(r, c) = x(r - m, c - n)
        h, w = x.shape[-2], x.shape[-1]
        pad = [(0, 0)] * (x.ndim - 2) + [
            (max(m, 0), max(-m, 0)),
            (max(n, 0), max(-n, 0)),
        ]
        xp = jnp.pad(x, pad)
        sl = [slice(None)] * (x.ndim - 2) + [
            slice(max(-m, 0), max(-m, 0) + h),
            slice(max(-n, 0), max(-n, 0) + w),
        ]
        return xp[tuple(sl)]

    out = None
    for a, wy in ((0, 1.0 - fy), (1, fy)):
        for b, wx in ((0, 1.0 - fx), (1, fx)):
            weight = wy * wx
            if weight == 0.0:
                continue
            term = shifted(a, b) * jnp.asarray(weight, dtype=x.dtype)
            out = term if out is None else out + term
    return out


def translate_adjoint(
    x: jnp.ndarray,
    dx: jnp.ndarray | float,
    dy: jnp.ndarray | float,
    max_shift: int = 16,
) -> jnp.ndarray:
    """The reference's motion transpose: warp by ``(-dx, -dy)``.

    Exact adjoint of :func:`translate` for integer shifts; the reference's
    deliberate approximation for fractional shifts (``motion_module.cpp:40-51``).
    """
    return translate(x, -jnp.asarray(dx), -jnp.asarray(dy), max_shift=max_shift)
