"""Bilateral total variation regularizer, vectorized over static offsets.

Reference semantics (``src/optimization/btv_regularizer.cpp``):

- Per-pixel residual over a down-right window with spatial decay ``a``:
  ``r(p) = sum_{0 <= i, j <= P} a^(i+j) |x(p) - x(p + (i, j))|`` where
  out-of-image offsets are skipped (:19-46). Note the residual loop bound is
  *inclusive* (``<= scale_range``).
- The gradient loops are *exclusive* (``< scale_range``, :114, :139) — a
  deliberate reproduction of the reference's asymmetry (flagged in SURVEY.md
  §2 #17); with ``D_ij(p) = x(p) - x(p + (i,j))``, ``T_ij = a^(i+j) G
  sign(D_ij)``, and ``G = 2 c r``:

      grad = sum_{i,j in [0, P)} T_ij                    (self term, :108-137)
           - sum_{i,j in [0, P)} shift_{i,j}(T_ij')      (window overlap, :138-165)

  where shift moves values down-right by (i, j) with zero fill, and ``T_ij'``
  zeroes the contribution sourced at the image-origin pixel (0, 0) —
  replicating the reference's ``offset_row == 0 && offset_col == 0`` skip.

The (P+1)^2 offsets unroll at trace time into shifted-subtract ops that XLA
fuses; P is small (1-3) in practice.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["btv_residuals", "btv_cost_and_grad", "BilateralTotalVariationRegularizer"]


def _shifted_diff(x: jnp.ndarray, i: int, j: int) -> jnp.ndarray:
    """D_ij(p) = x(p) - x(p + (i, j)); zero where the offset leaves the image."""
    if i == 0 and j == 0:
        return jnp.zeros_like(x)
    h, w = x.shape[-2], x.shape[-1]
    shifted = x[..., i:, j:]
    pad = [(0, 0)] * (x.ndim - 2) + [(0, i), (0, j)]
    d = x[..., : h - i, : w - j] - shifted
    return jnp.pad(d, pad)


def _shift_down_right(v: jnp.ndarray, i: int, j: int) -> jnp.ndarray:
    if i == 0 and j == 0:
        return v
    h, w = v.shape[-2], v.shape[-1]
    pad = [(0, 0)] * (v.ndim - 2) + [(i, 0), (j, 0)]
    return jnp.pad(v[..., : h - i, : w - j], pad)


def btv_residuals(x: jnp.ndarray, scale_range: int, spatial_decay: float) -> jnp.ndarray:
    """Per-pixel BTV residuals of ``[C, H, W]`` (inclusive window bound)."""
    r = jnp.zeros_like(x)
    for i in range(scale_range + 1):
        for j in range(scale_range + 1):
            r = r + (spatial_decay ** (i + j)) * jnp.abs(_shifted_diff(x, i, j))
    return r


def btv_cost_and_grad(
    x: jnp.ndarray,
    constants: jnp.ndarray,
    scale_range: int,
    spatial_decay: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """IRLS BTV term: cost ``sum(c r^2)`` and reference-parity gradient."""
    r = btv_residuals(x, scale_range, spatial_decay)
    cost = jnp.sum(constants * r * r)
    g = 2.0 * constants * r
    grad = jnp.zeros_like(x)
    # Gradient windows use the exclusive bound [0, scale_range).
    for i in range(scale_range):
        for j in range(scale_range):
            t = (spatial_decay ** (i + j)) * g * jnp.sign(_shifted_diff(x, i, j))
            grad = grad + t
            # Overlap term: contributions sourced at image origin are skipped
            # (the reference's offset_row==0 && offset_col==0 quirk).
            t_masked = t.at[..., 0, 0].set(0.0)
            grad = grad - _shift_down_right(t_masked, i, j)
    return cost, grad


class BilateralTotalVariationRegularizer:
    """Object wrapper mirroring ``btv_regularizer.h:17-45``."""

    def __init__(self, scale_range: int, spatial_decay: float):
        if scale_range < 1:
            raise ValueError("Range must be at least 1 (1 pixel in each direction).")
        if not (0.0 < spatial_decay <= 1.0):
            raise ValueError("Spatial decay must be in (0, 1].")
        self.scale_range = scale_range
        self.spatial_decay = spatial_decay

    def residuals(self, x: jnp.ndarray) -> jnp.ndarray:
        return btv_residuals(x, self.scale_range, self.spatial_decay)

    def cost_and_grad(self, x: jnp.ndarray, constants: jnp.ndarray):
        return btv_cost_and_grad(x, constants, self.scale_range, self.spatial_decay)
