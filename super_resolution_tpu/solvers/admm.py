"""ADMM MAP solver with exact TV splitting.

The reference's AdmmSolver is a non-functional skeleton that returns the
initial estimate (``src/optimization/admm_solver.cpp:10-34``; X/Z splitting
only sketched in comments). This is the real algorithm it sketches:

    min_x  s^2 sum_k ||A_k x - y_k||^2 + lambda ||G x||_1

split with z = G x (forward-difference stack), giving the standard updates

    x <- argmin s^2 sum_k ||A_k x - y_k||^2 + (rho/2) ||G x - z + u||^2
         (a few matrix-free linear-CG steps on the SPD normal equations)
    z <- soft_threshold(G x + u, lambda / rho)
    u <- u + G x - z

Everything is one jittable ``lax.fori_loop``: the x-update's CG uses the
fused degrade/adjoint operators, so the whole solver is a single XLA
computation. Unlike IRLS (which squares the anisotropic TV residual), ADMM
minimizes the true L1 TV objective; the two meet at the same reconstructions
on the inverse-crime tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from super_resolution_tpu.solvers.objective import data_term_cost_and_grad

__all__ = ["admm_solve", "AdmmResult"]


class AdmmResult(NamedTuple):
    x: jnp.ndarray
    iterations: int
    primal_residual: jnp.ndarray
    dual_residual: jnp.ndarray


def _grad_x(x):
    d = x[..., :, 1:] - x[..., :, :-1]
    return jnp.pad(d, [(0, 0)] * (x.ndim - 1) + [(0, 1)])


def _grad_y(x):
    d = x[..., 1:, :] - x[..., :-1, :]
    return jnp.pad(d, [(0, 0)] * (x.ndim - 2) + [(0, 1), (0, 0)])


def _g(x):
    """Forward-difference operator G: [C,H,W] -> [2,C,H,W]."""
    return jnp.stack([_grad_x(x), _grad_y(x)])


def _gt(z):
    """Adjoint G^T: [2,C,H,W] -> [C,H,W] (negative divergence)."""
    zx, zy = z[0], z[1]
    # Adjoint of d(r,c) = x(r,c+1) - x(r,c) for c < W-1 (zero at last col):
    zx = zx.at[..., :, -1].set(0.0)
    zy = zy.at[..., -1, :].set(0.0)
    gx = jnp.pad(zx[..., :, :-1], [(0, 0)] * (zx.ndim - 1) + [(1, 0)]) - zx
    gy = jnp.pad(zy[..., :-1, :], [(0, 0)] * (zy.ndim - 2) + [(1, 0), (0, 0)]) - zy
    return gx + gy


def _soft_threshold(v, kappa):
    return jnp.sign(v) * jnp.maximum(jnp.abs(v) - kappa, 0.0)


def admm_solve(
    x0: jnp.ndarray,
    observations: jnp.ndarray,
    shifts: jnp.ndarray,
    blur_kernel,
    scale: int,
    tv_lambda: float = 0.01,
    rho: float = 1.0,
    num_iterations: int = 30,
    cg_iterations: int = 10,
    max_shift: int = 16,
) -> AdmmResult:
    """Run ADMM; jit-safe (all loops are lax loops with static bounds)."""
    dtype = x0.dtype
    rho = jnp.asarray(rho, dtype)

    def data_grad(x):
        # grad of s^2 sum ||A x - y||^2 (factor 2 included by the helper).
        _, g = data_term_cost_and_grad(
            x, observations, shifts, blur_kernel, scale, max_shift
        )
        return g

    # Hessian-vector product of the x-subproblem: 2 s^2 sum A^T A v + rho G^T G v.
    zero_obs = jnp.zeros_like(observations)

    def hvp(v):
        _, g = data_term_cost_and_grad(
            v, zero_obs, shifts, blur_kernel, scale, max_shift
        )
        return g + rho * _gt(_g(v))

    def x_update(x, z, u):
        # Solve hvp(x) = b with linear CG, warm-started at x.
        b = -data_grad(jnp.zeros_like(x)) + rho * _gt(z - u)
        r = b - hvp(x)
        p = r
        rs = jnp.vdot(r.reshape(-1), r.reshape(-1))

        def body(_, carry):
            x, r, p, rs = carry
            hp = hvp(p)
            denom = jnp.vdot(p.reshape(-1), hp.reshape(-1))
            alpha = rs / jnp.where(denom == 0, 1.0, denom)
            x = x + alpha * p
            r = r - alpha * hp
            rs_new = jnp.vdot(r.reshape(-1), r.reshape(-1))
            beta = rs_new / jnp.where(rs == 0, 1.0, rs)
            p = r + beta * p
            return x, r, p, rs_new

        x, _, _, _ = lax.fori_loop(0, cg_iterations, body, (x, r, p, rs))
        return x

    def admm_iter(_, carry):
        x, z, u = carry
        x = x_update(x, z, u)
        gx = _g(x)
        z = _soft_threshold(gx + u, tv_lambda / rho)
        u = u + gx - z
        return x, z, u

    z0 = _g(x0)
    u0 = jnp.zeros_like(z0)
    x, z, u = lax.fori_loop(0, num_iterations, admm_iter, (x0, z0, u0))
    gx = _g(x)
    primal = jnp.sqrt(jnp.sum((gx - z) ** 2))
    dual = rho * jnp.sqrt(jnp.sum(_gt(z - _g(x0)) ** 2))
    return AdmmResult(x=x, iterations=num_iterations, primal_residual=primal, dual_residual=dual)
