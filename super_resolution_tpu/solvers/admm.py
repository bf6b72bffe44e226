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

__all__ = ["admm_solve", "AdmmResult", "AdmmSolver", "AdmmSolverOptions"]


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


import dataclasses

from super_resolution_tpu.solvers.map_solver import MapSolverOptions
from super_resolution_tpu.solvers.solver import MapSolverBase


@dataclasses.dataclass
class AdmmSolverOptions(MapSolverOptions):
    """ADMM options; ``max_num_solver_iterations`` is the outer ADMM
    iteration count (matching the reference's shared MapSolverOptions seam,
    ``admm_solver.h:15-27``)."""

    rho: float = 1.0
    # Linear-CG steps per x-subproblem solve (warm-started at the previous
    # x, so a handful suffices).
    admm_cg_iterations: int = 10


class AdmmSolver(MapSolverBase):
    """ADMM MAP solver implementing the :class:`Solver` interface.

    The reference stubs this class as a MapSolver subclass that returns its
    input (``src/optimization/admm_solver.cpp:10-34``); this one wraps the
    working :func:`admm_solve` so ADMM is a first-class, CLI-reachable peer
    of :class:`IRLSMapSolver`. Unlike IRLS (which squares the anisotropic TV
    residual and reweights), ADMM minimizes the true L1-TV objective — the
    two meet at the same reconstructions on the inverse-crime tests.

    Supports exactly one 2D :class:`TotalVariationRegularizer` term (the
    exact L1 splitting implemented by :func:`admm_solve`); no regularizer
    degrades to plain least squares. BTV / 3D TV splittings are not
    implemented — use IRLS for those.
    """

    def __init__(self, options: AdmmSolverOptions, image_model, low_res_images,
                 print_solver_output: bool = False):
        super().__init__(image_model, low_res_images, print_solver_output)
        self.options = options
        motion = image_model.motion_operator
        k = self.observations.shape[0]
        if motion is not None:
            arr = motion.motion_sequence.as_array()
            if arr.shape[0] < k:
                raise ValueError("Fewer motion shifts than LR frames.")
            self.shifts = jnp.asarray(arr[:k])
            b = 2
            while b < motion.max_shift:
                b *= 2
            self.max_shift = b
        else:
            self.shifts = jnp.zeros((k, 2))
            self.max_shift = 2
        blur = image_model.blur_operator
        self.blur_kernel = None if blur is None else jnp.asarray(blur.kernel)
        self._solve_jit = None

    def solve(self, initial_estimate):
        from super_resolution_tpu.image.image_data import ImageData
        from super_resolution_tpu.ops.tv import TotalVariationRegularizer

        arr = getattr(initial_estimate, "array", initial_estimate)
        x0 = jnp.asarray(arr)
        if x0.ndim == 2:
            x0 = x0[None]
        if x0.shape != self.hr_shape:
            raise ValueError(
                f"Initial estimate shape {x0.shape} != expected {self.hr_shape}"
            )

        tv_lambda = 1e-8  # ~unregularized least squares
        if self.regularizers:
            if len(self.regularizers) != 1:
                raise ValueError("AdmmSolver supports exactly one regularizer.")
            reg, lam = self.regularizers[0]
            if not isinstance(reg, TotalVariationRegularizer) or getattr(
                reg, "use_3d", False
            ):
                raise ValueError(
                    "AdmmSolver implements the exact L1 splitting for 2D TV "
                    "only; use IRLSMapSolver for BTV / 3D TV."
                )
            tv_lambda = lam

        opts = self.options
        if self._solve_jit is None:
            import jax as _jax

            self._solve_jit = _jax.jit(
                lambda x0, obs, shifts, lam: admm_solve(
                    x0, obs, shifts, self.blur_kernel, self.scale,
                    tv_lambda=lam, rho=opts.rho,
                    num_iterations=opts.max_num_solver_iterations,
                    cg_iterations=opts.admm_cg_iterations,
                    max_shift=self.max_shift,
                ).x
            )
        x = self._solve_jit(x0, self.observations, self.shifts, tv_lambda)
        if self.verbose:
            print(
                f"ADMM done ({opts.max_num_solver_iterations} iterations, "
                f"rho={opts.rho}, lambda={tv_lambda})."
            )
        if isinstance(initial_estimate, ImageData):
            return ImageData(
                x, normalize="never", channel_major=True,
                spectral_mode=initial_estimate.spectral_mode,
            )
        return x
