"""Solver options mirroring ``src/optimization/map_solver.h:28-79`` and
``irls_map_solver.h:14-37``."""

from __future__ import annotations

import dataclasses

__all__ = ["MapSolverOptions", "IRLSMapSolverOptions"]


@dataclasses.dataclass
class MapSolverOptions:
    """Options shared by MAP solvers (defaults = reference defaults)."""

    # 'cg' (reference default, strong-Wolfe nonlinear CG), 'lbfgs', or
    # 'linear_cg' — exact-step CG exploiting the quadratic IRLS inner
    # subproblem: one objective evaluation per iteration (the Wolfe search
    # measures 1.56/iter on the flagship) with a true re-evaluation every
    # linear_cg_refresh_every iterations.
    least_squares_solver: str = "cg"
    linear_cg_refresh_every: int = 8
    num_lbfgs_hessian_corrections: int = 5
    max_num_solver_iterations: int = 50
    gradient_norm_threshold: float = 1e-6
    cost_decrease_threshold: float = 1e-6
    parameter_variation_threshold: float = 1e-6
    # 'analytic' = reference-parity hand-derived gradients;
    # 'autodiff' = jax.grad of the cost (machine-precision derivatives);
    # 'numerical' = central differences (the reference's
    # use_numerical_differentiation, map_solver.h:64-69 — O(2n) cost
    # evaluations per gradient, tiny validation problems only).
    diff_mode: str = "analytic"
    split_channels: bool = False
    # Use the fused Pallas TPU kernel for the data term. ``None`` (default)
    # = AUTO: on at solve time whenever the backend is a TPU and
    # ``diff_mode == "analytic"`` (the production path — the traced fallback
    # measured ~3x slower per evaluation), off on CPU (the interpret-mode
    # kernel is for tests). Explicit True/False forces the choice; the
    # reference's binary and its solver are one code path
    # (``super_resolution.cpp:126-199``), and with AUTO so are ours.
    use_pallas_data_term: bool | None = None
    # Specialize the data term on host-known shifts (unrolled per-frame
    # slices). Measured SLOWER than the vmapped traced path on TPU (the
    # batched form fuses better), so off by default; kept for CPU use and
    # as the semantics reference for the Pallas kernel.
    use_static_shifts: bool = False
    # Pallas kernel tile size in HR pixels; 0 = VMEM-aware automatic choice
    # (ops/pallas/degrade.py choose_tile). 512 measured fastest for the
    # 1-channel 4x 1000^2 benchmark shape.
    pallas_tile: int | tuple[int, int] = 0  # 0 = VMEM-aware auto; (rows, cols) ok
    # > 0 selects the shift-generic fused kernel: motion shifts are runtime
    # data (SMEM tap tables) and ONE compiled executable serves every shift
    # set with max(|dx|, |dy|) <= bound — use for estimated motion, video
    # sliding windows, and frame-sharded meshes, where per-shift-set
    # recompiles (minutes on a remote-compile toolchain) are unacceptable.
    # 0 forces the trace-time-specialized kernel (fastest for one fixed,
    # host-known motion sequence). ``None`` (default) = AUTO: the solver
    # picks ``shift_bound_bucket(max|shift|)`` when the motion is fractional
    # (estimated registration — every distinct shift set would otherwise
    # recompile the specialized kernel) or a frame mesh is present (per-
    # device shifts must be runtime data), and 0 otherwise.
    pallas_shift_bound: float | None = None
    # Bands per kernel grid step; 0 = automatic (largest channel block that
    # keeps the spatial tile at the 1-band optimum; see
    # ops/pallas/degrade.py choose_channel_block). Hyperspectral stacks keep
    # large, lane-filling tiles this way instead of OOM-shrinking them.
    pallas_channel_block: int = 0
    # Run the ENTIRE IRLS loop in one jitted graph (irls_solve_fused): the
    # outer reweighting becomes a lax.while_loop around the inner CG/L-BFGS
    # while_loop — zero host round-trips per IRLS iteration. The host-loop
    # default keeps per-iteration logging and checkpoint/resume (the fused
    # path supports neither).
    fused_irls: bool = False

    def adjust_thresholds_adaptively(
        self, num_parameters: int, regularization_parameter_sum: float
    ) -> None:
        """Scale stop thresholds by (n_params * sum lambda), only upward
        (``map_solver.cpp:16-26``)."""
        threshold_scale = num_parameters * regularization_parameter_sum
        if threshold_scale < 1.0:
            return
        self.gradient_norm_threshold *= threshold_scale
        self.cost_decrease_threshold *= threshold_scale
        self.parameter_variation_threshold *= threshold_scale


@dataclasses.dataclass
class IRLSMapSolverOptions(MapSolverOptions):
    """IRLS outer-loop options (``irls_map_solver.h:27-35``)."""

    max_num_irls_iterations: int = 20
    irls_cost_difference_threshold: float = 1e-5
    # > 0: every N IRLS iterations, refine the per-frame motion shifts
    # against the current HR estimate by damped Gauss-Newton on the data
    # term (motion/refinement.py) — recovers estimated-registration error
    # (~0.1 HR px, bounded by LR aliasing) once the solve has sharpened x.
    # Requires shifts to be runtime data of the inner solve (AUTO selects
    # the shift-generic kernel when this is on), so the refined shifts
    # reuse ONE compiled executable. The reference estimates motion once
    # and never revisits it (registration.cpp:161-201). Composes with the
    # host IRLS loop AND fused_irls (the refinement joins the fused
    # lax.while_loop), single-device or on a pure frame mesh (the per-frame
    # Gauss-Newton shards over the frame axis under GSPMD); band/spatial
    # meshes are rejected (they bake or tile the shifts).
    refine_motion_every: int = 0
    # Gauss-Newton steps per refinement round (2 reaches machine precision
    # against a converged x; the damped steps are ~free next to a solve).
    refine_motion_iterations: int = 2
    # Joint-convergence gate: a converged cost only certifies convergence
    # when the last refinement round moved every shift by less than this
    # (HR px). Raise it for low-texture stacks where Gauss-Newton dithers
    # near the damping floor — otherwise every refined solve runs to
    # max_num_irls_iterations even with the cost criterion satisfied.
    refine_motion_delta_threshold: float = 1e-4

    def adjust_thresholds_adaptively(
        self, num_parameters: int, regularization_parameter_sum: float
    ) -> None:
        threshold_scale = num_parameters * regularization_parameter_sum
        if threshold_scale < 1.0:
            return
        super().adjust_thresholds_adaptively(
            num_parameters, regularization_parameter_sum
        )
        self.irls_cost_difference_threshold *= threshold_scale
