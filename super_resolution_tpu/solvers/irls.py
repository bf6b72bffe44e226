"""IRLS MAP solver — the production solver (TPU-native equivalent of
``src/optimization/irls_map_solver.cpp``).

Algorithm (``RunIRLSLoop``, ``irls_map_solver.cpp:45-157``):

1. Initialize per-regularizer IRLS weights to 1.
2. Inner solve: minimize ``s^2 sum_k ||A_k x - y_k||^2 + sum_r lambda_r
   sum_i w_i r_i(x)^2`` with matrix-free CG or L-BFGS — here one jitted
   ``lax.while_loop`` computation (see :mod:`least_squares`), reused without
   retracing across IRLS iterations (weights are traced arguments).
3. Reweight ``w_i = 1 / max(1e-5, r_i)`` — L1-via-weighted-L2
   (``irls_map_solver.cpp:128-143``, ``kMinResidualValue`` at :34).
4. Repeat until ``|cost_k - cost_{k+1}| < irls_cost_difference_threshold``
   (adaptively scaled) or ``max_num_irls_iterations``.

``split_channels`` solves each channel independently
(``irls_map_solver.cpp:200-262``) — the seam for band-axis sharding of
hyperspectral stacks.

The outer IRLS loop runs on the host (<= 20 cheap iterations around a fully
compiled inner solve), keeping per-iteration logging trivial; the frame loop
inside the data term is a vmap (the reference's serial ``for image_index``).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from super_resolution_tpu.image.image_data import ImageData
from super_resolution_tpu.models.image_model import ImageModel
from super_resolution_tpu.solvers.least_squares import minimize
from super_resolution_tpu.solvers.map_solver import IRLSMapSolverOptions
from super_resolution_tpu.solvers.objective import make_map_value_and_grad
from super_resolution_tpu.solvers.solver import MapSolverBase

__all__ = [
    "IRLSMapSolver",
    "IRLSMapSolverOptions",
    "irls_solve_fused",
    "resolve_auto_options",
]


def resolve_auto_options(opts, *, backend: str, shifts, frame_mesh: bool = False):
    """Resolve the AUTO (``None``) routing fields of a solver options object.

    The production rule (the reference's binary IS its production solver,
    ``super_resolution.cpp:126-199`` — ours must route the same way without
    expert flags):

    - ``use_pallas_data_term`` AUTO -> on whenever the backend is an
      accelerator and ``diff_mode == "analytic"`` (the fused kernel measured
      ~3x the traced path per evaluation, and phase-plane state another 3.3x
      on the full solve); off on CPU, where the interpret-mode kernel exists
      for tests, not speed.
    - ``pallas_shift_bound`` AUTO -> ``shift_bound_bucket(max|shift|)`` when
      the motion is fractional (estimated registration: every distinct shift
      set would recompile the specialized kernel — minutes through a
      remote-compile toolchain) or a frame mesh is present (per-device
      shifts must be runtime SMEM data under one SPMD program); 0 otherwise
      (the trace-specialized kernel is fastest for one fixed integer
      sequence).

    Returns a new options object; explicit (non-``None``) settings pass
    through untouched.
    """
    import dataclasses

    from super_resolution_tpu.ops.pallas.degrade import shift_bound_bucket

    resolved = dataclasses.replace(opts)
    if resolved.use_pallas_data_term is None:
        resolved.use_pallas_data_term = (
            backend != "cpu" and resolved.diff_mode == "analytic"
        )
    if resolved.pallas_shift_bound is None:
        shifts_np = np.asarray(shifts, dtype=np.float64)
        fractional = shifts_np.size > 0 and not np.array_equal(
            shifts_np, np.round(shifts_np)
        )
        # Motion refinement feeds updated shifts back per IRLS iteration —
        # they must be runtime data (every refined set would otherwise
        # recompile the specialized kernel).
        refining = getattr(resolved, "refine_motion_every", 0) > 0
        if resolved.use_pallas_data_term and (fractional or frame_mesh or refining):
            max_abs = float(np.max(np.abs(shifts_np))) if shifts_np.size else 0.0
            # When refinement will move the shifts, resolve the bucket with
            # headroom: the initial estimate can sit exactly at a bucket edge
            # (e.g. max|shift| = 2.0) while the true motion is slightly
            # larger, and the refiner clips to the compiled kernel's bound —
            # without headroom it would silently saturate there forever.
            if refining:
                max_abs += 0.25
            resolved.pallas_shift_bound = float(shift_bound_bucket(max_abs))
        else:
            resolved.pallas_shift_bound = 0.0
    return resolved


def irls_solve_fused(
    value_and_grad_builder,
    regularizers,
    x0: jnp.ndarray,
    options: IRLSMapSolverOptions,
    phase_converters=None,
    return_iterations: bool = False,
    shifts0=None,
    refiner=None,
):
    """The entire IRLS solve as ONE jittable computation.

    ``value_and_grad_builder(weights) -> (x -> (cost, grad))``. The IRLS
    outer loop is a ``lax.while_loop`` whose body runs the full inner
    CG/L-BFGS ``minimize`` (itself a while_loop) and reweights — so a
    complete multi-iteration MAP solve compiles to a single XLA program with
    no host round-trips, and shards across a mesh when the objective carries
    sharded terms. (The host-loop variant in :class:`IRLSMapSolver` keeps
    checkpointing and logging; use this one for production throughput.)

    With ``refiner`` (and ``shifts0``), motion refinement joins the fused
    loop: the shifts become loop-carried state, the builder is called as
    ``value_and_grad_builder(weights, shifts)``, and every
    ``options.refine_motion_every`` IRLS iterations the body runs
    ``refiner(x, shifts) -> (new_shifts, max|change|)`` under a ``lax.cond``
    — the whole alternating solve-x/refine-motion scheme compiles to one
    XLA program (one SPMD program on a frame mesh). Convergence then
    requires BOTH the cost criterion and the last refinement delta below
    ``options.refine_motion_delta_threshold`` (mirroring the host loop),
    and a refinement whose result could never be consumed (iteration cap
    next) is skipped. Returns ``(..., shifts)`` as the final element.
    """
    regs = tuple(regularizers)
    thr = jnp.asarray(options.irls_cost_difference_threshold, x0.dtype)
    max_irls = options.max_num_irls_iterations or 10_000
    refine_every = (
        getattr(options, "refine_motion_every", 0) if refiner is not None else 0
    )
    if refiner is not None and (shifts0 is None or refine_every <= 0):
        raise ValueError(
            "refiner requires shifts0 and options.refine_motion_every > 0."
        )
    delta_thr = jnp.asarray(
        getattr(options, "refine_motion_delta_threshold", 1e-4), x0.dtype
    )
    # Loop-carried shifts (a dummy scalar when refinement is off, so the
    # carry structure is static).
    shifts_init = shifts0 if refiner is not None else jnp.zeros((), x0.dtype)

    def inner(x, weights, shifts):
        # Bind the weights ONCE per inner solve: the builder may pack
        # weight-derived constants (e.g. the fused kernel's TV windows),
        # and emitting that packing inside the CG while_loop body would
        # re-run it per objective evaluation (XLA does not hoist it —
        # measured at ~40% of solve time on TPU).
        if refiner is not None:
            prepared = value_and_grad_builder(weights, shifts)
        else:
            prepared = value_and_grad_builder(weights)
        # Optional (to_planes, from_planes): run the inner solve on
        # polyphase planes, converting once per IRLS iteration (the
        # reweighting needs image-space residuals).
        result = minimize(
            prepared,
            phase_converters[0](x) if phase_converters else x,
            method=options.least_squares_solver,
            max_iterations=options.max_num_solver_iterations,
            gradient_norm_threshold=options.gradient_norm_threshold,
            cost_decrease_threshold=options.cost_decrease_threshold,
            parameter_variation_threshold=options.parameter_variation_threshold,
            memory=options.num_lbfgs_hessian_corrections,
            linear_cg_refresh_every=options.linear_cg_refresh_every,
        )
        if phase_converters:
            result = result._replace(x=phase_converters[1](result.x))
        return result

    if not regs and refiner is None:
        result = inner(x0, (), shifts_init)
        if return_iterations:
            return result.x, result.cost, result.iterations
        return result.x, result.cost

    weights0 = tuple(jnp.ones_like(x0) for _ in regs)
    inf = jnp.asarray(jnp.inf, x0.dtype)
    # inf until a refinement round has run (the requested refinement must
    # execute before the joint gate can certify convergence); 0 when off.
    delta_init = (
        jnp.asarray(jnp.inf, x0.dtype)
        if refiner is not None
        else jnp.zeros((), x0.dtype)
    )

    def cond(state):
        done, it = state[5], state[3]
        return (~done) & (it < max_irls)

    def body(state):
        x, weights, prev_cost, it, inner_its, _, shifts, last_delta = state
        result = inner(x, weights, shifts)
        x_new, cost = result.x, result.cost.astype(x0.dtype)
        new_weights = tuple(
            1.0 / jnp.maximum(_MIN_RESIDUAL, reg.residuals(x_new))
            for (reg, _), _w in zip(regs, weights)
        )
        if refiner is not None:
            cap_next = (it + 1) >= max_irls
            due = ((it + 1) % refine_every == 0) & (~cap_next)

            def do_refine(sh):
                new_sh, delta = refiner(x_new, sh)
                return new_sh, delta.astype(x0.dtype)

            shifts_new, last_delta = lax.cond(
                due, do_refine, lambda sh: (sh, last_delta), shifts
            )
        else:
            shifts_new = shifts
        diff = prev_cost - cost
        done = (jnp.abs(diff) < thr) & (last_delta < delta_thr)
        return (
            x_new, new_weights, cost, it + 1,
            inner_its + result.iterations.astype(jnp.int32), done,
            shifts_new, last_delta,
        )

    x, _, cost, _, inner_its, _, shifts_out, _ = lax.while_loop(
        cond, body,
        (x0, weights0, inf, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
         jnp.zeros((), jnp.bool_), shifts_init, delta_init),
    )
    out = (x, cost)
    if return_iterations:
        out = out + (inner_its,)
    if refiner is not None:
        out = out + (shifts_out,)
    return out

# Minimum residual for IRLS reweighting (``irls_map_solver.cpp:34``).
_MIN_RESIDUAL = 1e-5


def _warn_mesh_fallback(path: str, reasons) -> None:
    """A mesh configuration missed its fast-path eligibility: say so (the
    GSPMD traced fallback measured ~3x slower per evaluation — a silent
    downgrade a user asking for a mesh should hear about)."""
    import warnings

    why = "; ".join(reasons) if reasons else "configuration not eligible"
    warnings.warn(
        f"Mesh solve falling back from the {path} path to the (slower) "
        f"GSPMD traced objective: {why}.",
        RuntimeWarning,
        stacklevel=3,
    )

# Built inner solvers shared ACROSS solver instances (module-level): video
# sliding windows construct a fresh IRLSMapSolver per frame, and rebuilding
# the jit wrapper forces a full retrace (measured ~21 s host overhead on a
# 1000^2 solve). Keyed by everything the trace bakes in as a constant:
# options, regularizer signatures, blur kernel bytes, static shift bytes
# (None on the shift-generic path, where shifts are traced arguments),
# scale/max_shift/verbosity, and the mesh identity. LRU-capped: a long-lived
# service sweeping options or baked shift sets must not leak executables
# (each entry pins a compiled XLA program).
from collections import OrderedDict

_BUILT_SOLVER_CACHE: OrderedDict = OrderedDict()
_BUILT_SOLVER_CACHE_MAX = 32


def _regs_signature(regs):
    return tuple(
        (type(r).__name__, tuple(sorted(vars(r).items())), lam)
        for r, lam in regs
    )


def _as_chw(image) -> jnp.ndarray:
    arr = getattr(image, "array", image)
    arr = jnp.asarray(arr)
    if arr.ndim == 2:
        arr = arr[None]
    return arr


class IRLSMapSolver(MapSolverBase):
    """MAP super-resolution solver with IRLS-reweighted regularization."""

    def __init__(
        self,
        options: IRLSMapSolverOptions,
        image_model: ImageModel,
        low_res_images,
        print_solver_output: bool = False,
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh with a 'frame' (and optionally
        'band') axis — observations are placed sharded and GSPMD reduces the
        per-frame gradients with psum (see parallel/data_parallel.py)."""
        super().__init__(image_model, low_res_images, print_solver_output)
        self.options = options
        self.mesh = mesh
        self.last_inner_iterations = 0
        # (wall seconds, CG/L-BFGS iterations, objective evaluations) per
        # inner-solver call of the last solve().
        self.last_inner_calls: list[tuple[float, int, int]] = []
        # Built inner solvers, keyed by (split, options): repeated solve()
        # calls (video sliding windows, IRLS restarts) must reuse the jitted
        # executable — rebuilding the jit wrapper per call forces a full
        # retrace (measured ~21 s of pure host overhead on a 5x10-iteration
        # 1000^2 solve, experiments/tpu_irls_mode_bench.py pre-fix).
        self._inner_cache = {}
        self._spatial_mesh = False
        if mesh is not None:
            from super_resolution_tpu.parallel.mesh import (
                COL_AXIS,
                ROW_AXIS,
                named_sharding,
            )

            self._spatial_mesh = (
                ROW_AXIS in mesh.axis_names or COL_AXIS in mesh.axis_names
            )
            if self._spatial_mesh:
                from super_resolution_tpu.parallel.mesh import (
                    BAND_AXIS,
                    FRAME_AXIS,
                )

                sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
                row = ROW_AXIS if ROW_AXIS in mesh.axis_names else None
                col = COL_AXIS if COL_AXIS in mesh.axis_names else None
                # Composite spatial meshes (row x col x frame/band): shard
                # the observation stack on every participating axis the
                # shapes allow (non-divisible axes stay replicated and the
                # solve falls back accordingly).
                frame = (
                    FRAME_AXIS
                    if FRAME_AXIS in mesh.axis_names
                    and self.observations.shape[0] % sizes[FRAME_AXIS] == 0
                    else None
                )
                band = (
                    BAND_AXIS
                    if BAND_AXIS in mesh.axis_names
                    and self.observations.shape[1] % sizes[BAND_AXIS] == 0
                    else None
                )
                self.observations = jax.device_put(
                    self.observations, named_sharding(mesh, frame, band, row, col)
                )
            else:
                from super_resolution_tpu.parallel.data_parallel import (
                    shard_problem,
                )

                # x placement happens per solve; shard the static
                # observations now.
                zeros = jnp.zeros(self.hr_shape, self.observations.dtype)
                _, self.observations, _ = shard_problem(
                    mesh, zeros, self.observations,
                    jnp.zeros((self.observations.shape[0], 2)),
                )

        motion = image_model.motion_operator
        k = self.observations.shape[0]
        if motion is not None:
            arr = motion.motion_sequence.as_array()
            if arr.shape[0] < k:
                raise ValueError("Fewer motion shifts than LR frames.")
            self.shifts = jnp.asarray(arr[:k])
            # Bucket the warp-padding bound to the next power of two:
            # max_shift only sizes translate's internal pad (semantics are
            # pad -> warp -> crop, unchanged by extra pad), and per-window
            # exact values would give every video sliding window its own
            # trace — bucketing collapses them onto one cached executable.
            b = 2
            while b < motion.max_shift:
                b *= 2
            self.max_shift = b
        else:
            self.shifts = jnp.zeros((k, 2))
            self.max_shift = 2
        self._shifts_placement = None
        if mesh is not None:
            from super_resolution_tpu.parallel.mesh import FRAME_AXIS, named_sharding

            sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
            frame = (
                FRAME_AXIS
                if FRAME_AXIS in mesh.axis_names
                and k % sizes[FRAME_AXIS] == 0
                else None
            )
            self._shifts_placement = named_sharding(mesh, frame, None)
            self.shifts = jax.device_put(self.shifts, self._shifts_placement)

        blur = image_model.blur_operator
        self.blur_kernel = None if blur is None else jnp.asarray(blur.kernel)

    def solve(self, initial_estimate, checkpoint_path: str | None = None,
              resume: bool = False):
        """Run the solver; returns the same type as the input estimate."""
        x_full = _as_chw(initial_estimate)
        if x_full.shape != self.hr_shape:
            raise ValueError(
                f"Initial estimate shape {x_full.shape} != expected {self.hr_shape}"
            )

        c = self.num_channels
        channels_per_split = 1 if self.options.split_channels else c
        num_rounds = c // channels_per_split
        num_pixels = self.hr_shape[1] * self.hr_shape[2]
        num_data_points = channels_per_split * num_pixels
        # Pixels each INNER CALL solves (one channel round) — the correct
        # per-call normalizer for throughput reporting: with split_channels
        # an inner call touches channels_per_split*H*W elements, not C*H*W.
        self.last_inner_pixels = num_data_points

        # Adaptive threshold scaling (``irls_map_solver.cpp:214-216``).
        import dataclasses

        opts = dataclasses.replace(self.options)
        # Resolve AUTO routing fields (production path selection). The
        # backend is initialized by now (the observations are device arrays).
        opts = resolve_auto_options(
            opts,
            backend=jax.default_backend(),
            shifts=self.shifts,
            frame_mesh=self._has_frame_mesh(),
        )
        # Exposed for introspection (CLI logging, routing tests).
        self.last_resolved_options = opts
        if self.verbose:
            print(
                "Solver routing: "
                f"pallas={'on' if opts.use_pallas_data_term else 'off'}"
                + (
                    f" shift_generic(bound={opts.pallas_shift_bound:g})"
                    if opts.pallas_shift_bound > 0.0
                    else " shift_specialized"
                )
                + (" fused_irls" if opts.fused_irls else " host_irls")
                + (f" mesh={dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}"
                   if self.mesh is not None else "")
            )
        opts.adjust_thresholds_adaptively(
            num_data_points, self.regularization_parameter_sum
        )

        if opts.fused_irls and checkpoint_path:
            raise ValueError(
                "fused_irls runs the whole IRLS loop on-device with no "
                "checkpoint seam; use the host-loop default for "
                "checkpoint/resume."
            )
        if getattr(opts, "refine_motion_every", 0) > 0:
            if self.mesh is not None and not self._pure_frame_mesh():
                raise ValueError(
                    "refine_motion_every on a mesh requires a pure frame "
                    "mesh: band and spatial placements bake or tile the "
                    "shifts, but refinement needs them as runtime data "
                    "(the frame-sharded objective already carries per-device "
                    "shifts)."
                )
            if opts.use_pallas_data_term and not opts.pallas_shift_bound > 0.0:
                raise ValueError(
                    "refine_motion_every requires shifts as runtime data: "
                    "leave pallas_shift_bound AUTO (None) or set it > 0 — "
                    "every refined shift set would recompile the "
                    "specialized kernel."
                )
            if not opts.use_pallas_data_term and opts.use_static_shifts:
                raise ValueError(
                    "refine_motion_every is incompatible with "
                    "use_static_shifts (shifts must stay traced arguments)."
                )

        # Total inner CG/L-BFGS iterations of the last solve() call (all
        # channel rounds + IRLS iterations) — lets callers (the CLI's
        # verbose mode) report Mpixel-iterations/s for the actual solve.
        self.last_inner_iterations = 0
        self.last_inner_calls = []

        results = []
        kern = self.blur_kernel
        # Shift values are baked into the trace ONLY on the host-known-shift
        # paths; the shift-generic kernel (pallas_shift_bound > 0) takes them
        # as traced arguments, and keying on them there would defeat the
        # cross-window executable reuse it exists for.
        pallas_dynamic = (
            opts.use_pallas_data_term
            and opts.pallas_shift_bound > 0.0
            and opts.diff_mode == "analytic"
            and self.mesh is None
        )
        # Refined solves carry the shifts as runtime data on EVERY allowed
        # path (the rejections above enforce it), so their values never bake
        # into a trace — keying on them would rebuild per refinement.
        refining = getattr(opts, "refine_motion_every", 0) > 0
        shifts_baked = not refining and (
            self.mesh is not None
            or (
                opts.diff_mode == "analytic"
                and (opts.use_static_shifts or opts.use_pallas_data_term)
                and not pallas_dynamic
            )
        )
        # repr() keys all option fields incl. list-valued pallas_tile
        # (astuple would make the key unhashable for list inputs).
        cache_key = (
            channels_per_split,
            repr(opts),
            _regs_signature(self.regularizers),
            None if kern is None else (kern.shape, np.asarray(kern).tobytes()),
            np.asarray(self.shifts).tobytes() if shifts_baked else None,
            self.scale,
            self.max_shift,
            self.verbose,
            None if self.mesh is None else id(self.mesh),
        )
        inner = self._inner_cache.get(cache_key)
        if inner is None and self.mesh is None:
            # Cross-instance reuse (video sliding windows build a fresh
            # solver per frame); mesh solvers stay instance-local (the mesh
            # object itself is baked into the shard_map).
            inner = _BUILT_SOLVER_CACHE.get(cache_key)
            if inner is not None:
                _BUILT_SOLVER_CACHE.move_to_end(cache_key)
        if inner is None:
            if opts.fused_irls:
                inner = self._build_fused_solver(opts, channels_per_split)
            else:
                inner = self._build_inner_solver(channels_per_split, opts)
            self._inner_cache[cache_key] = inner
            if self.mesh is None:
                _BUILT_SOLVER_CACHE[cache_key] = inner
                while len(_BUILT_SOLVER_CACHE) > _BUILT_SOLVER_CACHE_MAX:
                    _BUILT_SOLVER_CACHE.popitem(last=False)
        for i in range(num_rounds):
            ch0 = i * channels_per_split
            ch1 = ch0 + channels_per_split
            x0 = x_full[ch0:ch1]
            obs = self.observations[:, ch0:ch1]
            ckpt = (
                f"{checkpoint_path}.round{i}.npz"
                if checkpoint_path and num_rounds > 1
                else (f"{checkpoint_path}.npz" if checkpoint_path else None)
            )
            if opts.fused_irls:
                if refining:
                    x, cost, its, new_shifts = inner(
                        self._place_initial(x0), obs, self.shifts
                    )
                    # Later channel rounds (and later solve() calls) start
                    # from the refined motion, like the host loop.
                    self.shifts = new_shifts
                    if self._shifts_placement is not None:
                        self.shifts = jax.device_put(
                            self.shifts, self._shifts_placement
                        )
                else:
                    x, cost, its = inner(
                        self._place_initial(x0), obs, self.shifts
                    )
                # One batched readback (see _run_irls_loop: per-scalar
                # device_get costs ~25 ms RPC latency through the tunnel).
                cost_v, its_v = jax.device_get((cost, its))
                self.last_inner_iterations += int(its_v)
                if self.verbose:
                    print(f"Fused IRLS round {i} done; final loss {float(cost_v)}.")
            else:
                x = self._run_irls_loop(inner, x0, obs, opts, ckpt, resume)
            results.append(x)
        out = jnp.concatenate(results, axis=0)
        if isinstance(initial_estimate, ImageData):
            result = ImageData(
                out, normalize="never", channel_major=True,
                spectral_mode=initial_estimate.spectral_mode,
            )
            return result
        return out

    # ------------------------------------------------------------------ internals

    def _has_frame_mesh(self) -> bool:
        if self.mesh is None:
            return False
        from super_resolution_tpu.parallel.mesh import FRAME_AXIS

        sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        return sizes.get(FRAME_AXIS, 1) > 1

    def _pure_frame_mesh(self) -> bool:
        """True when every non-frame mesh axis has size 1 — the placement
        where shifts are per-device runtime data and x is replicated, so
        motion refinement composes with the distribution (GSPMD shards the
        per-frame Gauss-Newton over the frame axis)."""
        if self.mesh is None:
            return False
        from super_resolution_tpu.parallel.mesh import FRAME_AXIS

        sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        return all(n == 1 for name, n in sizes.items() if name != FRAME_AXIS)

    def _mesh_pallas_vg_builder(self, opts, channels_per_split: int):
        """Route a mesh solve onto a fused-Pallas sharded vg builder.

        Returns ``(make_vg, phase_io)`` where ``make_vg(observations,
        shifts) -> vg`` builds the right sharded objective for this mesh
        (spatial tiled / frame-sharded / band-sharded; the vg exposes
        ``.prepare`` and, when ``phase_io``, ``.to_planes``/``.from_planes``)
        — or ``(None, False)``, with the fallback warning emitted, when the
        configuration fits no fused path. Shared by the host-IRLS inner
        solver and the fused-IRLS builder so both route identically.
        """
        if (
            self.mesh is None
            or not opts.use_pallas_data_term
            or opts.diff_mode != "analytic"
        ):
            return None, False

        from super_resolution_tpu.ops.btv import (
            BilateralTotalVariationRegularizer,
        )
        from super_resolution_tpu.ops.tv import TotalVariationRegularizer
        from super_resolution_tpu.parallel.mesh import (
            BAND_AXIS,
            COL_AXIS,
            FRAME_AXIS,
            ROW_AXIS,
        )

        mesh = self.mesh
        regs = tuple(self.regularizers)
        kernel = self.blur_kernel
        scale = self.scale
        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        n_frame = axis_sizes.get(FRAME_AXIS, 1)
        n_band = axis_sizes.get(BAND_AXIS, 1)
        band_divides = channels_per_split % n_band == 0
        frames_divide = self.observations.shape[0] % n_frame == 0
        bound = opts.pallas_shift_bound
        phase_io = self._phase_io_ok(regs)
        static_np = np.asarray(self.shifts)

        if self._spatial_mesh:
            # Spatial (row/col, possibly x frame/band) meshes: the fused
            # kernel per shard with traced origins + halo exchange
            # (parallel/halo.py). 3D spectral TV is out (band coupling +
            # spatial tiling would need both halo systems at once).
            regs_ok = len(regs) <= 1 and all(
                (
                    isinstance(r, TotalVariationRegularizer)
                    and not getattr(r, "use_3d", False)
                )
                or isinstance(r, BilateralTotalVariationRegularizer)
                for r, _ in regs
            )
            n_row = axis_sizes.get(ROW_AXIS, 1)
            n_col = axis_sizes.get(COL_AXIS, 1)
            _, h_hr, w_hr = self.hr_shape
            shapes_ok = (
                h_hr % n_row == 0
                and w_hr % n_col == 0
                and (h_hr // n_row) % scale == 0
                and (w_hr // n_col) % scale == 0
            )
            eligible = (
                regs_ok
                and shapes_ok
                and band_divides
                and frames_divide
                and (n_frame == 1 or bound > 0.0)
            )
            if not eligible:
                reasons = []
                if not regs_ok:
                    reasons.append(
                        "regularizers not tileable (need exactly <=1 2D TV "
                        "or BTV term)"
                    )
                if not shapes_ok:
                    reasons.append(
                        f"HR shape {(h_hr, w_hr)} not divisible into "
                        f"{n_row}x{n_col} scale-aligned tiles"
                    )
                if not band_divides:
                    reasons.append(
                        f"{channels_per_split} channels not divisible by the "
                        f"band axis ({n_band})"
                    )
                if not frames_divide:
                    reasons.append(
                        f"{self.observations.shape[0]} frames not divisible "
                        f"by the frame axis ({n_frame})"
                    )
                if n_frame > 1 and not bound > 0.0:
                    reasons.append(
                        "frame axis needs the shift-generic kernel "
                        "(pallas_shift_bound > 0; AUTO selects it)"
                    )
                _warn_mesh_fallback("fused-Pallas tiled", reasons)
                return None, False
            from super_resolution_tpu.parallel.halo import make_tiled_pallas_vg

            image_shape = (h_hr, w_hr)

            def make_vg_spatial(observations, shifts):
                return make_tiled_pallas_vg(
                    mesh, observations,
                    shifts if bound > 0.0 else static_np,
                    kernel, scale, regs, image_shape=image_shape,
                    shift_bound=bound, pallas_tile=opts.pallas_tile,
                    phase_io=phase_io,
                )

            return make_vg_spatial, phase_io

        # Non-spatial (frame/band) meshes. 3D spectral TV is band-shardable
        # here: the builders carry a one-band ppermute halo ring
        # (parallel/pallas_sharded.py).
        regs_ok = len(regs) <= 1 and all(
            isinstance(
                r, (TotalVariationRegularizer, BilateralTotalVariationRegularizer)
            )
            for r, _ in regs
        )
        frame_eligible = (
            n_frame > 1
            and regs_ok
            and band_divides
            and bound > 0.0
            and frames_divide
        )
        band_eligible = (
            n_frame == 1 and BAND_AXIS in axis_sizes and regs_ok and band_divides
        )
        if not frame_eligible and not band_eligible:
            reasons = []
            if not regs_ok:
                reasons.append(
                    "regularizers not kernel-fusable (need exactly <=1 "
                    "TV/BTV term)"
                )
            if not band_divides:
                reasons.append(
                    f"{channels_per_split} channels not divisible by the "
                    f"band axis ({n_band})"
                )
            if n_frame > 1 and not bound > 0.0:
                reasons.append(
                    "frame mesh needs the shift-generic kernel "
                    "(pallas_shift_bound > 0; AUTO selects it)"
                )
            if n_frame > 1 and not frames_divide:
                reasons.append(
                    f"{self.observations.shape[0]} frames not divisible "
                    f"by the frame axis ({n_frame})"
                )
            _warn_mesh_fallback("fused-Pallas sharded", reasons)
            return None, False
        if frame_eligible:
            from super_resolution_tpu.parallel.pallas_sharded import (
                make_frame_sharded_pallas_vg,
            )

            def make_vg_frame(observations, shifts):
                return make_frame_sharded_pallas_vg(
                    mesh, observations, shifts, kernel, scale, regs,
                    shift_bound=bound, pallas_tile=opts.pallas_tile,
                    phase_io=phase_io,
                )

            return make_vg_frame, phase_io

        from super_resolution_tpu.parallel.pallas_sharded import (
            make_band_sharded_pallas_vg,
        )

        def make_vg_band(observations, shifts):
            return make_band_sharded_pallas_vg(
                mesh, observations, static_np, kernel, scale, regs,
                pallas_tile=opts.pallas_tile, phase_io=phase_io,
            )

        return make_vg_band, phase_io

    def _build_fused_solver(self, opts, channels_per_split: int = 0):
        """All-in-graph IRLS (``irls_solve_fused``): one jitted computation
        per channel round, zero host round-trips. Routed by
        ``IRLSMapSolverOptions.fused_irls``. On a mesh, the inner objective
        is the same fused-Pallas sharded vg the host-loop path uses
        (``_mesh_pallas_vg_builder``) — the whole sharded IRLS solve then
        compiles to ONE SPMD program (the host loop pays ~25 ms of tunnel
        RPC per IRLS iteration for its batched readback; fused measured
        2.96x on short inner solves)."""
        if self.mesh is not None:
            make_vg, mesh_phase_io = self._mesh_pallas_vg_builder(
                opts, channels_per_split or self.num_channels
            )
            if make_vg is None:
                raise ValueError(
                    "fused_irls on this mesh needs a fused-Pallas-eligible "
                    "configuration (see the fallback warning above for the "
                    "reason); use the host-loop default for configurations "
                    "that fall back to the traced objective."
                )
            regs_mesh = tuple(self.regularizers)
            refining = getattr(opts, "refine_motion_every", 0) > 0
            refine_step = self._refine_step_fn(opts) if refining else None

            def fused_mesh(x0, observations, shifts):
                vg = make_vg(observations, shifts)
                converters = (
                    (vg.to_planes, vg.from_planes) if mesh_phase_io else None
                )
                if refining:
                    # Frame mesh (enforced in solve()): shifts are per-device
                    # runtime data of the sharded vg, so the refined set
                    # re-enters the same SPMD program each IRLS iteration.
                    return irls_solve_fused(
                        lambda w, s: make_vg(observations, s).prepare(w),
                        regs_mesh, x0, opts,
                        phase_converters=converters, return_iterations=True,
                        shifts0=shifts,
                        refiner=lambda x, s: refine_step(x, observations, s),
                    )
                return irls_solve_fused(
                    vg.prepare, regs_mesh, x0, opts,
                    phase_converters=converters, return_iterations=True,
                )

            return jax.jit(fused_mesh)
        regs = tuple(self.regularizers)
        kernel = self.blur_kernel
        scale = self.scale
        static_shifts = np.asarray(self.shifts)
        pallas_dynamic = (
            opts.use_pallas_data_term
            and opts.pallas_shift_bound > 0.0
            and opts.diff_mode == "analytic"
        )

        use_pallas_here = (
            opts.use_pallas_data_term and opts.diff_mode == "analytic"
        )
        phase_io = use_pallas_here and self._phase_io_ok(regs)

        refining = getattr(opts, "refine_motion_every", 0) > 0
        refine_step = self._refine_step_fn(opts) if refining else None

        def fused(x0, observations, shifts):
            def build_vg(s):
                return make_map_value_and_grad(
                    observations, s, kernel, scale, regs,
                    max_shift=self.max_shift, diff_mode=opts.diff_mode,
                    static_shifts=None if (
                        pallas_dynamic or opts.diff_mode != "analytic"
                        or not (opts.use_static_shifts or opts.use_pallas_data_term)
                    ) else static_shifts,
                    use_pallas=use_pallas_here,
                    pallas_tile=opts.pallas_tile,
                    pallas_shift_bound=opts.pallas_shift_bound if pallas_dynamic else 0.0,
                    pallas_channel_block=opts.pallas_channel_block,
                    phase_io=phase_io,
                )

            vg = build_vg(shifts)
            converters = (
                (vg.to_planes, vg.from_planes) if phase_io else None
            )
            if refining:
                return irls_solve_fused(
                    lambda w, s: build_vg(s).prepare(w),
                    regs, x0, opts, phase_converters=converters,
                    return_iterations=True, shifts0=shifts,
                    refiner=lambda x, s: refine_step(x, observations, s),
                )
            return irls_solve_fused(
                vg.prepare, regs, x0, opts, phase_converters=converters,
                return_iterations=True,
            )

        return jax.jit(fused)

    def _build_inner_solver(self, channels_per_split: int, opts):
        regs = tuple(self.regularizers)
        kernel = self.blur_kernel
        scale = self.scale
        max_shift = self.max_shift
        diff_mode = opts.diff_mode

        static_shifts = np.asarray(self.shifts)

        # Mesh solves: route through the fused-Pallas sharded objectives
        # (spatial tiled / frame-sharded / band-sharded) when the
        # configuration fits — the single-chip production kernel per shard,
        # explicit collectives (cost psum, halo ppermute rings). The helper
        # emits the fallback warning when it doesn't.
        if self.mesh is not None:
            make_vg, phase_io = self._mesh_pallas_vg_builder(
                opts, channels_per_split
            )
            if make_vg is not None:
                def inner_mesh(x0, observations, shifts, weights):
                    vg = make_vg(observations, shifts)
                    result = minimize(
                        vg.prepare(weights),
                        vg.to_planes(x0) if phase_io else x0,
                        method=opts.least_squares_solver,
                        max_iterations=opts.max_num_solver_iterations,
                        gradient_norm_threshold=opts.gradient_norm_threshold,
                        cost_decrease_threshold=opts.cost_decrease_threshold,
                        parameter_variation_threshold=opts.parameter_variation_threshold,
                        memory=opts.num_lbfgs_hessian_corrections,
                        linear_cg_refresh_every=opts.linear_cg_refresh_every,
                        log_iterations=self.verbose,
                    )
                    if phase_io:
                        result = result._replace(x=vg.from_planes(result.x))
                    return result

                return jax.jit(inner_mesh)

        # Spatial meshes that miss the fused path: the halo-exchange TRACED
        # tiled objective (parallel/halo.py) — explicit ppermute halo gather
        # + exact scatter-sum adjoint, one cost psum per evaluation. Falls
        # back to the GSPMD traced path when even that doesn't fit (3D TV,
        # >1 regularizer, non-divisible tiles, numerical diff).
        if self.mesh is not None and self._spatial_mesh and diff_mode == "analytic":
            from super_resolution_tpu.ops.btv import (
                BilateralTotalVariationRegularizer,
            )
            from super_resolution_tpu.ops.tv import TotalVariationRegularizer
            from super_resolution_tpu.parallel.halo import (
                make_tiled_map_value_and_grad,
            )
            from super_resolution_tpu.parallel.mesh import (
                COL_AXIS,
                ROW_AXIS,
            )

            axis_sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
            spatial_only = all(
                n == 1 or name in (ROW_AXIS, COL_AXIS)
                for name, n in axis_sizes.items()
            )
            regs_ok = len(regs) <= 1 and all(
                (
                    isinstance(r, TotalVariationRegularizer)
                    and not getattr(r, "use_3d", False)
                )
                or isinstance(r, BilateralTotalVariationRegularizer)
                for r, _ in regs
            )
            n_row = axis_sizes.get(ROW_AXIS, 1)
            n_col = axis_sizes.get(COL_AXIS, 1)
            _, h_hr, w_hr = self.hr_shape
            shapes_ok = (
                h_hr % n_row == 0
                and w_hr % n_col == 0
                and (h_hr // n_row) % scale == 0
                and (w_hr // n_col) % scale == 0
            )
            if not (spatial_only and regs_ok and shapes_ok):
                reasons = []
                if not spatial_only:
                    reasons.append(
                        "mesh mixes spatial (row/col) with frame/band axes"
                    )
                if not regs_ok:
                    reasons.append(
                        "regularizers not tileable (need exactly <=1 2D TV "
                        "or BTV term)"
                    )
                if not shapes_ok:
                    reasons.append(
                        f"HR shape {(h_hr, w_hr)} not divisible into "
                        f"{n_row}x{n_col} scale-aligned tiles"
                    )
                _warn_mesh_fallback("spatial halo-exchange", reasons)
            if spatial_only and regs_ok and shapes_ok:
                mesh = self.mesh
                image_shape = (h_hr, w_hr)

                def inner_spatial(x0, observations, shifts, weights):
                    vg = make_tiled_map_value_and_grad(
                        mesh, kernel, scale, max_shift=max_shift,
                        regularizers=regs, image_shape=image_shape,
                    )
                    w0 = weights[0] if weights else None
                    return minimize(
                        lambda x: vg(x, observations, shifts, w0),
                        x0,
                        method=opts.least_squares_solver,
                        max_iterations=opts.max_num_solver_iterations,
                        gradient_norm_threshold=opts.gradient_norm_threshold,
                        cost_decrease_threshold=opts.cost_decrease_threshold,
                        parameter_variation_threshold=opts.parameter_variation_threshold,
                        memory=opts.num_lbfgs_hessian_corrections,
                        linear_cg_refresh_every=opts.linear_cg_refresh_every,
                        log_iterations=self.verbose,
                    )

                return jax.jit(inner_spatial)

        # Shift-generic mode: shifts stay a traced argument of the jitted
        # inner solve, so re-solving with new motion (estimated registration,
        # video sliding windows) reuses ONE compiled executable.
        pallas_dynamic = (
            opts.use_pallas_data_term
            and opts.pallas_shift_bound > 0.0
            and diff_mode == "analytic"
            and self.mesh is None
        )
        use_pallas_here = (
            opts.use_pallas_data_term
            and diff_mode == "analytic"
            and self.mesh is None
        )
        phase_io = use_pallas_here and self._phase_io_ok(regs)

        def inner(x0, observations, shifts, weights):
            vg_full = make_map_value_and_grad(
                observations, shifts, kernel, scale, regs,
                max_shift=max_shift, diff_mode=diff_mode,
                static_shifts=static_shifts
                if diff_mode == "analytic"
                and (opts.use_static_shifts or opts.use_pallas_data_term)
                and self.mesh is None
                and not pallas_dynamic
                else None,
                use_pallas=use_pallas_here,
                pallas_tile=opts.pallas_tile,
                pallas_shift_bound=opts.pallas_shift_bound if pallas_dynamic else 0.0,
                pallas_channel_block=opts.pallas_channel_block,
                phase_io=phase_io,
            )
            # Phase-plane solver state: CG/line-search vector algebra is
            # permutation-invariant, so running the WHOLE inner solve on
            # polyphase planes (converting once at each boundary) is
            # numerically identical and skips two strided full-image
            # passes per objective evaluation.
            x_start = vg_full.to_planes(x0) if phase_io else x0
            result = minimize(
                vg_full.prepare(weights),
                x_start,
                method=opts.least_squares_solver,
                max_iterations=opts.max_num_solver_iterations,
                gradient_norm_threshold=opts.gradient_norm_threshold,
                cost_decrease_threshold=opts.cost_decrease_threshold,
                parameter_variation_threshold=opts.parameter_variation_threshold,
                memory=opts.num_lbfgs_hessian_corrections,
                linear_cg_refresh_every=opts.linear_cg_refresh_every,
                log_iterations=self.verbose,
            )
            if phase_io:
                result = result._replace(x=vg_full.from_planes(result.x))
            return result

        return jax.jit(inner)

    def _place_initial(self, x0):
        """Place the HR estimate (or IRLS state) on the mesh: band axis on
        channels, row/col axes on the spatial dims for spatial meshes;
        replicated over frame devices. No-op without a mesh."""
        if self.mesh is None:
            return x0
        from super_resolution_tpu.parallel.mesh import (
            BAND_AXIS,
            COL_AXIS,
            ROW_AXIS,
            named_sharding,
        )

        if self._spatial_mesh:
            sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
            row = ROW_AXIS if ROW_AXIS in self.mesh.axis_names else None
            col = COL_AXIS if COL_AXIS in self.mesh.axis_names else None
            band = (
                BAND_AXIS
                if BAND_AXIS in self.mesh.axis_names
                and x0.shape[0] % sizes[BAND_AXIS] == 0
                else None
            )
            return jax.device_put(x0, named_sharding(self.mesh, band, row, col))
        band = BAND_AXIS if BAND_AXIS in self.mesh.axis_names else None
        return jax.device_put(x0, named_sharding(self.mesh, band, None, None))

    @staticmethod
    def _phase_io_ok(regs) -> bool:
        """Phase-plane IO needs every objective term inside the fused kernel:
        zero regularizers, or exactly one fused TV/BTV term."""
        from super_resolution_tpu.ops.btv import BilateralTotalVariationRegularizer
        from super_resolution_tpu.ops.tv import TotalVariationRegularizer

        if not regs:
            return True
        if len(regs) != 1:
            return False
        reg, lam = regs[0]
        return lam > 0.0 and isinstance(
            reg, (TotalVariationRegularizer, BilateralTotalVariationRegularizer)
        )

    def _reweight_fn(self, regs):
        """One JITTED program for the IRLS reweight ``w = 1/max(1e-5, r(x))``.

        Computed eagerly, the residual chain is ~8 separate device dispatches
        per regularizer; through the remote tunnel each costs milliseconds of
        latency that lands inside the NEXT inner solve's wall time (measured
        ~30 ms of a 60 ms warm 50-iteration solve call — the jitted form is
        one dispatch). Cached per regularizer signature alongside the inner
        solvers; sharded ``x`` propagates its sharding through the jit."""
        key = ("reweight", _regs_signature(regs))
        fn = self._inner_cache.get(key)
        if fn is None:
            regs = tuple(regs)

            def reweight(x):
                return tuple(
                    1.0 / jnp.maximum(_MIN_RESIDUAL, reg.residuals(x))
                    for reg, _ in regs
                )

            fn = self._inner_cache[key] = jax.jit(reweight)
        return lambda x: fn(x)

    def _refine_step_fn(self, opts):
        """Pure Gauss-Newton refinement STEP ``(x, observations, shifts) ->
        (new_shifts, max|change|)`` with the kernel-bound clip fused in.
        Jittable and mesh-transparent: under GSPMD a frame-sharded
        observations/shifts pair shards the per-frame Gauss-Newton across
        the frame axis with x replicated — the same function serves the
        host-loop refiner, the fused-IRLS loop body, and frame meshes."""
        from super_resolution_tpu.motion.refinement import refine_shifts

        kern = self.blur_kernel
        bound = (
            float(opts.pallas_shift_bound)
            if opts.use_pallas_data_term and opts.pallas_shift_bound > 0.0
            else 0.0
        )
        scale = self.scale
        max_shift = self.max_shift
        gn_iters = opts.refine_motion_iterations

        def step(x, observations, shifts):
            refined = refine_shifts(
                x, observations, shifts, kern, scale,
                num_iterations=gn_iters, max_shift=max_shift,
            )
            if bound > 0.0:
                # The shift-generic kernel's margins are sized for
                # |shift| <= bound; refinement must not step outside the
                # compiled program's contract.
                refined = jnp.clip(refined, -bound, bound)
            return refined, jnp.max(jnp.abs(refined - shifts))

        return step

    def _shift_refiner(self, opts):
        """Jitted wrapper of :meth:`_refine_step_fn` for the host IRLS loop —
        one device dispatch per refinement round, the delta scalar riding
        the loop's existing batched ``device_get``. Cached MODULE-wide like
        the inner solvers (all arguments traced, so video sliding windows —
        a fresh solver per frame — reuse one jit wrapper)."""
        kern = self.blur_kernel
        bound = (
            float(opts.pallas_shift_bound)
            if opts.use_pallas_data_term and opts.pallas_shift_bound > 0.0
            else 0.0
        )
        key = (
            "refine", opts.refine_motion_iterations, self.scale,
            self.max_shift, bound,
            None if kern is None else (kern.shape, np.asarray(kern).tobytes()),
        )
        fn = self._inner_cache.get(key) or _BUILT_SOLVER_CACHE.get(key)
        if fn is None:
            fn = jax.jit(self._refine_step_fn(opts))
            _BUILT_SOLVER_CACHE[key] = fn
            while len(_BUILT_SOLVER_CACHE) > _BUILT_SOLVER_CACHE_MAX:
                _BUILT_SOLVER_CACHE.popitem(last=False)
        self._inner_cache[key] = fn
        return fn

    def _run_irls_loop(self, inner, x0, observations, opts,
                       checkpoint_path=None, resume=False):
        """IRLS outer loop with optional checkpoint/resume: the state saved at
        the iteration seam (x, IRLS weights, iteration counter, previous cost)
        is exactly what the reference's iteration-complete hook exposes —
        SURVEY.md §5 identifies it as the natural checkpoint point; the
        reference itself persists nothing."""
        import os

        regs = self.regularizers
        x0 = self._place_initial(x0)
        weights = tuple(jnp.ones_like(x0) for _ in regs)
        x = x0
        prev_cost = float("inf")
        iteration = 0
        refine_every = getattr(opts, "refine_motion_every", 0)
        refiner = self._shift_refiner(opts) if refine_every > 0 else None
        if resume and checkpoint_path and os.path.exists(checkpoint_path):
            state = np.load(checkpoint_path)
            x = jnp.asarray(state["x"])
            weights = tuple(
                jnp.asarray(state[f"weight_{i}"]) for i in range(len(regs))
            )
            if self.mesh is not None:
                # Restore the mesh placement (checkpoints are host arrays);
                # without this the resumed solve compiles a second executable
                # for the unsharded layout.
                placement = x0.sharding
                x = jax.device_put(x, placement)
                weights = tuple(jax.device_put(w, placement) for w in weights)
            prev_cost = float(state["prev_cost"])
            iteration = int(state["iteration"])
            if "shifts" in state:
                # Motion-refined solves checkpoint the evolving shifts too.
                self.shifts = jnp.asarray(state["shifts"])
                if self._shifts_placement is not None:
                    self.shifts = jax.device_put(
                        self.shifts, self._shifts_placement
                    )
            if self.verbose:
                print(f"Resumed IRLS from {checkpoint_path} at iteration {iteration}.")
        # inf until a refinement ROUND has actually run and converged: with
        # refine_motion_every > 1 the cost can stabilize before the first
        # refinement is due, and the loop must not break with the requested
        # refinement never executed.
        last_refine_delta = float("inf") if refiner is not None else 0.0
        while True:
            t_inner = time.perf_counter()
            result = inner(x, observations, self.shifts, weights)
            jax.block_until_ready(result.x)
            t_call = time.perf_counter() - t_inner
            # Motion refinement at the IRLS seam: Gauss-Newton on the data
            # term against the just-solved x, fed straight back into the
            # shift-generic inner solve (same executable — shifts are a
            # traced argument on this path by construction). Dispatched
            # BEFORE the batched readback so its delta scalar rides the one
            # device_get below instead of paying its own ~25 ms tunnel RPC.
            # Skip a refinement whose result could never be consumed: when
            # the iteration cap fires right after this iteration, no further
            # inner solve runs, so refining here would only make the reported
            # shifts disagree with the motion that produced the returned x
            # (and waste a Gauss-Newton dispatch).
            cap_next = (
                opts.max_num_irls_iterations > 0
                and iteration + 1 >= opts.max_num_irls_iterations
            )
            refined_now = (
                refiner is not None
                and (iteration + 1) % refine_every == 0
                and not cap_next
            )
            if refined_now:
                self.shifts, delta_dev = refiner(
                    result.x, observations, self.shifts
                )
                if self._shifts_placement is not None:
                    # Pin the refined shifts back to the frame-sharded
                    # placement the inner executable was compiled for (the
                    # refiner jit may return a GSPMD-inferred layout; a
                    # placement drift would compile a second executable).
                    self.shifts = jax.device_put(
                        self.shifts, self._shifts_placement
                    )
            # ONE batched device_get for every host-side scalar: through the
            # remote tunnel each separate scalar readback costs ~25 ms of
            # RPC latency (measured — comparable to the whole 50-iteration
            # warm solve), so float(cost); int(iterations); int(evals) as
            # separate fetches tripled the host-loop overhead.
            fetch = jax.device_get(
                (result.cost, result.iterations, result.num_evaluations)
                + ((delta_dev,) if refined_now else ())
            )
            cost_v, it_v, ev_v = fetch[:3]
            if refined_now:
                last_refine_delta = float(fetch[3])
                if self.verbose:
                    print(
                        f"Refined motion against the HR estimate "
                        f"(max shift change {last_refine_delta:.4g} HR px)."
                    )
            x, cost = result.x, float(cost_v)
            # Per-inner-call stats: call 0 includes the one-time jit trace +
            # compile(-cache load); later calls are steady-state device time
            # (the scalar readback above is loop bookkeeping, not solve time).
            self.last_inner_calls.append((t_call, int(it_v), int(ev_v)))
            self.last_inner_iterations += int(it_v)
            if not regs and refiner is None:
                if self.verbose:
                    print("Least squares done (no regularization terms to reweight).")
                break
            if regs:
                weights = self._reweight_fn(regs)(x)
            cost_difference = prev_cost - cost
            prev_cost = cost
            iteration += 1
            if self.verbose:
                print(
                    f"IRLS Iteration complete (#{iteration}). New loss is {cost} "
                    f"with a difference of {cost_difference}."
                )
            if checkpoint_path:
                payload = {"x": np.asarray(x), "prev_cost": prev_cost,
                           "iteration": iteration}
                if refiner is not None:
                    payload["shifts"] = np.asarray(self.shifts)
                for wi, warr in enumerate(weights):
                    payload[f"weight_{wi}"] = np.asarray(warr)
                np.savez(checkpoint_path, **payload)
            if (
                abs(cost_difference) < opts.irls_cost_difference_threshold
                and last_refine_delta
                < getattr(opts, "refine_motion_delta_threshold", 1e-4)
            ):
                # Converged — and the LAST-RUN refinement no longer moves
                # the motion (a refinement changes the objective, so cost
                # alone cannot certify joint convergence; inf until one has
                # run at all).
                break
            if (
                opts.max_num_irls_iterations > 0
                and iteration >= opts.max_num_irls_iterations
            ):
                break
        return x
