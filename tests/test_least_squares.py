"""Direct tests for the CG/L-BFGS minimizer (solvers/least_squares.py).

The minimizer is exercised indirectly by every solver test; these pin down
the standalone surface: both methods, the ALGLIB-style stopping rules, and
the initial-step heuristics (including the opt-in quadratic-interpolation
mode, N&W eq. before 3.60).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_resolution_tpu.solvers.least_squares import minimize


def _quadratic_problem(n=16, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n))
    h = a @ a.T + n * np.eye(n)  # well-conditioned SPD
    b = rng.normal(size=n)
    h = jnp.asarray(h)
    b = jnp.asarray(b)

    def f(x):
        return 0.5 * x @ h @ x - b @ x

    x_star = jnp.linalg.solve(h, b)
    return jax.value_and_grad(f), x_star


@pytest.mark.parametrize("method", ["cg", "lbfgs"])
@pytest.mark.parametrize("mode", ["scaled", "quadratic", "quadratic_min"])
def test_converges_to_quadratic_minimum(method, mode):
    if method == "lbfgs" and mode != "scaled":
        pytest.skip("initial_step_mode is a CG-only option (validated to raise)")
    vg, x_star = _quadratic_problem()
    result = minimize(
        vg,
        jnp.zeros_like(x_star),
        method=method,
        max_iterations=200,
        # The ALGLIB-style defaults (1e-6, scaled) stop at convergence-point
        # tolerance; pin the gradient rule for a tight solution here.
        gradient_norm_threshold=1e-8,
        cost_decrease_threshold=0.0,
        parameter_variation_threshold=0.0,
        initial_step_mode=mode,
    )
    np.testing.assert_allclose(np.asarray(result.x), np.asarray(x_star), atol=1e-5)
    assert bool(result.converged)
    assert int(result.num_evaluations) >= int(result.iterations) + 1


def test_rosenbrock_nonquadratic():
    def f(z):
        x, y = z[0], z[1]
        return (1.0 - x) ** 2 + 100.0 * (y - x * x) ** 2

    vg = jax.value_and_grad(f)
    result = minimize(vg, jnp.asarray([-1.2, 1.0]), method="lbfgs", max_iterations=500)
    np.testing.assert_allclose(np.asarray(result.x), [1.0, 1.0], atol=1e-4)


def test_stopping_rules():
    vg, x_star = _quadratic_problem()
    # Iteration cap respected exactly when thresholds are zeroed.
    r = minimize(
        vg,
        jnp.zeros_like(x_star),
        max_iterations=3,
        gradient_norm_threshold=0.0,
        cost_decrease_threshold=0.0,
        parameter_variation_threshold=0.0,
    )
    assert int(r.iterations) == 3
    # Loose gradient threshold stops early.
    r2 = minimize(vg, jnp.zeros_like(x_star), max_iterations=200,
                  gradient_norm_threshold=1e-2)
    assert bool(r2.converged)
    assert int(r2.iterations) < 200


def test_invalid_options_raise():
    vg, x_star = _quadratic_problem()
    x0 = jnp.zeros_like(x_star)
    with pytest.raises(ValueError, match="initial_step_mode"):
        minimize(vg, x0, initial_step_mode="quadradic")  # typo must not pass
    with pytest.raises(ValueError, match="CG only"):
        minimize(vg, x0, method="lbfgs", initial_step_mode="quadratic")
    with pytest.raises(ValueError, match="method"):
        minimize(vg, x0, method="newton")


def test_linear_cg_quadratic_exact_and_eval_count():
    """Exact-step CG on a true quadratic: converges to the solution with ONE
    evaluation per iteration (plus the initial one and periodic refreshes)."""
    vg, x_star = _quadratic_problem()
    result = minimize(
        vg,
        jnp.zeros_like(x_star),
        method="linear_cg",
        max_iterations=200,
        gradient_norm_threshold=1e-8,
        cost_decrease_threshold=0.0,
        parameter_variation_threshold=0.0,
        linear_cg_refresh_every=8,
    )
    np.testing.assert_allclose(np.asarray(result.x), np.asarray(x_star), atol=1e-6)
    assert bool(result.converged)
    it = int(result.iterations)
    ev = int(result.num_evaluations)
    # 1 initial + 1/iter + one refresh every 8 iterations.
    assert ev <= it + 1 + it // 8 + 1
    # CG on an SPD quadratic terminates in <= n steps (n = 16) + slack.
    assert it <= 20


def test_linear_cg_matches_wolfe_cg_on_quadratic():
    vg, x_star = _quadratic_problem(n=24, seed=3)
    kwargs = dict(
        max_iterations=300,
        gradient_norm_threshold=1e-9,
        cost_decrease_threshold=0.0,
        parameter_variation_threshold=0.0,
    )
    r_wolfe = minimize(vg, jnp.zeros_like(x_star), method="cg", **kwargs)
    r_lin = minimize(vg, jnp.zeros_like(x_star), method="linear_cg", **kwargs)
    np.testing.assert_allclose(
        np.asarray(r_lin.x), np.asarray(r_wolfe.x), atol=1e-6
    )
    # The whole point: strictly fewer objective evaluations.
    assert int(r_lin.num_evaluations) < int(r_wolfe.num_evaluations)


def test_linear_cg_piecewise_quadratic():
    """An IRLS-shaped piecewise-quadratic objective (quadratic + w*|Dx|^2-style
    abs cross terms): the refresh bounds the extrapolation model error and the
    method still lands on the reference-CG minimizer."""
    rng = np.random.default_rng(7)
    n = 12
    a = rng.normal(size=(n, n))
    h = jnp.asarray(a @ a.T + n * np.eye(n))
    b = jnp.asarray(rng.normal(size=n))
    d1 = jnp.asarray(np.diff(np.eye(n), axis=0))  # forward differences

    def f(x):
        r = jnp.abs(d1 @ x)
        # (|d_i| + |d_{i+1}|)^2-style coupling: piecewise quadratic, C^0 kinks.
        rsum = r[:-1] + r[1:]
        return 0.5 * x @ h @ x - b @ x + 0.05 * jnp.sum(rsum * rsum)

    vg = jax.value_and_grad(f)
    kwargs = dict(
        max_iterations=400,
        gradient_norm_threshold=1e-8,
        cost_decrease_threshold=0.0,
        parameter_variation_threshold=0.0,
    )
    r_wolfe = minimize(vg, jnp.zeros((n,)), method="cg", **kwargs)
    r_lin = minimize(
        vg, jnp.zeros((n,)), method="linear_cg",
        linear_cg_refresh_every=4, **kwargs
    )
    f_wolfe = float(r_wolfe.cost)
    f_lin = float(vg(r_lin.x)[0])  # true cost at linear_cg's answer
    # Convergence-point parity: the accept-trial refresh iterations are
    # individually suboptimal steps, so allow a hair of cost slack; the x
    # agreement below is the real check.
    assert f_lin <= f_wolfe + 1e-4 * max(1.0, abs(f_wolfe))
    # Nonsmooth kinks let both methods stall at slightly different points;
    # agreement to ~5e-4 with matching cost is convergence-point parity here.
    np.testing.assert_allclose(
        np.asarray(r_lin.x), np.asarray(r_wolfe.x), atol=5e-4
    )
