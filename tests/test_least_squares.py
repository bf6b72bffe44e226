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
