"""Driver-hook regression tests for __graft_entry__.py.

The driver (a) compile-checks ``entry()`` single-chip and (b) executes
``dryrun_multichip(N)`` to validate the multi-device sharding path. Both must
work without a reachable TPU: the environment's sitecustomize registers the
tunneled axon backend in every interpreter, and a slow/hung tunnel once made
``dryrun_multichip`` block inside backend initialization before its CPU
fallback could run. The dryrun therefore must never touch the default backend
— it forces virtual CPU devices up front — which these tests pin down.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_returns_jittable_step():
    import jax

    sys.path.insert(0, REPO)
    try:
        from __graft_entry__ import entry
    finally:
        sys.path.remove(REPO)

    fn, args = entry()
    # Lowering traces the whole fused objective; abstract eval only (fast,
    # backend-independent) — the driver compiles it on the real chip.
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None
    cost, grad = jax.eval_shape(fn, *args)
    assert cost.shape == ()
    assert grad.shape == args[0].shape


@pytest.mark.parametrize("n_devices", [2])
def test_dryrun_multichip_never_touches_default_backend(n_devices):
    # Subprocess: dryrun_multichip clears and re-initializes JAX backends,
    # which must not leak into this test process. JAX_PLATFORMS is pinned to
    # the production value (axon) explicitly — conftest.py already mutated
    # os.environ to "cpu" at import, so inheriting the environment would NOT
    # exercise the regression this test documents: with axon selected, any
    # default-backend touch before the dryrun's CPU switch would block on the
    # TPU tunnel handshake and trip the 240s timeout.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env.pop("XLA_FLAGS", None)  # conftest's 8-device flag; dryrun sets its own
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip; "
            f"dryrun_multichip({n_devices}); print('DRYRUN_OK')",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DRYRUN_OK" in proc.stdout
