"""UniPC scheduler golden tests: the JAX scan implementation vs the numpy
oracle (tests/unipc_oracle.py — a port of diffusers' UniPCMultistepScheduler
control flow), plus an analytic convergence check on the exact rectified-flow
ODE where the true endpoint is known."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastdm_tpu.pipeline.schedulers import (
    FlowMatchEulerScheduler,
    UniPCMultistepScheduler,
    scheduler_init_state,
    scheduler_step,
)
from tests.unipc_oracle import UniPCOracle, flow_unipc_sigmas


def _toy_velocity(x, sigma, a, c):
    # affine field: nontrivial but deterministic trajectory
    return a * x + c * sigma


@pytest.mark.parametrize("num_steps", [2, 3, 5, 8, 50])
def test_unipc_matches_oracle(num_steps):
    rng = np.random.default_rng(0)
    shape = (2, 4, 3, 8, 8)
    x0 = rng.standard_normal(shape).astype(np.float64)
    a = rng.uniform(-0.8, 0.8, shape)
    c = rng.standard_normal(shape)

    sch = UniPCMultistepScheduler.create(num_steps, shift=5.0)
    np.testing.assert_allclose(
        sch.sigmas[:-1], flow_unipc_sigmas(num_steps)[:-1], rtol=1e-6,
        err_msg="sigma ladder mismatch vs oracle")

    # oracle trajectory (float64 numpy)
    oracle = UniPCOracle(num_steps, shift=5.0)
    x = x0.copy()
    for i in range(num_steps):
        v = _toy_velocity(x, oracle.sigmas[i], a, c)
        x = oracle.step(v, x)
    ref = x

    # JAX scan trajectory
    sigmas_dev = jnp.asarray(sch.sigmas, jnp.float32)
    aj, cj = jnp.asarray(a, jnp.float32), jnp.asarray(c, jnp.float32)

    def body(carry, i):
        lat, st = carry
        v = _toy_velocity(lat, sigmas_dev[i], aj, cj)
        lat, st = scheduler_step(sch, v, i, lat, sigmas_dev, st, num_steps)
        return (lat, st), None

    st0 = scheduler_init_state(sch, shape)
    (got, _), _ = jax.jit(
        lambda lat: jax.lax.scan(body, (lat, st0), jnp.arange(num_steps))
    )(jnp.asarray(x0, jnp.float32))

    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_unipc_convergence_beats_euler():
    """ODE dx/dsigma = 2x/(1+sigma) has solution x = C (1+sigma)^2 — curved in
    sigma, so Euler carries O(h) global error while order-2 UniPC must land
    much closer. (Fields with sigma-linear solutions are Euler-exact and test
    nothing.) Exact endpoint: x(0) = x(sigma0)/(1+sigma0)^2."""
    rng = np.random.default_rng(1)
    shape = (3, 16)
    x_start = rng.standard_normal(shape).astype(np.float32) + 3.0

    def run(sch):
        n = len(sch.sigmas) - 1
        sigmas_dev = jnp.asarray(sch.sigmas, jnp.float32)
        exact = x_start / (1.0 + sch.sigmas[0]) ** 2

        def body(carry, i):
            lat, st = carry
            v = 2.0 * lat / (1.0 + sigmas_dev[i])
            lat, st = scheduler_step(sch, v, i, lat, sigmas_dev, st, n)
            return (lat, st), None

        st = scheduler_init_state(sch, shape)
        (out, _), _ = jax.lax.scan(body, (jnp.asarray(x_start), st),
                                   jnp.arange(n))
        return float(jnp.max(jnp.abs(out - exact)))

    err_u10 = run(UniPCMultistepScheduler.create(10, shift=5.0))
    err_u20 = run(UniPCMultistepScheduler.create(20, shift=5.0))
    err_e10 = run(FlowMatchEulerScheduler.create(10, shift=5.0))
    err_e20 = run(FlowMatchEulerScheduler.create(20, shift=5.0))
    # UniPC beats Euler at equal step count...
    assert err_u10 < err_e10 and err_u20 < err_e20, (err_u10, err_e10, err_u20, err_e20)
    # ...and converges at higher order: halving h cuts Euler's error ~2x but
    # UniPC's by >3x (the order-1 first step keeps it below a clean 4x)
    assert err_e10 / err_e20 < 2.5, (err_e10, err_e20)
    assert err_u10 / err_u20 > 3.0, (err_u10, err_u20)


def test_unipc_state_is_scan_carry_compatible():
    sch = UniPCMultistepScheduler.create(4)
    st = scheduler_init_state(sch, (1, 2, 2))
    leaves = jax.tree_util.tree_leaves(st)
    assert len(leaves) == 3 and all(l.shape == (1, 2, 2) for l in leaves)
    # stateless schedulers carry an empty pytree
    assert scheduler_init_state(FlowMatchEulerScheduler.create(4), (1,)) == ()
