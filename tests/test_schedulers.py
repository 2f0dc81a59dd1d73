"""Scheduler math sanity tests (owned schedulers, SURVEY.md §7 pipeline note)."""

import jax.numpy as jnp
import numpy as np

from fastdm_tpu.pipeline.schedulers import (
    DDIMScheduler,
    EulerDiscreteScheduler,
    FlowMatchEulerScheduler,
    flow_match_shift_mu,
)


def test_flow_match_sigmas_monotone():
    s = FlowMatchEulerScheduler.create(25, shift=3.0)
    assert s.sigmas.shape == (26,)
    assert s.sigmas[0] > s.sigmas[-2] > s.sigmas[-1] == 0.0
    assert np.all(np.diff(s.sigmas) < 0)


def test_flow_match_dynamic_shift():
    mu = flow_match_shift_mu(4096)
    s = FlowMatchEulerScheduler.create(25, use_dynamic_shifting=True, mu=mu)
    assert abs(s.sigmas[0] - 1.0) < 1e-6
    assert np.all(np.diff(s.sigmas) < 0)


def test_flow_match_euler_integrates_linear_path():
    """With the true constant velocity v = noise - x0, Euler recovers x0 from
    x_T = noise exactly (rectified flow is linear)."""
    steps = 7
    s = FlowMatchEulerScheduler.create(steps, shift=1.0)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 8)).astype(np.float32)
    noise = rng.standard_normal((2, 8)).astype(np.float32)
    sig = jnp.asarray(s.sigmas)
    x = jnp.asarray(s.scale_noise(jnp.asarray(x0), s.sigmas[0], jnp.asarray(noise)))
    v = jnp.asarray(noise - x0)  # model-predicted velocity
    for i in range(steps):
        x = s.step(v, jnp.int32(i), x, sig)
    np.testing.assert_allclose(np.asarray(x), x0, atol=1e-5)


def test_euler_discrete_denoises_toward_x0():
    """With the true epsilon, one Euler step from sigma_max reproduces the
    k-diffusion update exactly."""
    steps = 10
    s = EulerDiscreteScheduler.create(steps)
    # leading spacing puts the first step at t=900 -> sigma ~ 8.3
    assert 5 < s.sigmas[0] < 20
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((4,)).astype(np.float32)
    eps = rng.standard_normal((4,)).astype(np.float32)
    sig = jnp.asarray(s.sigmas)
    x = jnp.asarray(x0 + s.sigmas[0] * eps)
    for i in range(steps):
        x = s.step(jnp.asarray(eps), jnp.int32(i), x, sig)
    np.testing.assert_allclose(np.asarray(x), x0, rtol=1e-4, atol=1e-4)


def test_ddim_deterministic_roundtrip():
    steps = 10
    s = DDIMScheduler.create(steps)
    ac = jnp.asarray(s.alphas_cumprod)
    rng = np.random.default_rng(2)
    x0 = rng.standard_normal((4,)).astype(np.float32)
    eps = rng.standard_normal((4,)).astype(np.float32)
    t0 = int(s.timesteps[0])
    x = jnp.asarray(np.sqrt(s.alphas_cumprod[t0]) * x0 + np.sqrt(1 - s.alphas_cumprod[t0]) * eps)
    ts = list(s.timesteps) + [-1]
    for i in range(steps):
        x = s.step(jnp.asarray(eps), jnp.int32(ts[i]), jnp.int32(ts[i + 1]), x, ac)
    np.testing.assert_allclose(np.asarray(x), x0, rtol=1e-4, atol=1e-4)
