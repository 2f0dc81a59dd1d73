"""Diffusion schedulers in JAX.

The reference uses diffusers' schedulers on the host, syncing per step; here
schedules are precomputed host-side (numpy) and the *step function* is pure
JAX so the whole denoise loop jits into one program.

Implemented:
  * FlowMatchEulerScheduler — rectified-flow Euler (FLUX / SD3.5 / Qwen / Wan)
  * EulerDiscreteScheduler  — k-diffusion Euler for SDXL
  * DDIMScheduler           — deterministic DDIM (eta=0)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def flow_match_shift_mu(seq_len: int, base_len: int = 256, max_len: int = 4096,
                        base_shift: float = 0.5, max_shift: float = 1.15) -> float:
    """Resolution-dependent timestep shift for flow-matching DiTs (FLUX-style
    dynamic shifting: linear in sequence length)."""
    m = (max_shift - base_shift) / (max_len - base_len)
    b = base_shift - m * base_len
    return seq_len * m + b


@dataclasses.dataclass(frozen=True)
class FlowMatchEulerScheduler:
    """Rectified-flow Euler. State is just the precomputed sigma ladder.

    sigmas: (num_steps + 1,) descending, sigmas[-1] = 0. The model predicts
    velocity; x_{i+1} = x_i + (sigma_{i+1} - sigma_i) * v.
    """

    sigmas: np.ndarray  # host-side; moved on-device by the loop
    num_train_timesteps: int = 1000

    @classmethod
    def create(
        cls,
        num_steps: int,
        *,
        shift: float = 3.0,
        use_dynamic_shifting: bool = False,
        mu: Optional[float] = None,
        num_train_timesteps: int = 1000,
    ) -> "FlowMatchEulerScheduler":
        sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
        if use_dynamic_shifting:
            assert mu is not None, "dynamic shifting needs mu (flow_match_shift_mu)"
            sigmas = math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0))
        else:
            sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
        sigmas = np.append(sigmas, 0.0).astype(np.float32)
        return cls(sigmas=sigmas, num_train_timesteps=num_train_timesteps)

    @property
    def timesteps(self) -> np.ndarray:
        """Model-facing timesteps in [0, 1] (multiply by 1000 inside cores)."""
        return self.sigmas[:-1]

    def scale_noise(self, sample: Array, sigma, noise: Array) -> Array:
        """Forward process at sigma: x = (1-sigma) x0 + sigma eps."""
        return (1.0 - sigma) * sample + sigma * noise

    def step(self, model_output: Array, step_index: Array, sample: Array,
             sigmas_dev: Array) -> Array:
        """One Euler step; step_index may be traced (used inside lax.scan)."""
        sigma = sigmas_dev[step_index]
        sigma_next = sigmas_dev[step_index + 1]
        return sample + (sigma_next - sigma) * model_output.astype(jnp.float32)


def _betas_scaled_linear(num_train_timesteps, beta_start=0.00085, beta_end=0.012):
    return (
        np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
        ** 2
    )


@dataclasses.dataclass(frozen=True)
class EulerDiscreteScheduler:
    """k-diffusion Euler ancestral-free sampler (SDXL's default).

    Prediction type epsilon; leading timestep spacing, like diffusers' SDXL
    config. sigmas: (num_steps + 1,), descending, last 0.
    """

    sigmas: np.ndarray
    timesteps: np.ndarray  # (num_steps,) float32 train-timestep values
    init_noise_sigma: float

    @classmethod
    def create(cls, num_steps: int, num_train_timesteps: int = 1000,
               interpolation: str = "linear",
               steps_offset: int = 1) -> "EulerDiscreteScheduler":
        if interpolation != "linear":
            raise NotImplementedError(
                f"interpolation {interpolation!r}; only 'linear' (the SDXL "
                "config value) is implemented"
            )
        betas = _betas_scaled_linear(num_train_timesteps)
        alphas_cumprod = np.cumprod(1.0 - betas)
        full_sigmas = np.sqrt((1 - alphas_cumprod) / alphas_cumprod)
        # leading spacing: steps at floor(i * T/N) + steps_offset, reversed —
        # diffusers' SDXL EulerDiscrete config uses steps_offset=1, so the
        # ladder never evaluates the model at t=0
        step_ratio = num_train_timesteps // num_steps
        ts = ((np.arange(num_steps) * step_ratio).round()[::-1]
              + steps_offset).astype(np.float64)
        sigmas = np.interp(ts, np.arange(num_train_timesteps), full_sigmas)
        sigmas = np.append(sigmas, 0.0).astype(np.float32)
        return cls(
            sigmas=sigmas,
            timesteps=ts.astype(np.float32),
            init_noise_sigma=float(np.sqrt(sigmas[0] ** 2 + 1)),
        )

    def scale_model_input(self, sample: Array, step_index: Array, sigmas_dev: Array) -> Array:
        sigma = sigmas_dev[step_index]
        return sample / jnp.sqrt(sigma**2 + 1)

    def step(self, model_output: Array, step_index: Array, sample: Array,
             sigmas_dev: Array) -> Array:
        sigma = sigmas_dev[step_index]
        sigma_next = sigmas_dev[step_index + 1]
        # epsilon prediction -> denoised sample estimate
        pred_x0 = sample - sigma * model_output.astype(jnp.float32)
        derivative = (sample - pred_x0) / sigma
        return sample + derivative * (sigma_next - sigma)


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    """Deterministic DDIM (eta = 0), epsilon prediction."""

    timesteps: np.ndarray           # (num_steps,) int64 descending
    alphas_cumprod: np.ndarray      # (T,) float32
    final_alpha_cumprod: float

    @classmethod
    def create(cls, num_steps: int, num_train_timesteps: int = 1000,
               steps_offset: int = 1) -> "DDIMScheduler":
        betas = _betas_scaled_linear(num_train_timesteps)
        ac = np.cumprod(1.0 - betas).astype(np.float32)
        # leading spacing + steps_offset=1 (the diffusers SD DDIM config)
        step_ratio = num_train_timesteps // num_steps
        ts = ((np.arange(num_steps) * step_ratio).round()[::-1]
              + steps_offset).astype(np.int64)
        # set_alpha_to_one=True (diffusers SD default): the final step denoises
        # all the way to the clean sample
        return cls(timesteps=ts, alphas_cumprod=ac, final_alpha_cumprod=1.0)

    def step(self, model_output: Array, timestep: Array, prev_timestep: Array,
             sample: Array, alphas_dev: Array) -> Array:
        at = alphas_dev[timestep]
        at_prev = jnp.where(
            prev_timestep >= 0, alphas_dev[jnp.maximum(prev_timestep, 0)],
            jnp.float32(self.final_alpha_cumprod),
        )
        eps = model_output.astype(jnp.float32)
        x0 = (sample - jnp.sqrt(1 - at) * eps) / jnp.sqrt(at)
        return jnp.sqrt(at_prev) * x0 + jnp.sqrt(1 - at_prev) * eps
