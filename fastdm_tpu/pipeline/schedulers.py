"""Diffusion schedulers in JAX.

The reference uses diffusers' schedulers on the host, syncing per step; here
schedules are precomputed host-side (numpy) and the *step function* is pure
JAX so the whole denoise loop jits into one program.

Implemented:
  * FlowMatchEulerScheduler — rectified-flow Euler (FLUX / SD3.5 / Qwen / Wan)
  * EulerDiscreteScheduler  — k-diffusion Euler for SDXL
  * DDIMScheduler           — deterministic DDIM (eta=0)
  * UniPCMultistepScheduler — order-2 predictor-corrector with flow sigmas,
    the Wan default (the reference free-rides diffusers' WanPipeline whose
    default solver is UniPC — ref: fastdm/model_entry.py:605-627; SURVEY §1
    "must own that outer loop"). Stateful: history threads through the scan
    carry via init_state()/step(..., state).
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
class UniPCMultistepScheduler:
    """UniPC multistep (Zhao et al. 2023) — data-prediction (predict_x0) form
    with the B(h)=expm1(h) "bh2" variant and flow-matching sigmas, i.e. the
    configuration diffusers' WanPipeline ships as its default scheduler
    (UniPCMultistepScheduler(prediction_type="flow_prediction",
    use_flow_sigmas=True, flow_shift=shift), solver_order=2,
    lower_order_final=True). The reference rides that pipeline for its
    scheduler stepping (ref: fastdm/model_entry.py:605-627).

    Flow parameterisation: alpha_t = 1 - sigma, sigma_t = sigma,
    lambda = log(alpha) - log(sigma). The model predicts velocity;
    x0 = sample - sigma * v converts to the data prediction UniPC integrates.

    Stateful multistep: the scan carry holds {m0, m1, last_sample} (the last
    two x0 predictions and the pre-predictor sample). Order ramps 1 -> 2 over
    the first steps and drops back to 1 on the final step (lower_order_final),
    expressed as jnp.where selects over both branches so the whole loop stays
    one traced program — no host sync per step.
    """

    sigmas: np.ndarray  # (num_steps + 1,) descending, sigmas[-1] = 0
    num_train_timesteps: int = 1000
    solver_order: int = 2

    @classmethod
    def create(
        cls,
        num_steps: int,
        *,
        shift: float = 5.0,
        solver_order: int = 2,
        num_train_timesteps: int = 1000,
    ) -> "UniPCMultistepScheduler":
        assert solver_order == 2, "only the (default) order-2 solver is built"
        # diffusers UniPC use_flow_sigmas ladder: alphas linspace(1, 1/T, N+1),
        # sigma = 1 - alpha, shift-warped, flipped to descending, last dropped
        alphas = np.linspace(1.0, 1.0 / num_train_timesteps, num_steps + 1,
                             dtype=np.float64)
        s = 1.0 - alphas
        s = np.flip(shift * s / (1.0 + (shift - 1.0) * s))[:-1]
        sigmas = np.append(s, 0.0).astype(np.float32)
        return cls(sigmas=sigmas, num_train_timesteps=num_train_timesteps,
                   solver_order=solver_order)

    @property
    def timesteps(self) -> np.ndarray:
        """Model-facing timesteps in [0, 1] (cores multiply by 1000)."""
        return self.sigmas[:-1]

    def scale_noise(self, sample: Array, sigma, noise: Array) -> Array:
        return (1.0 - sigma) * sample + sigma * noise

    def init_state(self, shape) -> dict:
        z = jnp.zeros(shape, jnp.float32)
        return {"m0": z, "m1": z, "last_sample": z}

    @staticmethod
    def _lambda(sigma):
        # flow: alpha = 1 - sigma; clamp keeps the (unselected) order-2
        # branches finite at sigma -> 0 / 1 so no inf*0 NaNs leak into where()
        s = jnp.clip(sigma, 1e-9, 1.0 - 1e-9)
        return jnp.log1p(-s) - jnp.log(s)

    def step(self, model_output: Array, step_index: Array, sample: Array,
             sigmas_dev: Array, state: dict, num_steps: int
             ) -> Tuple[Array, dict]:
        """One UniPC-p(+c) update. model_output is the velocity prediction at
        (sample, sigma_i); num_steps is the static ladder length (order
        schedule: predictor order 2 on steps [1, N-2], corrector order 2 from
        step 2 — diffusers' lower_order_nums ramp + lower_order_final)."""
        i = step_index
        x = sample.astype(jnp.float32)
        sig_i = sigmas_dev[i]
        sig_next = sigmas_dev[i + 1]
        # history points (dynamic_slice clamps negative traced indices; the
        # clamped garbage only feeds branches where() discards)
        sig_im1 = sigmas_dev[jnp.maximum(i - 1, 0)]
        sig_im2 = sigmas_dev[jnp.maximum(i - 2, 0)]

        m0_prev, m1_prev, last_sample = state["m0"], state["m1"], state["last_sample"]
        # convert: flow velocity -> x0 prediction at the current point
        model_t = x - sig_i * model_output.astype(jnp.float32)

        # ---------- corrector (uni_c) on the CURRENT sample ----------
        # integrates s0 = step i-1 -> t = step i using m0 (x0 pred at i-1)
        # plus D1_t = model_t - m0; order 2 adds m1 (x0 pred at i-2)
        lam_t_c = self._lambda(sig_i)
        lam_s0_c = self._lambda(sig_im1)
        h_c = lam_t_c - lam_s0_c
        hh_c = -h_c
        h_phi_1_c = jnp.expm1(hh_c)
        alpha_t_c = 1.0 - sig_i
        x_t_c = (sig_i / jnp.maximum(sig_im1, 1e-9)) * last_sample \
            - alpha_t_c * h_phi_1_c * m0_prev
        B_h_c = h_phi_1_c  # bh2
        b1_c = (h_phi_1_c / hh_c - 1.0) / B_h_c
        b2_c = ((h_phi_1_c / hh_c - 1.0) / hh_c - 0.5) * 2.0 / B_h_c
        D1_t = model_t - m0_prev
        # order 1: rhos_c = [0.5]
        corr1 = x_t_c - alpha_t_c * B_h_c * (0.5 * D1_t)
        # order 2: rks = [r1, 1], solve [[1,1],[r1,1]] rho = [b1, b2]
        r1_c = (self._lambda(sig_im2) - lam_s0_c) / h_c
        D1_1_c = (m1_prev - m0_prev) / jnp.where(jnp.abs(r1_c) < 1e-12, 1.0, r1_c)
        rho1_c = (b1_c - b2_c) / jnp.where(jnp.abs(1.0 - r1_c) < 1e-12, 1.0, 1.0 - r1_c)
        rho2_c = b1_c - rho1_c
        corr2 = x_t_c - alpha_t_c * B_h_c * (rho1_c * D1_1_c + rho2_c * D1_t)
        # corrector order = predictor order of step i-1 = 1 at i==1, 2 at i>=2
        corrected = jnp.where(i >= 2, corr2, corr1)
        x = jnp.where(i >= 1, corrected, x)

        # ---------- predictor (uni_p) from the corrected sample ----------
        # integrates s0 = step i -> t = step i+1 using m0 = model_t; order 2
        # adds m1 = x0 pred at step i-1
        lam_t = self._lambda(sig_next)
        lam_s0 = self._lambda(sig_i)
        h = lam_t - lam_s0
        hh = -h
        # exact endpoint: at sig_next == 0, expm1(-inf) = -1 and sig_next/sig_i
        # = 0, so order-1 returns model_t exactly; _lambda's clamp approximates
        # this to ~1e-9 relative — keep the exact form via the true sigma
        h_phi_1 = jnp.where(sig_next <= 0.0, -1.0, jnp.expm1(hh))
        alpha_t = 1.0 - sig_next
        x_t_ = (sig_next / jnp.maximum(sig_i, 1e-9)) * x \
            - alpha_t * h_phi_1 * model_t
        pred1 = x_t_
        r1 = (self._lambda(sig_im1) - lam_s0) / jnp.where(jnp.abs(h) < 1e-12, 1.0, h)
        D1_1 = (m0_prev - model_t) / jnp.where(jnp.abs(r1) < 1e-12, 1.0, r1)
        B_h = h_phi_1  # bh2
        pred2 = x_t_ - alpha_t * B_h * (0.5 * D1_1)  # rhos_p = [0.5] at order 2
        order2_p = (i >= 1) & (i <= num_steps - 2)
        prev_sample = jnp.where(order2_p, pred2, pred1)

        new_state = {"m0": model_t, "m1": m0_prev, "last_sample": x}
        return prev_sample, new_state


def scheduler_init_state(scheduler, shape):
    """Uniform state hook: stateful schedulers (UniPC) return a carry pytree,
    stateless ones return () so scan carries stay uniform."""
    if hasattr(scheduler, "init_state"):
        return scheduler.init_state(shape)
    return ()


def scheduler_step(scheduler, model_output, step_index, sample, sigmas_dev,
                   state, num_steps):
    """Dispatch step for stateless (Euler family) vs stateful (UniPC)
    schedulers; returns (prev_sample, new_state) either way."""
    if hasattr(scheduler, "init_state"):
        return scheduler.step(model_output, step_index, sample, sigmas_dev,
                              state, num_steps)
    return scheduler.step(model_output, step_index, sample, sigmas_dev), state


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
