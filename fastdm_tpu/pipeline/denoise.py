"""Jitted denoise loops.

The reference's hot loop is a Python for-loop over diffusers scheduler steps
with a host sync per step (SURVEY.md §3.2). Here the full N-step generation is
ONE lax.scan inside ONE jit: scheduler math, the transformer, and the caching
decision all stay on device.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from fastdm_tpu.models.flux import (
    FluxConfig,
    flux_forward,
    flux_forward_cached,
)
from fastdm_tpu.pipeline.schedulers import FlowMatchEulerScheduler

Array = jax.Array


def make_flux_denoiser(
    cfg: FluxConfig,
    scheduler: FlowMatchEulerScheduler,
    num_steps: int,
    cache_cfg=None,
    guidance_scale: float = 3.5,
    start_step: int = 0,
):
    """Returns jitted run(params, latents, encoder, pooled, cos, sin) -> latents.

    latents: (B, S_img, in_channels) packed f32; conditioning already encoded.
    FLUX-dev is guidance-distilled: the scale enters via the guidance
    embedding, one forward per step (no CFG batch doubling).
    start_step > 0 supports img2img: the caller noises the encoded image to
    sigmas[start_step] and the loop runs the remaining steps (SDEdit).
    """
    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(params, latents, encoder, pooled, cos, sin):
        b = latents.shape[0]
        guidance = jnp.full((b,), guidance_scale, jnp.float32)

        if cache_cfg is not None and cache_cfg.enable_caching:
            from fastdm_tpu.caching.xcaching import cache_init_state

            hidden_shape = (b, latents.shape[1], cfg.inner_dim)
            if type(cache_cfg).__name__ == "TeaCacheConfig":
                probe_shape = hidden_shape
            else:
                probe_shape = hidden_shape
            state0 = cache_init_state(cache_cfg, hidden_shape, probe_shape)

            def body(carry, step):
                lat, st = carry
                t = jnp.broadcast_to(sigmas[step], (b,))
                out, st = flux_forward_cached(
                    params, cfg, cache_cfg, st, step, num_steps,
                    lat.astype(jnp.bfloat16), encoder, pooled, t, cos, sin,
                    guidance=guidance,
                )
                lat = scheduler.step(out, step, lat, sigmas)
                return (lat, st), None

            (latents, _), _ = jax.lax.scan(
                body, (latents, state0), jnp.arange(start_step, num_steps)
            )
        else:

            def body(lat, step):
                t = jnp.broadcast_to(sigmas[step], (b,))
                out = flux_forward(
                    params, cfg, lat.astype(jnp.bfloat16), encoder, pooled, t,
                    cos, sin, guidance=guidance,
                )
                lat = scheduler.step(out, step, lat, sigmas)
                return lat, None

            latents, _ = jax.lax.scan(body, latents, jnp.arange(start_step, num_steps))
        return latents

    return run


def make_flux_kontext_denoiser(
    cfg: FluxConfig,
    scheduler: FlowMatchEulerScheduler,
    num_steps: int,
    cache_cfg=None,
    guidance_scale: float = 2.5,
):
    """FLUX-Kontext editing loop: clean reference-image tokens are appended to
    the noised sequence every step (their rope ids carry axis0=1 so the model
    distinguishes them); only the noise part is denoised/output.

    run(params, latents (B,S,C), ref_tokens (B,S_ref,C), encoder, pooled,
    cos, sin) -> latents. cos/sin must cover txt + noise + ref ids."""
    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(params, latents, ref_tokens, encoder, pooled, cos, sin):
        b, s, _ = latents.shape
        guidance = jnp.full((b,), guidance_scale, jnp.float32)
        ref = ref_tokens.astype(jnp.bfloat16)

        def body(lat, step):
            t = jnp.broadcast_to(sigmas[step], (b,))
            inp = jnp.concatenate([lat.astype(jnp.bfloat16), ref], axis=1)
            out = flux_forward(
                params, cfg, inp, encoder, pooled, t, cos, sin, guidance=guidance
            )[:, :s]
            lat = scheduler.step(out, step, lat, sigmas)
            return lat, None

        latents, _ = jax.lax.scan(body, latents, jnp.arange(num_steps))
        return latents

    return run


def flux_pack_latents(x: Array) -> Array:
    """(B, C, H, W) latent -> (B, H/2*W/2, C*4) packed tokens (FLUX layout)."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def flux_unpack_latents(x: Array, height_tokens: int, width_tokens: int) -> Array:
    """(B, S, C*4) -> (B, C, H, W)."""
    b, s, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, height_tokens, width_tokens, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, height_tokens * 2, width_tokens * 2)
