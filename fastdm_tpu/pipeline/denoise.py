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
                # the cache counts steps RELATIVE to the loop start: the
                # reference reads scheduler.step_index, which restarts at 0
                # for img2img's truncated timestep list — with the absolute
                # step, TeaCache's step-0 forced compute would never fire
                # when start_step > 0 and the first rel-L1 (vs a zeroed
                # prev_probe) would poison the accumulator
                out, st = flux_forward_cached(
                    params, cfg, cache_cfg, st, step - start_step, num_steps,
                    lat.astype(jnp.bfloat16), encoder, pooled, t, cos, sin,
                    guidance=guidance,
                )
                lat = scheduler.step(out, step, lat, sigmas)
                return (lat, st), None

            (latents, state_f), _ = jax.lax.scan(
                body, (latents, state0), jnp.arange(start_step, num_steps)
            )
            return latents, state_f["skips"]
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
        return latents, jnp.zeros((), jnp.int32)

    return run


def expand_cn_samples(samples: Optional[Array], num_layers: int) -> Optional[Array]:
    """Expand (L_cn, B, S, D) ControlNet residuals to one per transformer layer
    with interval indexing (diffusers convention; ref flux.py:455-483:
    `samples[i // ceil(num_layers / len(samples))]`)."""
    if samples is None or num_layers == 0:
        return None
    interval = -(-num_layers // samples.shape[0])
    idx = jnp.arange(num_layers) // interval
    return samples[idx]


def make_flux_cn_denoiser(
    cfg: FluxConfig,
    cn_cfg,
    scheduler: FlowMatchEulerScheduler,
    num_steps: int,
    guidance_scale: float = 3.5,
    conditioning_scale: float = 1.0,
    control_mode: Optional[int] = None,
):
    """FLUX + ControlNet loop: the CN trunk runs every step on the current
    latents and its per-layer residuals are injected into the base model's
    block scan (ref: FastDMEngine flux_controlnet path, model_entry.py:471-472
    + diffusers FluxControlNetPipeline step structure).

    run(params, cn_params, latents (B,S,C), cn_cond (B,S,C packed hint),
    encoder, pooled, cos, sin) -> latents.

    For union checkpoints pass control_mode: the CN sees one extra mode token
    in its text stream, whose rope id is all-zero like every FLUX text id, so
    its cos/sin rows are a duplicate of row 0 prepended to the base ones."""
    from fastdm_tpu.models.controlnets import flux_controlnet_forward

    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(params, cn_params, latents, cn_cond, encoder, pooled, cos, sin):
        b = latents.shape[0]
        guidance = jnp.full((b,), guidance_scale, jnp.float32)
        cnd = cn_cond.astype(jnp.bfloat16)
        if control_mode is not None and "controlnet_mode_embedder" not in cn_params:
            raise ValueError(
                "control_mode was given but the ControlNet params have no "
                "controlnet_mode_embedder — not a union checkpoint"
            )
        if control_mode is not None:
            cn_cos = jnp.concatenate([cos[:1], cos], axis=0)
            cn_sin = jnp.concatenate([sin[:1], sin], axis=0)
        else:
            cn_cos, cn_sin = cos, sin

        def body(lat, step):
            t = jnp.broadcast_to(sigmas[step], (b,))
            h = lat.astype(jnp.bfloat16)
            bs, sbs = flux_controlnet_forward(
                cn_params, cn_cfg, h, cnd, encoder, pooled, t, cn_cos, cn_sin,
                guidance=guidance if cn_cfg.guidance_embeds else None,
                conditioning_scale=conditioning_scale, control_mode=control_mode,
            )
            out = flux_forward(
                params, cfg, h, encoder, pooled, t, cos, sin, guidance=guidance,
                controlnet_block_samples=expand_cn_samples(bs, cfg.num_layers),
                controlnet_single_block_samples=expand_cn_samples(
                    sbs, cfg.num_single_layers
                ),
            )
            lat = scheduler.step(out, step, lat, sigmas)
            return lat, None

        latents, _ = jax.lax.scan(body, latents, jnp.arange(num_steps))
        return latents, jnp.zeros((), jnp.int32)

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
        return latents, jnp.zeros((), jnp.int32)

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
