"""Denoise loops for SD3.5, SDXL, Qwen-Image and Wan.

Same design as the FLUX loop (pipeline/denoise.py): the full N-step generation
is one lax.scan under one jit, with classifier-free guidance folded in:
  * SD3.5 / SDXL: batched CFG — [neg; pos] run as one doubled batch per step
    (one forward, MXU-friendly), then recombined.
  * Qwen / Wan: true CFG with two forwards per step and dual cache streams
    (ref 'negtive_cache': fastdm/caching/xcaching.py:66-76) — wired when the
    cache is enabled.
  * Wan2.2-A14B: two experts switched by a sigma boundary via lax.cond
    (ref temporal switching: fastdm/model_entry.py:673-690).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from fastdm_tpu.models.qwenimage import QwenImageConfig, qwen_forward
from fastdm_tpu.models.sd35 import SD3Config, sd3_forward
from fastdm_tpu.models.sdxl import SDXLConfig, sdxl_forward
from fastdm_tpu.models.wan import WanConfig, wan_forward
from fastdm_tpu.pipeline.schedulers import (
    EulerDiscreteScheduler,
    FlowMatchEulerScheduler,
    scheduler_init_state,
    scheduler_step,
)

Array = jax.Array


def _is_teacache(cache_cfg) -> bool:
    """isinstance, not __name__ string compare — subclasses/wrappers of
    TeaCacheConfig must still get the TeaCache text-stream probe shape."""
    from fastdm_tpu.caching.config import TeaCacheConfig

    return isinstance(cache_cfg, TeaCacheConfig)


def make_sd3_denoiser(
    cfg: SD3Config,
    scheduler: FlowMatchEulerScheduler,
    num_steps: int,
    guidance_scale: float = 7.0,
    cache_cfg=None,
    start_step: int = 0,
):
    """run(params, latents (B,C,H,W), embeds (2B,S,D) [neg;pos], pooled (2B,P),
    pos_embed) -> latents. Timestep units: sigma * 1000 (SD3 convention).
    Batched CFG shares ONE cache state (the reference's sd35 configs set
    negtive_cache=false — the doubled batch goes through one forward).
    start_step > 0: SDEdit img2img — the caller seeds latents at
    sigmas[start_step] and the loop runs the remaining steps."""
    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)
    do_cfg = guidance_scale > 1.0
    use_cache = cache_cfg is not None and cache_cfg.enable_caching

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(params, latents, prompt_embeds, pooled, pos_embed):
        b = latents.shape[0]
        bb = prompt_embeds.shape[0]

        if use_cache:
            from fastdm_tpu.caching.xcaching import cache_init_state
            from fastdm_tpu.models.sd35 import sd3_forward_cached

            p = cfg.patch_size
            n_tok = (latents.shape[2] // p) * (latents.shape[3] // p)
            hshape = (bb, n_tok, cfg.inner_dim)
            state0 = cache_init_state(cache_cfg, hshape, hshape)

            def body(carry, step):
                lat, st = carry
                t = jnp.broadcast_to(sigmas[step] * 1000.0, (bb,))
                inp = jnp.concatenate([lat, lat]) if do_cfg else lat
                out, st = sd3_forward_cached(
                    params, cfg, cache_cfg, st, step, num_steps,
                    inp.astype(jnp.bfloat16), prompt_embeds, pooled, t, pos_embed,
                )
                out = out.astype(jnp.float32)
                if do_cfg:
                    neg, pos = out[:b], out[b:]
                    out = neg + guidance_scale * (pos - neg)
                lat = scheduler.step(out, step, lat, sigmas)
                return (lat, st), None

            (latents_out, st_f), _ = jax.lax.scan(
                body, (latents, state0), jnp.arange(start_step, num_steps)
            )
            return latents_out, st_f["skips"]

        def body(lat, step):
            t = jnp.broadcast_to(sigmas[step] * 1000.0, (bb,))
            inp = jnp.concatenate([lat, lat]) if do_cfg else lat
            out = sd3_forward(
                params, cfg, inp.astype(jnp.bfloat16), prompt_embeds, pooled, t, pos_embed
            ).astype(jnp.float32)
            if do_cfg:
                neg, pos = out[:b], out[b:]
                out = neg + guidance_scale * (pos - neg)
            lat = scheduler.step(out, step, lat, sigmas)
            return lat, None

        latents, _ = jax.lax.scan(
            body, latents, jnp.arange(start_step, num_steps))
        return latents, jnp.zeros((), jnp.int32)

    return run


def make_sdxl_denoiser(
    cfg: SDXLConfig,
    scheduler: EulerDiscreteScheduler,
    num_steps: int,
    guidance_scale: float = 5.0,
    start_step: int = 0,
):
    """run(params, latents (B,4,H,W), embeds (2B,77,2048), pooled (2B,1280),
    time_ids (2B,6)) -> latents. Epsilon-prediction Euler. start_step > 0:
    SDEdit img2img — caller seeds latents as z_image + noise*sigmas[start]."""
    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)
    timesteps = jnp.asarray(scheduler.timesteps, jnp.float32)
    do_cfg = guidance_scale > 1.0

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(params, latents, prompt_embeds, pooled, time_ids, ip_embeds=None):
        b = latents.shape[0]

        def body(lat, step):
            t = jnp.broadcast_to(timesteps[step], (prompt_embeds.shape[0],))
            inp = scheduler.scale_model_input(lat, step, sigmas)
            inp = jnp.concatenate([inp, inp]) if do_cfg else inp
            out = sdxl_forward(
                params, cfg, inp.astype(jnp.bfloat16), t, prompt_embeds, pooled,
                time_ids, ip_embeds=ip_embeds,
            ).astype(jnp.float32)
            if do_cfg:
                neg, pos = out[:b], out[b:]
                out = neg + guidance_scale * (pos - neg)
            lat = scheduler.step(out, step, lat, sigmas)
            return lat, None

        latents, _ = jax.lax.scan(
            body, latents, jnp.arange(start_step, num_steps))
        return latents, jnp.zeros((), jnp.int32)

    return run


def make_sdxl_cn_denoiser(
    cfg: SDXLConfig,
    scheduler: EulerDiscreteScheduler,
    num_steps: int,
    guidance_scale: float = 5.0,
    conditioning_scale: float = 1.0,
    guess_mode: bool = False,
):
    """SDXL + ControlNet loop (ref: SDXLControlnetModelWrapper,
    model_entry.py:289-363 + diffusers SDXL-CN pipeline step structure).

    run(params, cn_params, latents (B,4,H,W), embeds (2B,..), pooled (2B,..),
    time_ids (2B,6), cn_cond (B,8H,8W,3 NHWC in [0,1])) -> latents.

    guess_mode: the CN runs on the cond half only with logspace-scaled
    residuals; the uncond half gets zero residuals (diffusers convention).
    """
    from fastdm_tpu.models.controlnets import sdxl_controlnet_forward

    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)
    timesteps = jnp.asarray(scheduler.timesteps, jnp.float32)
    do_cfg = guidance_scale > 1.0

    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(params, cn_params, latents, prompt_embeds, pooled, time_ids, cn_cond):
        b = latents.shape[0]
        cnd = cn_cond.astype(jnp.bfloat16)
        cn_batch = 1 if (guess_mode or not do_cfg) else 2
        cn_cnd = jnp.concatenate([cnd] * cn_batch) if cn_batch > 1 else cnd
        # cond-half conditioning slices (uncond first, diffusers order)
        sl = slice(b, None) if (do_cfg and guess_mode) else slice(None)

        def body(lat, step):
            t_full = jnp.broadcast_to(timesteps[step], (prompt_embeds.shape[0],))
            inp = scheduler.scale_model_input(lat, step, sigmas)
            cn_inp = jnp.concatenate([inp] * cn_batch) if cn_batch > 1 else inp
            down, mid = sdxl_controlnet_forward(
                cn_params, cfg, cn_inp.astype(jnp.bfloat16), t_full[sl],
                prompt_embeds[sl], pooled[sl], time_ids[sl], cn_cnd,
                conditioning_scale=conditioning_scale, guess_mode=guess_mode,
            )
            if do_cfg and guess_mode:
                # zero residuals for the uncond half
                down = [jnp.concatenate([jnp.zeros_like(d), d]) for d in down]
                mid = jnp.concatenate([jnp.zeros_like(mid), mid])
            inp = jnp.concatenate([inp, inp]) if do_cfg else inp
            out = sdxl_forward(
                params, cfg, inp.astype(jnp.bfloat16), t_full, prompt_embeds,
                pooled, time_ids,
                down_block_additional_residuals=down,
                mid_block_additional_residual=mid,
            ).astype(jnp.float32)
            if do_cfg:
                neg, pos = out[:b], out[b:]
                out = neg + guidance_scale * (pos - neg)
            lat = scheduler.step(out, step, lat, sigmas)
            return lat, None

        latents, _ = jax.lax.scan(body, latents, jnp.arange(num_steps))
        return latents, jnp.zeros((), jnp.int32)

    return run


def make_qwen_denoiser(
    cfg: QwenImageConfig,
    scheduler: FlowMatchEulerScheduler,
    num_steps: int,
    true_cfg_scale: float = 4.0,
    cache_cfg=None,
):
    """run(params, latents (B,S,C), pos_embeds, neg_embeds, cos, sin).

    Qwen uses 'true CFG': two forwards per step (ref: qwen true_cfg_scale in
    FastDMEngine.generate). neg_embeds may equal pos_embeds when scale <= 1.
    With caching + negtive_cache, the two forwards keep independent cache
    states (ref: xcaching.py:66-76)."""
    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)
    do_cfg = true_cfg_scale > 1.0
    use_cache = cache_cfg is not None and cache_cfg.enable_caching

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(params, latents, pos_embeds, neg_embeds, cos, sin):
        b = latents.shape[0]

        if use_cache:
            from fastdm_tpu.caching.xcaching import (
                cache_init_state,
                negative_stream_config,
            )
            from fastdm_tpu.models.qwenimage import qwen_forward_cached

            neg_cfg = negative_stream_config(cache_cfg)

            img_hidden = (b, latents.shape[1], cfg.inner_dim)
            probe_shape = (
                (b, pos_embeds.shape[1], cfg.inner_dim)
                if _is_teacache(cache_cfg)
                else img_hidden
            )
            st_pos0 = cache_init_state(cache_cfg, img_hidden, probe_shape)
            st_neg0 = cache_init_state(cache_cfg, img_hidden, probe_shape)

            def body(carry, step):
                lat, st_pos, st_neg = carry
                t = jnp.broadcast_to(sigmas[step], (b,))
                pos, st_pos = qwen_forward_cached(
                    params, cfg, cache_cfg, st_pos, step, num_steps,
                    lat.astype(jnp.bfloat16), pos_embeds, t, cos, sin,
                )
                pos = pos.astype(jnp.float32)
                if do_cfg:
                    neg, st_neg = qwen_forward_cached(
                        params, cfg, neg_cfg, st_neg, step, num_steps,
                        lat.astype(jnp.bfloat16), neg_embeds, t, cos, sin,
                    )
                    out = neg.astype(jnp.float32) + true_cfg_scale * (pos - neg.astype(jnp.float32))
                else:
                    out = pos
                lat = scheduler.step(out, step, lat, sigmas)
                return (lat, st_pos, st_neg), None

            (latents_out, st_p, st_n), _ = jax.lax.scan(
                body, (latents, st_pos0, st_neg0), jnp.arange(num_steps)
            )
            return latents_out, st_p["skips"] + st_n["skips"]

        def body(lat, step):
            t = jnp.broadcast_to(sigmas[step], (b,))
            pos = qwen_forward(
                params, cfg, lat.astype(jnp.bfloat16), pos_embeds, t, cos, sin
            ).astype(jnp.float32)
            if do_cfg:
                neg = qwen_forward(
                    params, cfg, lat.astype(jnp.bfloat16), neg_embeds, t, cos, sin
                ).astype(jnp.float32)
                out = neg + true_cfg_scale * (pos - neg)
            else:
                out = pos
            lat = scheduler.step(out, step, lat, sigmas)
            return lat, None

        latents, _ = jax.lax.scan(body, latents, jnp.arange(num_steps))
        return latents, jnp.zeros((), jnp.int32)

    return run


def make_qwen_edit_denoiser(
    cfg: QwenImageConfig,
    scheduler: FlowMatchEulerScheduler,
    num_steps: int,
    true_cfg_scale: float = 4.0,
    cache_cfg=None,
):
    """Qwen-Image-Edit loop: clean VAE-encoded source-image tokens are
    appended to the noise tokens every step (their rope ids sit on image
    entry 1, see qwen_rope_cos_sin extra_shapes); only the noise part is
    denoised/output (diffusers QwenImageEditPipeline step structure; the
    reference delegates to it via FastDMEngine i2i, model_entry.py:764-766).

    run(params, latents (B,S,C), src_tokens (B,S_src,C), pos_embeds,
    neg_embeds, cos, sin) -> latents. cos/sin must cover txt + S + S_src."""
    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)
    do_cfg = true_cfg_scale > 1.0
    use_cache = cache_cfg is not None and cache_cfg.enable_caching

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(params, latents, src_tokens, pos_embeds, neg_embeds, cos, sin):
        b, s, _ = latents.shape
        expect = pos_embeds.shape[1] + s + src_tokens.shape[1]
        if cos.shape[0] != expect:
            raise ValueError(
                f"rope covers {cos.shape[0]} tokens but the edit sequence has "
                f"{expect} (txt {pos_embeds.shape[1]} + noise {s} + source "
                f"{src_tokens.shape[1]}) — build qwen_rope_cos_sin with "
                f"extra_shapes for the source image"
            )
        src = src_tokens.astype(jnp.bfloat16)

        if use_cache:
            from fastdm_tpu.caching.xcaching import (
                cache_init_state,
                negative_stream_config,
            )
            from fastdm_tpu.models.qwenimage import qwen_forward_cached

            neg_cfg = negative_stream_config(cache_cfg)
            # the cached stream covers noise + source tokens (the residual
            # spans whatever the blocks see); probe = txt stream for TeaCache
            full_hidden = (b, s + src_tokens.shape[1], cfg.inner_dim)
            probe_shape = (
                (b, pos_embeds.shape[1], cfg.inner_dim)
                if _is_teacache(cache_cfg)
                else full_hidden
            )
            st_pos0 = cache_init_state(cache_cfg, full_hidden, probe_shape)
            st_neg0 = cache_init_state(cache_cfg, full_hidden, probe_shape)

            def body(carry, step):
                lat, st_pos, st_neg = carry
                t = jnp.broadcast_to(sigmas[step], (b,))
                inp = jnp.concatenate([lat.astype(jnp.bfloat16), src], axis=1)
                pos, st_pos = qwen_forward_cached(
                    params, cfg, cache_cfg, st_pos, step, num_steps,
                    inp, pos_embeds, t, cos, sin,
                )
                pos = pos[:, :s].astype(jnp.float32)
                if do_cfg:
                    neg, st_neg = qwen_forward_cached(
                        params, cfg, neg_cfg, st_neg, step, num_steps,
                        inp, neg_embeds, t, cos, sin,
                    )
                    neg = neg[:, :s].astype(jnp.float32)
                    out = neg + true_cfg_scale * (pos - neg)
                else:
                    out = pos
                lat = scheduler.step(out, step, lat, sigmas)
                return (lat, st_pos, st_neg), None

            (latents_out, st_p, st_n), _ = jax.lax.scan(
                body, (latents, st_pos0, st_neg0), jnp.arange(num_steps)
            )
            return latents_out, st_p["skips"] + st_n["skips"]

        def body(lat, step):
            t = jnp.broadcast_to(sigmas[step], (b,))
            inp = jnp.concatenate([lat.astype(jnp.bfloat16), src], axis=1)
            pos = qwen_forward(
                params, cfg, inp, pos_embeds, t, cos, sin
            )[:, :s].astype(jnp.float32)
            if do_cfg:
                neg = qwen_forward(
                    params, cfg, inp, neg_embeds, t, cos, sin
                )[:, :s].astype(jnp.float32)
                out = neg + true_cfg_scale * (pos - neg)
            else:
                out = pos
            lat = scheduler.step(out, step, lat, sigmas)
            return lat, None

        latents, _ = jax.lax.scan(body, latents, jnp.arange(num_steps))
        return latents, jnp.zeros((), jnp.int32)

    return run


def _warmup_scans(step_once, carry, sparse_mask, dense_warmup_steps, num_steps):
    """Shared dense-warmup split for the wan loops: the first `cut` steps run
    dense (mask=None), the rest consume the sparse mask — as two separate
    scans so the sparse program never traces a dynamic dense/sparse switch
    (ref dense_steps gating: fastdm/layer/transformer.py:512).

    cut is CLAMPED to [0, num_steps]: an unclamped warmup (radial config
    dense_steps > num_inference_steps) would scan past the sigma ladder,
    where UniPC's corrector divides 0/0 -> NaN (the phase-split loop always
    clamped; the four flat loops now share this one implementation)."""
    cut = min(max(int(dense_warmup_steps), 0), num_steps)
    if sparse_mask is not None and cut > 0:
        carry, _ = jax.lax.scan(
            lambda c, s: (step_once(c, s, None), None), carry, jnp.arange(cut))
        carry, _ = jax.lax.scan(
            lambda c, s: (step_once(c, s, sparse_mask), None),
            carry, jnp.arange(cut, num_steps))
    else:
        carry, _ = jax.lax.scan(
            lambda c, s: (step_once(c, s, sparse_mask), None),
            carry, jnp.arange(num_steps))
    return carry


def make_wan_denoiser(
    cfg: WanConfig,
    scheduler: FlowMatchEulerScheduler,
    num_steps: int,
    guidance_scale: float = 5.0,
    guidance_scale_2: Optional[float] = None,
    boundary_ratio: Optional[float] = None,  # A14B: sigma >= boundary -> expert 1
    dense_warmup_steps: int = 0,             # radial sparse: first N steps dense
):
    """run(params, params_2, latents (B,C,F,H,W), pos_text, neg_text, cos, sin,
    sparse_mask, cond=None, encoder_image=None) -> latents. encoder_image:
    Wan2.1-I2V CLIP vision tokens (B, S_img, image_dim), same for both CFG
    branches (diffusers WanImageToVideoPipeline).

    params_2 may be None (single-expert models); with boundary_ratio set, the
    high-noise expert (params) runs while sigma >= boundary, then the low-noise
    expert (params_2) (ref: wan A14B switching, model_entry.py:673-690).
    The dense warmup runs as a separate unrolled scan so the sparse program
    never traces a dynamic dense/sparse switch (ref dense_steps gating:
    fastdm/layer/transformer.py:512)."""
    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)
    do_cfg = guidance_scale > 1.0
    g2 = guidance_scale_2 if guidance_scale_2 is not None else guidance_scale

    def _fwd(params, lat, text, t, mask, rc, rs, img):
        return wan_forward(
            params, cfg, lat.astype(jnp.bfloat16), t, text,
            encoder_hidden_states_image=img, rope_cos=rc, rope_sin=rs,
            sparse_mask=mask,
        ).astype(jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(params, params_2, latents, pos_text, neg_text, rope_cos, rope_sin,
            sparse_mask, cond=None, encoder_image=None):
        b = latents.shape[0]

        def step_once(carry, step, mask):
            lat, sst = carry
            sigma = sigmas[step]
            t = jnp.broadcast_to(sigma * 1000.0, (b,))
            # i2v: constant conditioning channels (mask + encoded first frame)
            # concatenated every step (diffusers Wan i2v; in_channels 16+20)
            inp = lat if cond is None else jnp.concatenate(
                [lat, cond.astype(lat.dtype)], axis=1)

            def one(p, g):
                pos = _fwd(p, inp, pos_text, t, mask, rope_cos, rope_sin,
                           encoder_image)
                if do_cfg:
                    neg = _fwd(p, inp, neg_text, t, mask, rope_cos, rope_sin,
                               encoder_image)
                    return neg + g * (pos - neg)
                return pos

            if params_2 is not None and boundary_ratio is not None:
                out = jax.lax.cond(
                    sigma >= boundary_ratio,
                    lambda _: one(params, guidance_scale),
                    lambda _: one(params_2, g2),
                    None,
                )
            else:
                out = one(params, guidance_scale)
            return scheduler_step(scheduler, out, step, lat, sigmas, sst, num_steps)

        carry = (latents, scheduler_init_state(scheduler, latents.shape))
        carry = _warmup_scans(step_once, carry, sparse_mask,
                              dense_warmup_steps, num_steps)
        return carry[0], jnp.zeros((), jnp.int32)

    return run


def make_wan_cached_denoiser(
    cfg: WanConfig,
    scheduler: FlowMatchEulerScheduler,
    num_steps: int,
    cache_cfg,
    guidance_scale: float = 5.0,
    dense_warmup_steps: int = 0,  # radial sparse: first N steps dense
    segment_steps: Optional[int] = None,  # host-threaded program splitting
):
    """Single-expert Wan loop with FBCache/DiCache and dual pos/neg cache
    streams (ref: xcaching negtive_cache for wan). cond carries the i2v
    conditioning channels (mask + encoded first frame), concatenated each
    step like the uncached loop. The sparse dense-step warmup is the same
    two-scan split as the uncached/dual loops (cache states thread through
    both scans).

    segment_steps=N splits the loop into ceil(num_steps/N) jitted programs of
    N steps each, threading (latents, cache states, scheduler state) on the
    host between programs — numerically identical to the single-program form
    (the step body is shared; tests/test_denoise.py::test_wan_cached_segmented
    ). Exists for runtimes that bound single-execution wall time (the axon
    dev tunnel kills executions at ~60 s; a 50-step Wan-5B scan runs ~195 s)
    and for per-segment observability; the step offset is a DYNAMIC scalar,
    so all full-length segments share one compiled program."""
    from fastdm_tpu.caching.xcaching import (
        cache_init_state,
        negative_stream_config,
    )
    from fastdm_tpu.models.wan import wan_forward_cached

    neg_cfg = negative_stream_config(cache_cfg)
    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)
    do_cfg = guidance_scale > 1.0

    def _step(params, carry, step, mask, pos_text, neg_text, rope_cos,
              rope_sin, cond, encoder_image):
        lat, sp, sn, sst = carry
        b = lat.shape[0]
        t = jnp.broadcast_to(sigmas[step] * 1000.0, (b,))
        inp = lat if cond is None else jnp.concatenate(
            [lat, cond.astype(lat.dtype)], axis=1)
        pos, sp = wan_forward_cached(
            params, cfg, cache_cfg, sp, step, num_steps,
            inp.astype(jnp.bfloat16), t, pos_text,
            encoder_hidden_states_image=encoder_image,
            rope_cos=rope_cos, rope_sin=rope_sin, sparse_mask=mask,
        )
        pos = pos.astype(jnp.float32)
        if do_cfg:
            neg, sn = wan_forward_cached(
                params, cfg, neg_cfg, sn, step, num_steps,
                inp.astype(jnp.bfloat16), t, neg_text,
                encoder_hidden_states_image=encoder_image,
                rope_cos=rope_cos, rope_sin=rope_sin, sparse_mask=mask,
            )
            out = neg.astype(jnp.float32) + guidance_scale * (pos - neg.astype(jnp.float32))
        else:
            out = pos
        lat, sst = scheduler_step(scheduler, out, step, lat, sigmas, sst, num_steps)
        return (lat, sp, sn, sst)

    def _init_carry(latents):
        b, c, f, h, w = latents.shape
        pt, ph, pw = cfg.patch_size
        n_tok = (f // pt) * (h // ph) * (w // pw)
        hshape = (b, n_tok, cfg.inner_dim)
        return (latents, cache_init_state(cache_cfg, hshape, hshape),
                cache_init_state(cache_cfg, hshape, hshape),
                scheduler_init_state(scheduler, latents.shape))

    if segment_steps is None:
        @functools.partial(jax.jit, donate_argnums=(1,))
        def run(params, latents, pos_text, neg_text, rope_cos, rope_sin,
                sparse_mask, cond=None, encoder_image=None):
            def step_once(carry, step, mask):
                return _step(params, carry, step, mask, pos_text, neg_text,
                             rope_cos, rope_sin, cond, encoder_image)

            carry = _warmup_scans(step_once, _init_carry(latents), sparse_mask,
                                  dense_warmup_steps, num_steps)
            latents_out, st_p, st_n, _ = carry
            return latents_out, st_p["skips"] + st_n["skips"]

        return run

    seg_jits = {}

    def _seg_fn(length, init):
        """init=True builds the (cache states, scheduler state) carry
        IN-GRAPH (their zero buffers would alias under XLA constant dedup,
        and aliased buffers cannot both be donated); later segments take the
        carry as donated arguments."""
        key = (length, init)
        if key not in seg_jits:
            if init:
                def _raw(params, lat, lo, pos_text, neg_text, rope_cos,
                         rope_sin, mask, cond, encoder_image):
                    def body(cr, step):
                        return _step(params, cr, step, mask, pos_text,
                                     neg_text, rope_cos, rope_sin, cond,
                                     encoder_image), None

                    cr, _ = jax.lax.scan(body, _init_carry(lat),
                                         lo + jnp.arange(length))
                    return cr

                seg_jits[key] = jax.jit(_raw, donate_argnums=(1,))
            else:
                def _raw(params, lat, sp, sn, sst, lo, pos_text, neg_text,
                         rope_cos, rope_sin, mask, cond, encoder_image):
                    def body(cr, step):
                        return _step(params, cr, step, mask, pos_text,
                                     neg_text, rope_cos, rope_sin, cond,
                                     encoder_image), None

                    cr, _ = jax.lax.scan(body, (lat, sp, sn, sst),
                                         lo + jnp.arange(length))
                    return cr

                seg_jits[key] = jax.jit(_raw, donate_argnums=(1, 2, 3, 4))
        return seg_jits[key]

    def run_segmented(params, latents, pos_text, neg_text, rope_cos, rope_sin,
                      sparse_mask, cond=None, encoder_image=None):
        carry = None
        cut = (min(max(int(dense_warmup_steps), 0), num_steps)
               if sparse_mask is not None else 0)
        bounds = [0, cut, num_steps] if 0 < cut < num_steps else [0, num_steps]
        for seg_lo, seg_hi in zip(bounds[:-1], bounds[1:]):
            mask = (None if sparse_mask is not None and seg_lo < cut
                    else sparse_mask)
            s = seg_lo
            while s < seg_hi:
                length = min(segment_steps, seg_hi - s)
                lo = jnp.asarray(s, jnp.int32)
                if carry is None:
                    carry = _seg_fn(length, True)(
                        params, latents, lo, pos_text, neg_text, rope_cos,
                        rope_sin, mask, cond, encoder_image)
                else:
                    lat, sp, sn, sst = carry
                    carry = _seg_fn(length, False)(
                        params, lat, sp, sn, sst, lo, pos_text, neg_text,
                        rope_cos, rope_sin, mask, cond, encoder_image)
                s += length
        latents_out, st_p, st_n, _ = carry
        return latents_out, st_p["skips"] + st_n["skips"]

    return run_segmented


def make_wan_dual_cached_denoiser(
    cfg: WanConfig,
    scheduler: FlowMatchEulerScheduler,
    num_steps: int,
    cache_cfg,
    guidance_scale: float = 5.0,
    guidance_scale_2: Optional[float] = None,
    boundary_ratio: float = 0.875,
    dense_warmup_steps: int = 0,
):
    """A14B dual-expert loop WITH caching: one FBCache/DiCache state per
    expert per CFG branch (4 states total), matching the reference engine's
    one-AutoCache-per-expert construction (model_entry.py:673-690). Expert
    switching is the same sigma >= boundary lax.cond as the uncached loop;
    each branch threads only its own cache states so a skip decision never
    reads the other expert's residuals.

    The engine ships the phase-split form (make_wan_dual_phase_denoiser),
    which computes the same function without keeping both experts
    device-resident; this cond form is retained as its differential oracle
    (tests/test_denoise.py::test_wan_dual_phase_matches_cond_form).

    run(params, params_2, latents, pos_text, neg_text, cos, sin, sparse_mask,
    cond=None) -> (latents, skips)."""
    from fastdm_tpu.caching.xcaching import (
        cache_init_state,
        negative_stream_config,
    )
    from fastdm_tpu.models.wan import wan_forward_cached

    neg_cfg = negative_stream_config(cache_cfg)
    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)
    do_cfg = guidance_scale > 1.0
    g2 = guidance_scale_2 if guidance_scale_2 is not None else guidance_scale

    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(params, params_2, latents, pos_text, neg_text, rope_cos, rope_sin,
            sparse_mask, cond=None):
        b, c, f, h, w = latents.shape
        pt, ph, pw = cfg.patch_size
        n_tok = (f // pt) * (h // ph) * (w // pw)
        hshape = (b, n_tok, cfg.inner_dim)
        states0 = tuple(cache_init_state(cache_cfg, hshape, hshape)
                        for _ in range(4))  # (pos1, neg1, pos2, neg2)

        def one(p, g, sp, sn, inp, t, step, mask):
            pos, sp = wan_forward_cached(
                p, cfg, cache_cfg, sp, step, num_steps,
                inp.astype(jnp.bfloat16), t, pos_text,
                rope_cos=rope_cos, rope_sin=rope_sin, sparse_mask=mask,
            )
            pos = pos.astype(jnp.float32)
            if do_cfg:
                neg, sn = wan_forward_cached(
                    p, cfg, neg_cfg, sn, step, num_steps,
                    inp.astype(jnp.bfloat16), t, neg_text,
                    rope_cos=rope_cos, rope_sin=rope_sin, sparse_mask=mask,
                )
                return neg.astype(jnp.float32) + g * (pos - neg.astype(jnp.float32)), sp, sn
            return pos, sp, sn

        def step_once(cr, step, mask):
            lat, states, sst = cr
            sigma = sigmas[step]
            t = jnp.broadcast_to(sigma * 1000.0, (b,))
            inp = lat if cond is None else jnp.concatenate(
                [lat, cond.astype(lat.dtype)], axis=1)
            sp1, sn1, sp2, sn2 = states

            def expert1(_):
                out, sp, sn = one(params, guidance_scale, sp1, sn1, inp, t, step, mask)
                return out, (sp, sn, sp2, sn2)

            def expert2(_):
                out, sp, sn = one(params_2, g2, sp2, sn2, inp, t, step, mask)
                return out, (sp1, sn1, sp, sn)

            out, states = jax.lax.cond(sigma >= boundary_ratio, expert1, expert2, None)
            lat, sst = scheduler_step(scheduler, out, step, lat, sigmas, sst, num_steps)
            return (lat, states, sst)

        carry = (latents, states0, scheduler_init_state(scheduler, latents.shape))
        carry = _warmup_scans(step_once, carry, sparse_mask,
                              dense_warmup_steps, num_steps)
        latents_out, states, _ = carry
        return latents_out, sum(st["skips"] for st in states)

    return run


def make_wan_ti2v_denoiser(
    cfg: WanConfig,
    scheduler: FlowMatchEulerScheduler,
    num_steps: int,
    guidance_scale: float = 5.0,
    cache_cfg=None,
    dense_warmup_steps: int = 0,
):
    """Wan2.2-ti2v (5B) image-conditioned loop: the clean encoded first latent
    frame is re-pinned into the latents every step and its tokens carry
    timestep 0 via the model's per-token timestep path
    (cfg.per_token_timestep; ref: wan.py:76-92 temb ndim-4 handling — the
    diffusers ti2v flow with expand_timesteps).

    Cache/sparse wiring matches the t2v loops (the per-token timestep probe
    shape is the only structural difference — wan_forward_cached already
    handles it via _wan_embed; ref: fastdm/model/wan.py:76-92 +
    fastdm/caching/xcaching.py:91-136): FBCache/DiCache with dual pos/neg
    streams, and the sparse mask with a dense-warmup two-scan split.

    run(params, latents (B,C,F,H,W), cond (B,C,1,H,W), pos_text, neg_text,
    rope_cos, rope_sin, sparse_mask=None) -> latents with frame 0 = cond."""
    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)
    do_cfg = guidance_scale > 1.0
    assert cfg.per_token_timestep, "ti2v needs per_token_timestep=True"
    if cache_cfg is not None:
        from fastdm_tpu.caching.xcaching import (
            cache_init_state,
            negative_stream_config,
        )
        from fastdm_tpu.models.wan import wan_forward_cached

        neg_cfg = negative_stream_config(cache_cfg)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(params, latents, cond, pos_text, neg_text, rope_cos, rope_sin,
            sparse_mask=None):
        b, c, f, h, w = latents.shape
        pt, ph, pw = cfg.patch_size
        tokens_per_frame = (h // ph) * (w // pw)
        n_tokens = (f // pt) * tokens_per_frame
        # frame-0 tokens are conditioned -> timestep 0
        frame_idx = jnp.arange(n_tokens) // tokens_per_frame
        tmask = (frame_idx > 0).astype(jnp.float32)[None]  # (1, S)
        hshape = (b, n_tokens, cfg.inner_dim)
        if cache_cfg is not None:
            cstates = (cache_init_state(cache_cfg, hshape, hshape),
                       cache_init_state(cache_cfg, hshape, hshape))
        else:
            cstates = ()

        def step_once(carry, step, mask):
            lat, cst, sst = carry
            sigma = sigmas[step]
            # replace the first cond.shape[2] latent frames with the clean
            # conditioning clip (1 VAE-encoded frame today; pt==1 for ti2v,
            # so frame slicing and the tmask frame-law stay aligned)
            lat_in = jnp.concatenate(
                [cond.astype(lat.dtype), lat[:, :, cond.shape[2]:]], axis=2)
            t_tok = jnp.broadcast_to(sigma * 1000.0 * tmask, (b, n_tokens))

            if cache_cfg is not None:
                sp, sn = cst
                pos, sp = wan_forward_cached(
                    params, cfg, cache_cfg, sp, step, num_steps,
                    lat_in.astype(jnp.bfloat16), t_tok, pos_text,
                    rope_cos=rope_cos, rope_sin=rope_sin, sparse_mask=mask,
                )
                pos = pos.astype(jnp.float32)
                if do_cfg:
                    neg, sn = wan_forward_cached(
                        params, cfg, neg_cfg, sn, step, num_steps,
                        lat_in.astype(jnp.bfloat16), t_tok, neg_text,
                        rope_cos=rope_cos, rope_sin=rope_sin, sparse_mask=mask,
                    )
                    out = neg.astype(jnp.float32) + guidance_scale * (pos - neg.astype(jnp.float32))
                else:
                    out = pos
                cst = (sp, sn)
            else:
                def one(text):
                    return wan_forward(
                        params, cfg, lat_in.astype(jnp.bfloat16), t_tok, text,
                        rope_cos=rope_cos, rope_sin=rope_sin, sparse_mask=mask,
                    ).astype(jnp.float32)

                pos = one(pos_text)
                if do_cfg:
                    neg = one(neg_text)
                    out = neg + guidance_scale * (pos - neg)
                else:
                    out = pos
            lat, sst = scheduler_step(
                scheduler, out, step, lat_in.astype(jnp.float32), sigmas, sst,
                num_steps)
            return (lat, cst, sst)

        carry = (latents, cstates,
                 scheduler_init_state(scheduler, latents.shape))
        carry = _warmup_scans(step_once, carry, sparse_mask,
                              dense_warmup_steps, num_steps)
        latents, cst, _ = carry
        skips = (cst[0]["skips"] + cst[1]["skips"]) if cache_cfg is not None \
            else jnp.zeros((), jnp.int32)
        # final output keeps the clean conditioning frame
        return (
            jnp.concatenate([cond.astype(latents.dtype),
                             latents[:, :, cond.shape[2]:]], axis=2),
            skips,
        )

    return run


def make_wan_dual_phase_denoiser(
    cfg: WanConfig,
    scheduler: FlowMatchEulerScheduler,
    num_steps: int,
    cache_cfg,  # None -> uncached
    guidance_scale: float,
    guidance_scale_2: Optional[float],
    boundary_ratio: float,
    dense_warmup_steps: int = 0,
    place_params=None,
):
    """Phase-split Wan A14B dual-expert loop (EP residency, TPU answer).

    The expert boundary is a STATIC step index — the sigma ladder is known at
    trace time — so instead of a per-step `lax.cond` over BOTH experts (the
    both-resident form the reference uses on a 96 GB H20,
    ref: fastdm/model_entry.py:673-690), the loop splits into one jitted scan
    per expert. Each phase program closes over a single expert's params, so:
      * XLA traces/compiles each expert once, not both per step;
      * the INACTIVE expert need not be device-resident — the caller may keep
        both masters in host RAM and device_put only the active expert per
        phase (FastDMEngine offload_inactive_expert), which is what lets the
        two 14B experts fit a 16 GB v5e one at a time.

    Cache semantics are bit-identical to make_wan_dual_cached_denoiser: each
    expert owns (pos, neg) cache states; in the cond form the idle expert's
    states pass through untouched, so threading them only through their own
    phase is the same computation. Scheduler state (UniPC history) threads
    across the phase boundary.

    run(params, params_2, latents, pos_text, neg_text, cos, sin, sparse_mask,
    cond=None) -> (latents, skips). params/params_2 may live anywhere jax can
    device_put from (host included). `place_params` (tree -> tree), when
    given, materializes each expert's weights right before its phase and is
    the mesh composition point: the engine passes its TP-sharding placer so a
    host-resident expert lands DIRECTLY on its tp shards (offload + tp=2 is
    the minimal A14B slice — BENCH_NOTES residency math); the reference to
    the placed copy is dropped after the phase, so device peak stays one
    expert."""
    import numpy as np

    if cache_cfg is not None:
        from fastdm_tpu.caching.xcaching import (
            cache_init_state,
            negative_stream_config,
        )
        from fastdm_tpu.models.wan import wan_forward_cached

        neg_cfg = negative_stream_config(cache_cfg)
    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)
    do_cfg = guidance_scale > 1.0
    g2 = guidance_scale_2 if guidance_scale_2 is not None else guidance_scale
    # first step where sigma drops below the boundary -> expert 2 (the ladder
    # is descending; expert 1 runs while sigma >= boundary)
    b_step = int(np.sum(np.asarray(scheduler.sigmas)[:num_steps]
                        >= boundary_ratio))

    def _make_phase(lo: int, hi: int, g: float):
        """Jitted scan over steps [lo, hi) with ONE expert's params."""

        @functools.partial(jax.jit, donate_argnums=(1,))
        def phase(p, latents, sst, pos_text, neg_text, rope_cos, rope_sin,
                  sparse_mask, cond):
            b = latents.shape[0]
            _, c, f, h, w = latents.shape
            pt, ph, pw = cfg.patch_size
            n_tok = (f // pt) * (h // ph) * (w // pw)
            hshape = (b, n_tok, cfg.inner_dim)
            if cache_cfg is not None:
                cstates = (cache_init_state(cache_cfg, hshape, hshape),
                           cache_init_state(cache_cfg, hshape, hshape))
            else:
                cstates = ()

            def step_once(carry, step, mask):
                lat, cst, s_ = carry
                t = jnp.broadcast_to(sigmas[step] * 1000.0, (b,))
                inp = lat if cond is None else jnp.concatenate(
                    [lat, cond.astype(lat.dtype)], axis=1)
                if cache_cfg is not None:
                    sp, sn = cst
                    pos, sp = wan_forward_cached(
                        p, cfg, cache_cfg, sp, step, num_steps,
                        inp.astype(jnp.bfloat16), t, pos_text,
                        rope_cos=rope_cos, rope_sin=rope_sin, sparse_mask=mask,
                    )
                    pos = pos.astype(jnp.float32)
                    if do_cfg:
                        neg, sn = wan_forward_cached(
                            p, cfg, neg_cfg, sn, step, num_steps,
                            inp.astype(jnp.bfloat16), t, neg_text,
                            rope_cos=rope_cos, rope_sin=rope_sin,
                            sparse_mask=mask,
                        )
                        out = neg.astype(jnp.float32) + g * (
                            pos - neg.astype(jnp.float32))
                    else:
                        out = pos
                    cst = (sp, sn)
                else:
                    def one(text):
                        return wan_forward(
                            p, cfg, inp.astype(jnp.bfloat16), t, text,
                            rope_cos=rope_cos, rope_sin=rope_sin,
                            sparse_mask=mask,
                        ).astype(jnp.float32)

                    pos = one(pos_text)
                    if do_cfg:
                        neg = one(neg_text)
                        out = neg + g * (pos - neg)
                    else:
                        out = pos
                lat, s_ = scheduler_step(scheduler, out, step, lat, sigmas,
                                         s_, num_steps)
                return (lat, cst, s_)

            carry = (latents, cstates, sst)
            cuts = sorted({lo, hi} | (
                {min(max(dense_warmup_steps, lo), hi)}
                if sparse_mask is not None else set()))
            for seg_lo, seg_hi in zip(cuts[:-1], cuts[1:]):
                if seg_lo == seg_hi:
                    continue
                mask = (None if sparse_mask is not None
                        and seg_lo < dense_warmup_steps else sparse_mask)
                carry, _ = jax.lax.scan(
                    lambda cr, s, m=mask: (step_once(cr, s, m), None),
                    carry, jnp.arange(seg_lo, seg_hi),
                )
            lat, cst, s_ = carry
            skips = (cst[0]["skips"] + cst[1]["skips"]) \
                if cache_cfg is not None else jnp.zeros((), jnp.int32)
            return lat, s_, skips

        return phase

    phase1 = _make_phase(0, b_step, guidance_scale) if b_step > 0 else None
    phase2 = _make_phase(b_step, num_steps, g2) if b_step < num_steps else None

    def run(params, params_2, latents, pos_text, neg_text, rope_cos, rope_sin,
            sparse_mask, cond=None):
        sst = scheduler_init_state(scheduler, latents.shape)
        skips = jnp.zeros((), jnp.int32)
        if phase1 is not None:
            p = params if place_params is None else place_params(params)
            latents, sst, s1 = phase1(p, latents, sst, pos_text,
                                      neg_text, rope_cos, rope_sin,
                                      sparse_mask, cond)
            del p  # free expert 1's device copy before expert 2 transfers
            skips = skips + s1
        if phase2 is not None:
            if place_params is not None and phase1 is not None:
                # offload mode: make sure phase 1 (and the free of expert 1's
                # buffers) has completed before expert 2's transfer starts —
                # otherwise both 14B experts could briefly coexist in HBM
                latents.block_until_ready()
            p = params_2 if place_params is None else place_params(params_2)
            latents, sst, s2 = phase2(p, latents, sst, pos_text,
                                      neg_text, rope_cos, rope_sin,
                                      sparse_mask, cond)
            del p
            skips = skips + s2
        return latents, skips

    return run


def make_wan_dual_host_denoiser(
    cfg: WanConfig,
    scheduler: FlowMatchEulerScheduler,
    num_steps: int,
    cache_cfg,  # None -> uncached
    guidance_scale: float,
    guidance_scale_2: Optional[float],
    boundary_ratio: float,
    dense_warmup_steps: int = 0,
    place_params=None,
):
    """Host-stepped Wan A14B dual-expert loop: per-CFG-BRANCH program
    granularity. Same computation as make_wan_dual_phase_denoiser (expert
    phase split, per-expert-per-branch cache states, UniPC state threaded
    across the boundary), but each transformer forward is its OWN jitted
    program and the step loop runs in Python.

    Why this form exists alongside the scan form:
      * runtimes that bound single-execution wall time — the axon dev tunnel
        kills any execution at ~60 s, and one A14B CFG step at 720p/81f is
        ~50 s sparse / ~82 s dense, so even a one-step-per-program split of
        the scan form dies on the dense steps; a single 40-layer forward
        (~25-41 s) fits,
      * per-forward observability / preemption points for serving.

    Program count stays tiny because everything dynamic is an argument: the
    expert params, the step index, and the guidance scale are all traced, so
    BOTH experts and ALL steps share one compiled forward per (branch cache
    config x mask form) — at most 4 programs, plus one combine+scheduler
    program (FBCache's pos and neg stream configs are identical under
    negtive_cache, which dedupes to 2 forward programs in the common case).

    run(params, params_2, latents, pos_text, neg_text, cos, sin, sparse_mask,
    cond=None) -> (latents, skips). With place_params (offload mode), each
    expert is materialized once at its phase start and freed at phase end,
    exactly like the scan form."""
    import numpy as np

    if cache_cfg is not None:
        from fastdm_tpu.caching.xcaching import (
            cache_init_state,
            negative_stream_config,
        )
        from fastdm_tpu.models.wan import wan_forward_cached

        neg_cfg = negative_stream_config(cache_cfg)
    sigmas = jnp.asarray(scheduler.sigmas, jnp.float32)
    do_cfg = guidance_scale > 1.0
    g2 = guidance_scale_2 if guidance_scale_2 is not None else guidance_scale
    b_step = int(np.sum(np.asarray(scheduler.sigmas)[:num_steps]
                        >= boundary_ratio))
    cut = min(max(int(dense_warmup_steps), 0), num_steps)

    def _branch_uncached(p, inp, t, text, rope_cos, rope_sin, mask):
        return wan_forward(
            p, cfg, inp.astype(jnp.bfloat16), t, text,
            rope_cos=rope_cos, rope_sin=rope_sin, sparse_mask=mask,
        ).astype(jnp.float32), ()

    def _make_branch(stream_cfg):
        @functools.partial(jax.jit, donate_argnums=(1,))
        def branch(p, cst, inp, t, step, text, rope_cos, rope_sin, mask):
            if cache_cfg is None:
                return _branch_uncached(p, inp, t, text, rope_cos, rope_sin,
                                        mask)
            out, cst = wan_forward_cached(
                p, cfg, stream_cfg, cst, step, num_steps,
                inp.astype(jnp.bfloat16), t, text,
                rope_cos=rope_cos, rope_sin=rope_sin, sparse_mask=mask,
            )
            return out.astype(jnp.float32), cst

        return branch

    branch_pos = _make_branch(cache_cfg)
    # one compiled program serves both CFG streams whenever the neg-stream
    # config is identical (always, except TeaCache with fitted
    # negtive_coefficients): a second jit closure would compile a SECOND
    # device program whose temp arena doubles peak HBM at A14B scale
    branch_neg = _make_branch(neg_cfg) \
        if (cache_cfg is not None and do_cfg and neg_cfg != cache_cfg) \
        else branch_pos

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def combine_sched(pos, neg, lat, sst, step, g):
        out = pos if neg is None else neg + g * (pos - neg)
        return scheduler_step(scheduler, out, step, lat, sigmas, sst,
                              num_steps)

    # Fused whole-step program (pos branch + neg branch + CFG combine +
    # scheduler): over the axon tunnel every Execute costs ~1-2 s of
    # round-trip latency, and the per-branch form dispatches 3 programs per
    # step (80 branch + 40 combine = ~250 s of the 1016 s rate-matched e2e,
    # BENCH_NOTES 2026-08-21). One fused CFG step is ~44 s on-device —
    # still under the ~60 s single-execution tunnel cap when every step is
    # sparse; DENSE steps (~38 s/branch) would exceed it, so the fused form
    # is only used when dense_warmup_steps == 0. Numerically identical:
    # same branch bodies, same combine, same scheduler math.
    @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4))
    def step_fused(p, st0, st1, lat, sst, cond, t, step, g, p_text, n_text,
                   rope_cos, rope_sin, mask):
        # inp built IN-GRAPH: lat is donated, and passing the same buffer as
        # a second argument would be rejected by Execute
        inp = lat if cond is None else jnp.concatenate(
            [lat, cond.astype(lat.dtype)], axis=1)
        if cache_cfg is None:
            pos, _ = _branch_uncached(p, inp, t, p_text, rope_cos, rope_sin,
                                      mask)
            neg, _ = _branch_uncached(p, inp, t, n_text, rope_cos, rope_sin,
                                      mask)
            st0_n, st1_n = st0, st1
        else:
            pos, st0_n = wan_forward_cached(
                p, cfg, cache_cfg, st0, step, num_steps,
                inp.astype(jnp.bfloat16), t, p_text,
                rope_cos=rope_cos, rope_sin=rope_sin, sparse_mask=mask)
            # serialize the branches: without the barrier XLA co-schedules
            # the two (independent) 40-layer bodies and their temp arenas
            # overlap — the fused program then compiles at 16.9 GiB > HBM
            # (2026-08-21); with it, peak == one branch + both states
            pos, st0_n, inp_b, t_b, n_text_b = jax.lax.optimization_barrier(
                (pos, st0_n, inp, t, n_text))
            neg, st1_n = wan_forward_cached(
                p, cfg, neg_cfg, st1, step, num_steps,
                inp_b.astype(jnp.bfloat16), t_b, n_text_b,
                rope_cos=rope_cos, rope_sin=rope_sin, sparse_mask=mask)
            pos = pos.astype(jnp.float32)
            neg = neg.astype(jnp.float32)
        out = neg + g * (pos - neg)
        lat_n, sst_n = scheduler_step(scheduler, out, step, lat, sigmas, sst,
                                      num_steps)
        return lat_n, sst_n, st0_n, st1_n

    # MEASURED NEGATIVE (2026-08-21, BENCH_NOTES): the fused step ran the
    # rate-matched A14B e2e at 1184.8 s vs the per-branch form's 1016.6 s at
    # identical skips — async dispatch already back-to-backs the per-branch
    # Executes on device, while the fused program's optimization_barrier
    # (required to fit HBM) serializes everything it straddles. Kept behind
    # an env flag for future hardware where per-Execute latency dominates.
    use_fused = (do_cfg and cut == 0
                 and os.environ.get("FASTDM_WAN_FUSED_STEP") == "1")

    def run(params, params_2, latents, pos_text, neg_text, rope_cos, rope_sin,
            sparse_mask, cond=None):
        b = latents.shape[0]
        _, c, f, h, w = latents.shape
        pt, ph, pw = cfg.patch_size
        n_tok = (f // pt) * (h // ph) * (w // pw)
        hshape = (b, n_tok, cfg.inner_dim)

        # Distinct donated buffers WITHOUT eager transients: every zero leaf
        # gets `+ eps*k` with eps a TRACED 0.0 and k a unique counter, so XLA
        # cannot constant-fold identical leaves into one deduped buffer
        # (donating a shared buffer twice in one Execute is rejected), and
        # the whole init is one jitted program — the eager-zeros + jnp.copy
        # form left ~2.9 GiB of un-reclaimed transients per A14B expert
        # phase on the lazy-committing TPU allocator (OOM at full 720p/81f,
        # 2026-08-20).
        def _distinct(builder):
            def mk(eps):
                tree = builder()
                leaves, treedef = jax.tree.flatten(tree)
                out = [leaf + (eps * (i + 1)).astype(leaf.dtype)
                       for i, leaf in enumerate(leaves)]
                return jax.tree.unflatten(treedef, out)

            return jax.jit(mk)(jnp.float32(0.0))

        sst = _distinct(lambda: scheduler_init_state(scheduler, latents.shape))
        lat = latents
        skips = jnp.zeros((), jnp.int32)
        active, p_dev = None, None
        cstates = {}
        import os as _os
        _rss_dbg = _os.environ.get("FASTDM_RSS_DEBUG") == "1"

        def _rss():
            with open(f"/proc/{_os.getpid()}/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return int(line.split()[1]) / 2**20
            return 0.0

        for step in range(num_steps):
            expert = 1 if step < b_step else 2
            if expert != active:
                if p_dev is not None:
                    # phase boundary in offload mode: let the previous
                    # expert's last program finish before freeing its
                    # buffers and starting the next transfer, so device
                    # peak stays one expert
                    if place_params is not None:
                        lat.block_until_ready()
                    del p_dev
                    if cache_cfg is not None and active in cstates:
                        # the finished expert's cache states are dead weight
                        # (2 x 2 x (B,S,D) residuals) — bank their skip
                        # counts and free the device buffers before the next
                        # expert's transfer
                        st_old = cstates.pop(active)
                        skips = skips + st_old[0]["skips"] + st_old[1]["skips"]
                        del st_old
                    if place_params is not None:
                        # force a full device round-trip so the freed
                        # expert's buffers are actually reclaimed before the
                        # next 7.25 GiB transfer queues — the allocator
                        # reclaims lazily, and free-in-flight + incoming
                        # expert transiently held BOTH experts (the r5
                        # swap-step RESOURCE_EXHAUSTED at step b_step)
                        import numpy as _np

                        _np.asarray(skips + jnp.zeros((), jnp.int32))
                master = params if expert == 1 else params_2
                p_dev = master if place_params is None else \
                    place_params(master)
                active = expert
                if cache_cfg is not None:
                    cstates[expert] = _distinct(lambda: [
                        cache_init_state(cache_cfg, hshape, hshape),
                        cache_init_state(cache_cfg, hshape, hshape)])
            g = guidance_scale if expert == 1 else g2
            mask = None if (sparse_mask is not None and step < cut) \
                else sparse_mask
            t = jnp.broadcast_to(sigmas[step] * 1000.0, (b,))
            inp = lat if cond is None else jnp.concatenate(
                [lat, cond.astype(lat.dtype)], axis=1)
            st = cstates.get(expert, [(), ()])
            step_dev = jnp.asarray(step, jnp.int32)
            if use_fused:
                lat, sst, st[0], st[1] = step_fused(
                    p_dev, st[0], st[1], lat, sst, cond, t, step_dev,
                    jnp.asarray(g, jnp.float32), pos_text, neg_text,
                    rope_cos, rope_sin, mask)
            else:
                pos, st[0] = branch_pos(p_dev, st[0], inp, t, step_dev,
                                        pos_text, rope_cos, rope_sin, mask)
                neg = None
                if do_cfg:
                    neg, st[1] = branch_neg(p_dev, st[1], inp, t, step_dev,
                                            neg_text, rope_cos, rope_sin,
                                            mask)
                lat, sst = combine_sched(pos, neg, lat, sst, step_dev,
                                         jnp.asarray(g, jnp.float32))
            if _rss_dbg:
                lat.block_until_ready()
                print(f"[rss] step {step}: {_rss():.2f} GiB", flush=True)
        if cache_cfg is not None:
            for st in cstates.values():
                skips = skips + st[0]["skips"] + st[1]["skips"]
        return lat, skips

    return run
