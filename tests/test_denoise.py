"""Jitted denoise-loop tests (tiny configs): every model family's loop runs
N steps under one jit and yields finite latents; caching loop skips steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdm_tpu.pipeline.schedulers import (
    EulerDiscreteScheduler,
    FlowMatchEulerScheduler,
)

STEPS = 3


def test_flux_denoiser_with_teacache():
    from fastdm_tpu.caching.config import TeaCacheConfig
    from fastdm_tpu.models.flux import FluxConfig, flux_init_random, flux_rope_cache
    from fastdm_tpu.pipeline.denoise import make_flux_denoiser

    cfg = FluxConfig(num_layers=1, num_single_layers=1, attention_head_dim=32,
                     num_attention_heads=2, joint_attention_dim=32,
                     pooled_projection_dim=16, in_channels=8, out_channels=8,
                     axes_dims_rope=(8, 12, 12), quant="int8")
    params = flux_init_random(jax.random.key(0), cfg)
    cache = TeaCacheConfig(cache_algorithm="teacache", enable_caching=True,
                           threshold=0.5, coefficients=(1.0, 0.0))
    sched = FlowMatchEulerScheduler.create(STEPS, shift=1.0)
    run = make_flux_denoiser(cfg, sched, STEPS, cache, guidance_scale=3.5)
    ht = wt = 4
    cos, sin = flux_rope_cache(cfg, 8, ht, wt)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, ht * wt, cfg.in_channels), jnp.float32)
    enc = jax.random.normal(k, (1, 8, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(k, (1, cfg.pooled_projection_dim), jnp.bfloat16)
    out, skips = run(params, lat, enc, pooled, cos, sin)
    # on-device skip counter: step 0 is forced compute, so 0 <= skips < N
    assert 0 <= int(skips) < STEPS
    assert out.shape == (1, ht * wt, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_sd3_denoiser_cfg():
    from fastdm_tpu.models.sd35 import SD3Config, sd3_cropped_pos_embed, sd3_init_random
    from fastdm_tpu.pipeline.denoise_more import make_sd3_denoiser

    cfg = SD3Config(sample_size=8, patch_size=2, in_channels=4, out_channels=4,
                    num_layers=2, attention_head_dim=8, num_attention_heads=2,
                    joint_attention_dim=16, caption_projection_dim=16,
                    pooled_projection_dim=12, pos_embed_max_size=16,
                    num_dual_layers=1, quant="int8")
    params = sd3_init_random(jax.random.key(0), cfg)
    sched = FlowMatchEulerScheduler.create(STEPS, shift=3.0)
    run = make_sd3_denoiser(cfg, sched, STEPS, guidance_scale=5.0)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 8, 8), jnp.float32)
    emb = jax.random.normal(k, (2, 6, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(k, (2, cfg.pooled_projection_dim), jnp.bfloat16)
    pos = sd3_cropped_pos_embed(cfg, None, 8, 8)
    out, _ = run(params, lat, emb, pooled, pos)
    assert out.shape == (1, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_sdxl_denoiser_cfg():
    from fastdm_tpu.models.sdxl import SDXLConfig, sdxl_init_random
    from fastdm_tpu.pipeline.denoise_more import make_sdxl_denoiser

    cfg = SDXLConfig(block_channels=(8, 16, 32), cross_attention_dim=16,
                     attn_layers=(0, 1, 1), head_dim=8, addition_time_embed_dim=4,
                     time_embed_dim=16, add_embedding_in_dim=8 + 24,
                     norm_groups=4, quant="int8")
    params = sdxl_init_random(jax.random.key(0), cfg)
    sched = EulerDiscreteScheduler.create(STEPS)
    run = make_sdxl_denoiser(cfg, sched, STEPS, guidance_scale=5.0)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 32, 32), jnp.float32) * sched.init_noise_sigma
    emb = jax.random.normal(k, (2, 6, cfg.cross_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(k, (2, 8), jnp.bfloat16)
    tids = jnp.zeros((2, 6), jnp.float32)
    out, _ = run(params, lat, emb, pooled, tids)
    assert out.shape == (1, 4, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_wan_denoiser_dual_expert_and_sparse_warmup():
    from fastdm_tpu.models.wan import WanConfig, wan_init_random, wan_rope_cos_sin
    from fastdm_tpu.pipeline.denoise_more import make_wan_denoiser

    cfg = WanConfig(num_attention_heads=2, attention_head_dim=24, in_channels=4,
                    out_channels=4, text_dim=16, freq_dim=8, ffn_dim=32,
                    num_layers=2, text_len=4, quant="int8", dense_layers=1)
    p1 = wan_init_random(jax.random.key(0), cfg)
    p2 = wan_init_random(jax.random.key(1), cfg)
    sched = FlowMatchEulerScheduler.create(4, shift=5.0)
    run = make_wan_denoiser(cfg, sched, 4, guidance_scale=2.0,
                            boundary_ratio=0.9, dense_warmup_steps=2)
    k = jax.random.key(2)
    lat = jax.random.normal(k, (1, 4, 2, 16, 16), jnp.float32)
    pos = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    neg = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(cfg, 2, 16, 16)
    seq = 2 * 8 * 8
    nb = -(-seq // 128)
    mask = jnp.ones((1, cfg.num_attention_heads, nb, nb), jnp.int32)
    out, _ = run(p1, p2, lat, pos, neg, cos, sin, mask)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()


def test_sd3_denoiser_with_fbcache():
    from fastdm_tpu.caching.config import FBCacheConfig
    from fastdm_tpu.models.sd35 import SD3Config, sd3_cropped_pos_embed, sd3_init_random
    from fastdm_tpu.pipeline.denoise_more import make_sd3_denoiser

    cfg = SD3Config(sample_size=8, patch_size=2, in_channels=4, out_channels=4,
                    num_layers=4, attention_head_dim=8, num_attention_heads=2,
                    joint_attention_dim=16, caption_projection_dim=16,
                    pooled_projection_dim=12, pos_embed_max_size=16,
                    num_dual_layers=2, quant="int8")
    params = sd3_init_random(jax.random.key(0), cfg)
    cache = FBCacheConfig(cache_algorithm="fbcache", enable_caching=True,
                          threshold=10.0, warmup_steps=1)
    sched = FlowMatchEulerScheduler.create(STEPS, shift=3.0)
    run = make_sd3_denoiser(cfg, sched, STEPS, 5.0, cache)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 8, 8), jnp.float32)
    emb = jax.random.normal(k, (2, 6, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(k, (2, cfg.pooled_projection_dim), jnp.bfloat16)
    pos = sd3_cropped_pos_embed(cfg, None, 8, 8)
    out, _ = run(params, lat, emb, pooled, pos)
    assert np.isfinite(np.asarray(out)).all()


def test_qwen_denoiser_with_teacache_dual_stream():
    from fastdm_tpu.caching.config import TeaCacheConfig
    from fastdm_tpu.models.qwenimage import (
        QwenImageConfig, qwen_init_random, qwen_rope_cos_sin,
    )
    from fastdm_tpu.pipeline.denoise_more import make_qwen_denoiser

    # packed latents: in_channels = patch_size^2 * out_channels
    cfg = QwenImageConfig(num_layers=2, attention_head_dim=16,
                          num_attention_heads=2, joint_attention_dim=24,
                          in_channels=8, out_channels=2,
                          axes_dims_rope=(4, 6, 6), quant="int8")
    params = qwen_init_random(jax.random.key(0), cfg)
    cache = TeaCacheConfig(cache_algorithm="teacache", enable_caching=True,
                           threshold=0.3, coefficients=(1.0, 0.0),
                           negtive_cache=True)
    sched = FlowMatchEulerScheduler.create(STEPS, shift=1.0)
    run = make_qwen_denoiser(cfg, sched, STEPS, true_cfg_scale=3.0, cache_cfg=cache)
    ht = wt = 4
    cos, sin = qwen_rope_cos_sin(cfg, 1, ht, wt, 6)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, ht * wt, cfg.in_channels), jnp.float32)
    pos = jax.random.normal(k, (1, 6, cfg.joint_attention_dim), jnp.bfloat16)
    neg = jax.random.normal(jax.random.key(9), (1, 6, cfg.joint_attention_dim), jnp.bfloat16)
    out, _ = run(params, lat, pos, neg, cos, sin)
    assert np.isfinite(np.asarray(out)).all()


def test_wan_cached_denoiser():
    from fastdm_tpu.caching.config import FBCacheConfig
    from fastdm_tpu.models.wan import WanConfig, wan_init_random, wan_rope_cos_sin
    from fastdm_tpu.pipeline.denoise_more import make_wan_cached_denoiser

    cfg = WanConfig(num_attention_heads=2, attention_head_dim=24, in_channels=4,
                    out_channels=4, text_dim=16, freq_dim=8, ffn_dim=32,
                    num_layers=2, text_len=4, quant="int8")
    params = wan_init_random(jax.random.key(0), cfg)
    cache = FBCacheConfig(cache_algorithm="fbcache", enable_caching=True,
                          threshold=10.0, warmup_steps=1, negtive_cache=True)
    sched = FlowMatchEulerScheduler.create(STEPS, shift=5.0)
    run = make_wan_cached_denoiser(cfg, sched, STEPS, cache, guidance_scale=2.0)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 2, 16, 16), jnp.float32)
    pos = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    neg = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(cfg, 2, 16, 16)
    out, _ = run(params, lat, pos, neg, cos, sin, None)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()


def test_wan_ti2v_denoiser_pins_conditioning_frame():
    from fastdm_tpu.models.wan import WanConfig, wan_init_random, wan_rope_cos_sin
    from fastdm_tpu.pipeline.denoise_more import make_wan_ti2v_denoiser

    cfg = WanConfig(num_attention_heads=2, attention_head_dim=24, in_channels=4,
                    out_channels=4, text_dim=32, freq_dim=16, ffn_dim=64,
                    num_layers=2, text_len=8, per_token_timestep=True,
                    quant="int8")
    params = wan_init_random(jax.random.key(0), cfg)
    sched = FlowMatchEulerScheduler.create(2, shift=1.0)
    run = make_wan_ti2v_denoiser(cfg, sched, 2, guidance_scale=5.0)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 4, 8, 8), jnp.float32)
    cond = jax.random.normal(jax.random.key(2), (1, 4, 1, 8, 8), jnp.float32)
    pos = jax.random.normal(k, (1, 8, cfg.text_dim), jnp.bfloat16)
    neg = jax.random.normal(jax.random.key(3), pos.shape, jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(cfg, 4, 8, 8)
    out, _ = run(params, lat.copy(), cond, pos, neg, cos, sin)
    assert out.shape == (1, 4, 4, 8, 8)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # frame 0 stays exactly the conditioning latent
    np.testing.assert_array_equal(np.asarray(out[:, :, :1], np.float32),
                                  np.asarray(cond, np.float32))
    # a different conditioning frame steers the generated frames
    cond2 = -cond
    out2, _ = run(params, lat.copy(), cond2, pos, neg, cos, sin)
    assert np.abs(np.asarray(out[:, :, 1:] - out2[:, :, 1:], np.float32)).max() > 1e-5


def test_wan_dual_cached_denoiser():
    """A14B-style dual expert WITH caching: per-expert per-branch cache
    states, boundary switch, i2v conditioning channels."""
    from fastdm_tpu.caching.config import FBCacheConfig
    from fastdm_tpu.models.wan import WanConfig, wan_init_random, wan_rope_cos_sin
    from fastdm_tpu.pipeline.denoise_more import (
        make_wan_denoiser, make_wan_dual_cached_denoiser,
    )

    cfg = WanConfig(num_attention_heads=2, attention_head_dim=24, in_channels=4,
                    out_channels=4, text_dim=16, freq_dim=8, ffn_dim=32,
                    num_layers=2, text_len=4, quant="int8")
    p1 = wan_init_random(jax.random.key(0), cfg)
    p2 = wan_init_random(jax.random.key(7), cfg)
    sched = FlowMatchEulerScheduler.create(4, shift=5.0)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 2, 16, 16), jnp.float32)
    pos = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    neg = jax.random.normal(jax.random.key(3), (1, cfg.text_len, cfg.text_dim),
                            jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(cfg, 2, 16, 16)

    # threshold 0 -> never skip: cached dual must match the uncached dual loop
    never = FBCacheConfig(cache_algorithm="fbcache", enable_caching=True,
                          threshold=0.0, warmup_steps=0, negtive_cache=True)
    run_c = make_wan_dual_cached_denoiser(cfg, sched, 4, never,
                                          guidance_scale=2.0, boundary_ratio=0.5)
    out_c, skips = run_c(p1, p2, jnp.array(lat), pos, neg, cos, sin, None)
    run_u = make_wan_denoiser(cfg, sched, 4, guidance_scale=2.0,
                              boundary_ratio=0.5)
    out_u, _ = run_u(p1, p2, jnp.array(lat), pos, neg, cos, sin, None)
    assert int(np.asarray(skips)) == 0
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_u), atol=2e-2)

    # huge threshold -> skips happen on both experts (warmup 1 forces step-0
    # compute per state; later steps replay residuals)
    always = FBCacheConfig(cache_algorithm="fbcache", enable_caching=True,
                           threshold=100.0, warmup_steps=1, negtive_cache=True)
    run_s = make_wan_dual_cached_denoiser(cfg, sched, 4, always,
                                          guidance_scale=2.0, boundary_ratio=0.5)
    out_s, skips_s = run_s(p1, p2, jnp.array(lat), pos, neg, cos, sin, None)
    assert int(np.asarray(skips_s)) > 0
    assert np.isfinite(np.asarray(out_s)).all()


def test_wan_cached_denoiser_with_i2v_cond():
    """Single-expert cached loop accepts the i2v conditioning channels."""
    from fastdm_tpu.caching.config import FBCacheConfig
    from fastdm_tpu.models.wan import WanConfig, wan_init_random, wan_rope_cos_sin
    from fastdm_tpu.pipeline.denoise_more import make_wan_cached_denoiser

    # i2v: model in_channels = latent 4 + 4 conditioning channels
    cfg = WanConfig(num_attention_heads=2, attention_head_dim=24, in_channels=8,
                    out_channels=4, text_dim=16, freq_dim=8, ffn_dim=32,
                    num_layers=2, text_len=4, quant="int8")
    params = wan_init_random(jax.random.key(0), cfg)
    cache = FBCacheConfig(cache_algorithm="fbcache", enable_caching=True,
                          threshold=10.0, warmup_steps=1, negtive_cache=True)
    sched = FlowMatchEulerScheduler.create(3, shift=5.0)
    run = make_wan_cached_denoiser(cfg, sched, 3, cache, guidance_scale=2.0)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 2, 16, 16), jnp.float32)
    cond = jax.random.normal(jax.random.key(5), (1, 4, 2, 16, 16), jnp.float32)
    pos = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    neg = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(cfg, 2, 16, 16)
    out, _ = run(params, lat, pos, neg, cos, sin, None, cond)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()


def test_flux_i2i_cache_steps_are_loop_relative():
    """Regression: with start_step > 0 (img2img) the cache must count steps
    from the loop start — the reference reads scheduler.step_index, which
    restarts at 0 for the truncated schedule. With absolute steps, TeaCache's
    forced first compute never fires and a negative-leading polynomial sends
    the accumulator to -inf (every step skips a zeroed residual)."""
    from fastdm_tpu.caching.config import TeaCacheConfig
    from fastdm_tpu.models.flux import FluxConfig, flux_init_random, flux_rope_cache
    from fastdm_tpu.pipeline.denoise import make_flux_denoiser

    cfg = FluxConfig(num_layers=1, num_single_layers=1, attention_head_dim=32,
                     num_attention_heads=2, joint_attention_dim=32,
                     pooled_projection_dim=16, in_channels=8, out_channels=8,
                     axes_dims_rope=(8, 12, 12), quant="int8")
    params = flux_init_random(jax.random.key(0), cfg)
    # negative leading coefficient (the published Wan polynomial's shape):
    # rel-L1 vs the zeroed prev_probe would accumulate hugely negative
    cache = TeaCacheConfig(cache_algorithm="teacache", enable_caching=True,
                           threshold=0.05, coefficients=(-100.0, 0.0))
    steps = 4
    sched = FlowMatchEulerScheduler.create(steps, shift=1.0)
    run = make_flux_denoiser(cfg, sched, steps, cache, guidance_scale=3.5,
                             start_step=1)
    ht = wt = 4
    cos, sin = flux_rope_cache(cfg, 8, ht, wt)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, ht * wt, cfg.in_channels), jnp.float32)
    enc = jax.random.normal(k, (1, 8, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(k, (1, cfg.pooled_projection_dim), jnp.bfloat16)
    out, skips = run(params, lat, enc, pooled, cos, sin)
    # loop runs steps 1..3 = 3 iterations; the FIRST must be a forced compute
    assert int(skips) <= 2, f"no forced compute in the i2i loop (skips={int(skips)})"
    assert np.isfinite(np.asarray(out)).all()


def test_wan_dual_phase_matches_cond_form():
    """Phase-split A14B loop (engine default; one jitted scan per expert, so
    the inactive expert need not be device-resident) computes the SAME
    function as the per-step lax.cond dual loop, cached and uncached."""
    from fastdm_tpu.caching.config import FBCacheConfig
    from fastdm_tpu.models.wan import WanConfig, wan_init_random, wan_rope_cos_sin
    from fastdm_tpu.pipeline.denoise_more import (
        make_wan_denoiser,
        make_wan_dual_cached_denoiser,
        make_wan_dual_phase_denoiser,
    )

    cfg = WanConfig(num_attention_heads=2, attention_head_dim=24, in_channels=4,
                    out_channels=4, text_dim=16, freq_dim=8, ffn_dim=32,
                    num_layers=2, text_len=4, quant="int8")
    p1 = wan_init_random(jax.random.key(0), cfg)
    p2 = wan_init_random(jax.random.key(7), cfg)
    sched = FlowMatchEulerScheduler.create(4, shift=5.0)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 2, 16, 16), jnp.float32)
    pos = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    neg = jax.random.normal(jax.random.key(3), (1, cfg.text_len, cfg.text_dim),
                            jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(cfg, 2, 16, 16)

    # uncached: phase vs the cond-form dual loop
    run_p = make_wan_dual_phase_denoiser(cfg, sched, 4, None,
                                         guidance_scale=2.0,
                                         guidance_scale_2=None,
                                         boundary_ratio=0.5)
    out_p, skips = run_p(p1, p2, jnp.array(lat), pos, neg, cos, sin, None)
    run_u = make_wan_denoiser(cfg, sched, 4, guidance_scale=2.0,
                              boundary_ratio=0.5)
    out_u, _ = run_u(p1, p2, jnp.array(lat), pos, neg, cos, sin, None)
    assert int(np.asarray(skips)) == 0
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                               atol=1e-4, rtol=1e-4)

    # cached with skips firing: phase vs cond form, same skip count
    always = FBCacheConfig(cache_algorithm="fbcache", enable_caching=True,
                           threshold=100.0, warmup_steps=1, negtive_cache=True)
    run_pc = make_wan_dual_phase_denoiser(cfg, sched, 4, always,
                                          guidance_scale=2.0,
                                          guidance_scale_2=None,
                                          boundary_ratio=0.5)
    out_pc, sk_p = run_pc(p1, p2, jnp.array(lat), pos, neg, cos, sin, None)
    run_cc = make_wan_dual_cached_denoiser(cfg, sched, 4, always,
                                           guidance_scale=2.0,
                                           boundary_ratio=0.5)
    out_cc, sk_c = run_cc(p1, p2, jnp.array(lat), pos, neg, cos, sin, None)
    assert int(np.asarray(sk_p)) == int(np.asarray(sk_c)) > 0
    np.testing.assert_allclose(np.asarray(out_pc), np.asarray(out_cc),
                               atol=1e-4, rtol=1e-4)

    # one-sided boundary (all steps on expert 1): still runs, matches cond
    run_p1 = make_wan_dual_phase_denoiser(cfg, sched, 4, None,
                                          guidance_scale=2.0,
                                          guidance_scale_2=None,
                                          boundary_ratio=0.0)
    out_p1, _ = run_p1(p1, p2, jnp.array(lat), pos, neg, cos, sin, None)
    run_u1 = make_wan_denoiser(cfg, sched, 4, guidance_scale=2.0,
                               boundary_ratio=0.0)
    out_u1, _ = run_u1(p1, p2, jnp.array(lat), pos, neg, cos, sin, None)
    np.testing.assert_allclose(np.asarray(out_p1), np.asarray(out_u1),
                               atol=1e-4, rtol=1e-4)


def test_wan_denoiser_warmup_clamped_past_num_steps():
    """dense_warmup_steps > num_steps must be clamped, not scan past the
    sigma ladder — unclamped, UniPC's corrector hits sig==sig_prev==0 and
    divides 0/0 -> NaN video (review finding, round 2)."""
    from fastdm_tpu.models.wan import WanConfig, wan_init_random, wan_rope_cos_sin
    from fastdm_tpu.pipeline.denoise_more import make_wan_denoiser
    from fastdm_tpu.pipeline.schedulers import UniPCMultistepScheduler

    cfg = WanConfig(num_attention_heads=2, attention_head_dim=24, in_channels=4,
                    out_channels=4, text_dim=16, freq_dim=8, ffn_dim=32,
                    num_layers=2, text_len=4, quant=None)
    p = wan_init_random(jax.random.key(0), cfg)
    sched = UniPCMultistepScheduler.create(3, shift=5.0)
    run = make_wan_denoiser(cfg, sched, 3, guidance_scale=2.0,
                            dense_warmup_steps=12)  # > num_steps
    k = jax.random.key(2)
    lat = jax.random.normal(k, (1, 4, 2, 16, 16), jnp.float32)
    pos = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    neg = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(cfg, 2, 16, 16)
    seq = 2 * 8 * 8
    nb = -(-seq // 128)
    mask = jnp.ones((1, cfg.num_attention_heads, nb, nb), jnp.int32)
    out, _ = run(p, None, lat, pos, neg, cos, sin, mask)
    assert np.isfinite(np.asarray(out)).all()


def test_wan_cached_segmented_matches_single_program():
    """segment_steps=N (host-threaded program split, built for runtimes with
    per-execution wall-time bounds — the axon tunnel kills executions at
    ~60 s) computes the SAME function as the one-program scan form, including
    cache-skip behavior, odd tail segments, and the dense-warmup cut."""
    from fastdm_tpu.caching.config import FBCacheConfig
    from fastdm_tpu.models.wan import WanConfig, wan_init_random, wan_rope_cos_sin
    from fastdm_tpu.pipeline.denoise_more import make_wan_cached_denoiser
    from fastdm_tpu.pipeline.schedulers import UniPCMultistepScheduler

    cfg = WanConfig(num_attention_heads=2, attention_head_dim=24, in_channels=4,
                    out_channels=4, text_dim=16, freq_dim=8, ffn_dim=32,
                    num_layers=2, text_len=4, quant="int8")
    p = wan_init_random(jax.random.key(0), cfg)
    steps = 5
    sched = UniPCMultistepScheduler.create(steps, shift=5.0)
    cache = FBCacheConfig(cache_algorithm="fbcache", enable_caching=True,
                          threshold=100.0, warmup_steps=1, negtive_cache=True)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 2, 16, 16), jnp.float32)
    pos = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    neg = jax.random.normal(jax.random.key(3), (1, cfg.text_len, cfg.text_dim),
                            jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(cfg, 2, 16, 16)

    run1 = make_wan_cached_denoiser(cfg, sched, steps, cache,
                                    guidance_scale=2.0)
    out1, sk1 = run1(p, jnp.array(lat), pos, neg, cos, sin, None)
    # segment 2 over 5 steps -> programs of 2, 2, 1 (odd tail)
    run2 = make_wan_cached_denoiser(cfg, sched, steps, cache,
                                    guidance_scale=2.0, segment_steps=2)
    out2, sk2 = run2(p, jnp.array(lat), pos, neg, cos, sin, None)
    assert int(np.asarray(sk1)) == int(np.asarray(sk2)) > 0
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-4, rtol=1e-4)


def test_wan_dual_host_matches_phase_form():
    """Host-stepped A14B loop (per-CFG-branch jitted programs; the form the
    a14b e2e measurement uses under the tunnel's per-execution deadline)
    computes the SAME function as the phase-split scan form, cached and
    uncached, including per-expert-per-branch cache state scoping."""
    from fastdm_tpu.caching.config import FBCacheConfig
    from fastdm_tpu.models.wan import WanConfig, wan_init_random, wan_rope_cos_sin
    from fastdm_tpu.pipeline.denoise_more import (
        make_wan_dual_host_denoiser,
        make_wan_dual_phase_denoiser,
    )
    from fastdm_tpu.pipeline.schedulers import UniPCMultistepScheduler

    cfg = WanConfig(num_attention_heads=2, attention_head_dim=24, in_channels=4,
                    out_channels=4, text_dim=16, freq_dim=8, ffn_dim=32,
                    num_layers=2, text_len=4, quant="int8")
    p1 = wan_init_random(jax.random.key(0), cfg)
    p2 = wan_init_random(jax.random.key(7), cfg)
    steps = 4
    sched = UniPCMultistepScheduler.create(steps, shift=5.0)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 2, 16, 16), jnp.float32)
    pos = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    neg = jax.random.normal(jax.random.key(3), (1, cfg.text_len, cfg.text_dim),
                            jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(cfg, 2, 16, 16)

    for cache in (None,
                  FBCacheConfig(cache_algorithm="fbcache", enable_caching=True,
                                threshold=100.0, warmup_steps=1,
                                negtive_cache=True)):
        run_p = make_wan_dual_phase_denoiser(
            cfg, sched, steps, cache, guidance_scale=2.0,
            guidance_scale_2=3.0, boundary_ratio=0.5)
        out_p, sk_p = run_p(p1, p2, jnp.array(lat), pos, neg, cos, sin, None)
        run_h = make_wan_dual_host_denoiser(
            cfg, sched, steps, cache, guidance_scale=2.0,
            guidance_scale_2=3.0, boundary_ratio=0.5)
        out_h, sk_h = run_h(p1, p2, jnp.array(lat), pos, neg, cos, sin, None)
        assert int(np.asarray(sk_p)) == int(np.asarray(sk_h))
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_h),
                                   atol=1e-4, rtol=1e-4)

    # offload composition: place_params materializes per phase; host masters
    cpu = jax.devices()[0]
    run_o = make_wan_dual_host_denoiser(
        cfg, sched, steps, None, guidance_scale=2.0, guidance_scale_2=None,
        boundary_ratio=0.5, place_params=lambda t: jax.device_put(t, cpu))
    out_o, _ = run_o(p1, p2, jnp.array(lat), pos, neg, cos, sin, None)
    run_u = make_wan_dual_phase_denoiser(
        cfg, sched, steps, None, guidance_scale=2.0, guidance_scale_2=None,
        boundary_ratio=0.5)
    out_u, _ = run_u(p1, p2, jnp.array(lat), pos, neg, cos, sin, None)
    np.testing.assert_allclose(np.asarray(out_o), np.asarray(out_u),
                               atol=1e-4, rtol=1e-4)


def test_offload_placer_moves_cpu_committed_params():
    """Regression for the r4/r5 A14B OOM: bare jax.device_put(x) is a NO-OP
    on a committed array, so the offload placer left both experts on the
    CPU and every branch call silently re-transferred 7.25 GiB (leaking
    host staging + stacking device copies). The engine's placer must pass
    an explicit target device."""
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    assert len(devs) >= 2, "conftest provides an 8-device CPU mesh"
    x = jax.device_put(jnp.ones((4,)), devs[3])
    assert x.devices() == {devs[3]}
    assert jax.device_put(x).devices() == {devs[3]}  # the buggy no-op form
    place = lambda p: jax.device_put(p, jax.devices()[0])  # engine's form
    assert place(x).devices() == {devs[0]}
