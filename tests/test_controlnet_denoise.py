"""ControlNet denoise loops (tiny configs): the CN trunk runs inside the
jitted scan and its residuals change the output vs the plain loop."""

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.pipeline.schedulers import (
    EulerDiscreteScheduler,
    FlowMatchEulerScheduler,
)

STEPS = 2


def _flux_cfgs():
    from fastdm_tpu.models.controlnets import FluxControlNetConfig
    from fastdm_tpu.models.flux import FluxConfig

    kw = dict(attention_head_dim=32, num_attention_heads=2,
              joint_attention_dim=32, pooled_projection_dim=16,
              in_channels=8, out_channels=8, axes_dims_rope=(8, 12, 12),
              quant="int8")
    base = FluxConfig(num_layers=2, num_single_layers=2, **kw)
    cn = FluxControlNetConfig(num_layers=1, num_single_layers=1,
                              guidance_embeds=False, **kw)
    return base, cn


def test_flux_cn_denoiser_residuals_change_output():
    from fastdm_tpu.models.controlnets import flux_controlnet_init_random
    from fastdm_tpu.models.flux import flux_init_random, flux_rope_cache
    from fastdm_tpu.pipeline.denoise import make_flux_cn_denoiser, make_flux_denoiser

    cfg, cn_cfg = _flux_cfgs()
    params = flux_init_random(jax.random.key(0), cfg)
    cn_params = flux_controlnet_init_random(jax.random.key(1), cn_cfg)
    sched = FlowMatchEulerScheduler.create(STEPS, shift=1.0)
    ht = wt = 4
    cos, sin = flux_rope_cache(cfg, 8, ht, wt)
    k = jax.random.key(2)
    lat = jax.random.normal(k, (1, ht * wt, cfg.in_channels), jnp.float32)
    cnd = jax.random.normal(jax.random.key(3), lat.shape, jnp.float32)
    enc = jax.random.normal(k, (1, 8, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(k, (1, cfg.pooled_projection_dim), jnp.bfloat16)

    run_cn = make_flux_cn_denoiser(cfg, cn_cfg, sched, STEPS, guidance_scale=3.5,
                                   conditioning_scale=0.8)
    out_cn, _ = run_cn(params, cn_params, lat.copy(), cnd, enc, pooled, cos, sin)
    assert out_cn.shape == (1, ht * wt, cfg.in_channels)
    assert np.isfinite(np.asarray(out_cn, np.float32)).all()

    run0 = make_flux_denoiser(cfg, sched, STEPS, None, guidance_scale=3.5)
    out0, _ = run0(params, lat.copy(), enc, pooled, cos, sin)
    assert np.abs(np.asarray(out_cn - out0, np.float32)).max() > 1e-4


def test_flux_cn_union_mode_token():
    from fastdm_tpu.models.controlnets import flux_controlnet_init_random
    from fastdm_tpu.models.flux import flux_init_random, flux_rope_cache
    from fastdm_tpu.pipeline.denoise import make_flux_cn_denoiser

    cfg, cn_cfg = _flux_cfgs()
    params = flux_init_random(jax.random.key(0), cfg)
    cn_params = flux_controlnet_init_random(jax.random.key(1), cn_cfg)
    cn_params["controlnet_mode_embedder"] = 0.1 * jax.random.normal(
        jax.random.key(4), (10, cn_cfg.inner_dim), jnp.float32
    )
    sched = FlowMatchEulerScheduler.create(STEPS, shift=1.0)
    ht = wt = 4
    cos, sin = flux_rope_cache(cfg, 8, ht, wt)
    k = jax.random.key(2)
    lat = jax.random.normal(k, (1, ht * wt, cfg.in_channels), jnp.float32)
    cnd = jax.random.normal(jax.random.key(3), lat.shape, jnp.float32)
    enc = jax.random.normal(k, (1, 8, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(k, (1, cfg.pooled_projection_dim), jnp.bfloat16)

    outs = []
    for mode in (0, 1):
        run = make_flux_cn_denoiser(cfg, cn_cfg, sched, STEPS, control_mode=mode)
        outs.append(np.asarray(
            run(params, cn_params, lat.copy(), cnd, enc, pooled, cos, sin)[0], np.float32
        ))
    assert np.isfinite(outs[0]).all()
    # different union modes select different embedding rows -> different output
    assert np.abs(outs[0] - outs[1]).max() > 1e-5


def test_sdxl_cn_denoiser():
    from fastdm_tpu.models.controlnets import sdxl_controlnet_init_random
    from fastdm_tpu.models.sdxl import SDXLConfig, sdxl_init_random
    from fastdm_tpu.pipeline.denoise_more import (
        make_sdxl_cn_denoiser, make_sdxl_denoiser,
    )

    cfg = SDXLConfig(
        block_channels=(8, 16, 32), cross_attention_dim=16, attn_layers=(0, 1, 2),
        head_dim=8, addition_time_embed_dim=4, time_embed_dim=16,
        add_embedding_in_dim=8 + 6 * 4, norm_groups=4, quant="int8",
    )
    params = sdxl_init_random(jax.random.key(0), cfg)
    cn_params = sdxl_controlnet_init_random(jax.random.key(1), cfg,
                                            cond_channels=(4, 4, 8, 8))
    sched = EulerDiscreteScheduler.create(STEPS)
    h = w = 16
    k = jax.random.key(2)
    lat = jax.random.normal(k, (1, 4, h, w), jnp.float32) * sched.init_noise_sigma
    emb = jax.random.normal(k, (2, 6, cfg.cross_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(k, (2, 8), jnp.bfloat16)
    tids = jnp.asarray(np.tile([h * 8, w * 8, 0, 0, h * 8, w * 8], (2, 1)), jnp.float32)
    hint = jax.random.uniform(jax.random.key(3), (1, h * 8, w * 8, 3), jnp.float32)

    outs = {}
    for gm in (False, True):
        run = make_sdxl_cn_denoiser(cfg, sched, STEPS, guidance_scale=5.0,
                                    conditioning_scale=0.7, guess_mode=gm)
        outs[gm] = np.asarray(run(params, cn_params, lat.copy(), emb, pooled, tids, hint)[0],
                              np.float32)
        assert outs[gm].shape == (1, 4, h, w)
        assert np.isfinite(outs[gm]).all()

    run0 = make_sdxl_denoiser(cfg, sched, STEPS, guidance_scale=5.0)
    out0 = np.asarray(run0(params, lat.copy(), emb, pooled, tids)[0], np.float32)
    assert np.abs(outs[False] - out0).max() > 1e-4
    assert np.abs(outs[True] - outs[False]).max() > 1e-5
