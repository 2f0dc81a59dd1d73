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


def test_flux_cn_raw_image_hint_variant():
    """Raw-image-hint FLUX CN (input_hint_block conv stack): the forward
    takes the conditioning IMAGE; running the conv stack + the torch
    (c, ph, pw) pixel-unshuffle by hand and feeding the tokens through the
    latent path must give the identical output (packing-order equivalence;
    ref: fastdm/model/controlnets.py:960-970)."""
    from fastdm_tpu.models.controlnets import (
        controlnet_cond_embedding_apply,
        flux_controlnet_forward,
        flux_controlnet_init_random,
    )
    from fastdm_tpu.models.flux import flux_rope_cache
    import dataclasses as dc

    cfg, cn_cfg = _flux_cfgs()
    # hint stack output channels * ps^2 must equal controlnet_x_embedder's
    # in_features (= in_channels): 2 * 4 = 8
    cn_cfg = dc.replace(cn_cfg)
    cn_params = flux_controlnet_init_random(jax.random.key(5), cn_cfg)
    rng = np.random.default_rng(6)

    def conv(cin, cout):
        return {
            "w": jnp.asarray(rng.standard_normal((3, 3, cin, cout)),
                             jnp.bfloat16) * 0.1,
            "b": jnp.zeros((cout,), jnp.float32),
        }

    hint_params = {
        "conv_in": conv(3, 4),
        "blocks": [conv(4, 4), conv(4, 4)],   # stride 1, stride 2
        "conv_out": conv(4, 2),
    }
    ht = wt = 4
    cos, sin = flux_rope_cache(cfg, 8, ht, wt)
    # the denoise loop casts latents to bf16 before the CN forward
    # (pipeline/denoise.py make_flux_cn_denoiser body) — mirror that here
    lat = jax.random.normal(jax.random.key(7), (1, ht * wt, cfg.in_channels),
                            jnp.bfloat16)
    enc = jax.random.normal(jax.random.key(8), (1, 8, cfg.joint_attention_dim),
                            jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(9),
                               (1, cfg.pooled_projection_dim), jnp.bfloat16)
    t = jnp.full((1,), 0.5, jnp.float32)
    # image at 2x the (2x2-packed) token grid * hint stride 2 = 16x16 px
    img = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.bfloat16)

    cn_raw = dict(cn_params)
    cn_raw["input_hint_block"] = hint_params
    out_raw = flux_controlnet_forward(
        cn_raw, cn_cfg, lat, img, enc, pooled, t, cos, sin,
        conditioning_scale=0.7)

    # manual: conv stack -> (B, 8, 8, 2) -> ps=2 unshuffle (c, ph, pw) order
    hint = controlnet_cond_embedding_apply(hint_params, img)
    b, hp, wp, c = hint.shape
    manual = hint.reshape(b, hp // 2, 2, wp // 2, 2, c)
    manual = jnp.transpose(manual, (0, 1, 3, 5, 2, 4)).reshape(
        b, (hp // 2) * (wp // 2), c * 4)
    out_lat = flux_controlnet_forward(
        cn_params, cn_cfg, lat, manual, enc, pooled, t, cos, sin,
        conditioning_scale=0.7)
    for a, m in zip(out_raw, out_lat):
        if a is None:
            assert m is None
            continue
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(m, np.float32))


def test_flux_cn_loader_parses_input_hint_block():
    """Synthetic raw-hint checkpoint: input_hint_block conv stack is loaded
    (conv_in/blocks.N/conv_out) and drives the forward."""
    from fastdm_tpu.models.controlnets import flux_controlnet_load
    from fastdm_tpu.models.loader import TensorSource

    cfg, cn_cfg = _flux_cfgs()
    rng = np.random.default_rng(10)
    d = cn_cfg.inner_dim
    sd = {}

    def lin(name, cin, cout):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin)).astype(
            np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def conv(name, cin, cout):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin, 3, 3)).astype(
            np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)

    lin("x_embedder", cn_cfg.in_channels, d)
    lin("context_embedder", cn_cfg.joint_attention_dim, d)
    lin("controlnet_x_embedder", cn_cfg.in_channels, d)
    lin("time_text_embed.timestep_embedder.linear_1", 256, d)
    lin("time_text_embed.timestep_embedder.linear_2", d, d)
    lin("time_text_embed.text_embedder.linear_1", cn_cfg.pooled_projection_dim, d)
    lin("time_text_embed.text_embedder.linear_2", d, d)
    conv("input_hint_block.conv_in", 3, 4)
    conv("input_hint_block.blocks.0", 4, 4)
    conv("input_hint_block.blocks.1", 4, 4)
    conv("input_hint_block.conv_out", 4, 2)
    for i in range(cn_cfg.num_layers):
        p = f"transformer_blocks.{i}"
        lin(f"{p}.norm1.linear", d, 6 * d)
        lin(f"{p}.norm1_context.linear", d, 6 * d)
        sd[f"{p}.attn.norm_q.weight"] = np.ones((32,), np.float32)
        sd[f"{p}.attn.norm_k.weight"] = np.ones((32,), np.float32)
        sd[f"{p}.attn.norm_added_q.weight"] = np.ones((32,), np.float32)
        sd[f"{p}.attn.norm_added_k.weight"] = np.ones((32,), np.float32)
        for nm, cin, cout in (("attn.to_q", d, d), ("attn.to_k", d, d),
                              ("attn.to_v", d, d), ("attn.add_q_proj", d, d),
                              ("attn.add_k_proj", d, d), ("attn.add_v_proj", d, d),
                              ("attn.to_out.0", d, d), ("attn.to_add_out", d, d),
                              ("ff.net.0.proj", d, 4 * d), ("ff.net.2", 4 * d, d),
                              ("ff_context.net.0.proj", d, 4 * d),
                              ("ff_context.net.2", 4 * d, d)):
            lin(f"{p}.{nm}", cin, cout)
        lin(f"controlnet_blocks.{i}", d, d)
    for i in range(cn_cfg.num_single_layers):
        p = f"single_transformer_blocks.{i}"
        lin(f"{p}.norm.linear", d, 3 * d)
        sd[f"{p}.attn.norm_q.weight"] = np.ones((32,), np.float32)
        sd[f"{p}.attn.norm_k.weight"] = np.ones((32,), np.float32)
        lin(f"{p}.attn.to_q", d, d)
        lin(f"{p}.attn.to_k", d, d)
        lin(f"{p}.attn.to_v", d, d)
        lin(f"{p}.proj_mlp", d, 4 * d)
        lin(f"{p}.proj_out", 5 * d, d)
        lin(f"controlnet_single_blocks.{i}", d, d)
    params = flux_controlnet_load(TensorSource(sd), cn_cfg)
    assert "input_hint_block" in params
    assert len(params["input_hint_block"]["blocks"]) == 2
