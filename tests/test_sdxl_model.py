"""SDXL UNet core tests (tiny config): shapes, skip bookkeeping, ControlNet add."""

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.models.sdxl import SDXLConfig, sdxl_forward, sdxl_init_random

TINY = SDXLConfig(
    block_channels=(8, 16, 32),
    cross_attention_dim=16,
    attn_layers=(0, 1, 2),
    head_dim=8,
    addition_time_embed_dim=4,
    time_embed_dim=16,
    add_embedding_in_dim=8 + 6 * 4,  # pooled 8 + 6 time-ids * 4
    norm_groups=4,
    quant="int8",
)


def _inputs(b=1, h=32, w=32):
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.standard_normal((b, 4, h, w)), jnp.float32)
    t = jnp.full((b,), 500.0, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 12, TINY.cross_attention_dim)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((b, 8)), jnp.bfloat16)
    time_ids = jnp.asarray(np.tile([h, w, 0, 0, h, w], (b, 1)), jnp.float32)
    return sample, t, ctx, pooled, time_ids


def test_sdxl_forward_shape():
    params = sdxl_init_random(jax.random.key(0), TINY)
    sample, t, ctx, pooled, time_ids = _inputs()
    fwd = jax.jit(sdxl_forward, static_argnames="cfg")
    out = fwd(params, TINY, sample, t, ctx, pooled, time_ids)
    assert out.shape == sample.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_sdxl_controlnet_residual_changes_output():
    params = sdxl_init_random(jax.random.key(0), TINY)
    sample, t, ctx, pooled, time_ids = _inputs()
    out0 = sdxl_forward(params, TINY, sample, t, ctx, pooled, time_ids)

    # 9 down-block skips: s0 + 3 per down block stage (ref: sdxl.py:411-434)
    c0, c1, c2 = TINY.block_channels
    shapes = [
        (1, 32, 32, c0), (1, 32, 32, c0), (1, 32, 32, c0), (1, 16, 16, c0),
        (1, 16, 16, c1), (1, 16, 16, c1), (1, 8, 8, c1),
        (1, 8, 8, c2), (1, 8, 8, c2),
    ]
    res = [jnp.ones(s, jnp.float32) * 0.1 for s in shapes]
    mid = jnp.ones((1, 8, 8, c2), jnp.float32) * 0.1
    out1 = sdxl_forward(
        params, TINY, sample, t, ctx, pooled, time_ids,
        down_block_additional_residuals=res, mid_block_additional_residual=mid,
    )
    assert np.abs(np.asarray(out1 - out0, np.float32)).max() > 1e-4


def test_sdxl_ip_adapter_attach_and_denoise():
    """IP-Adapter checkpoint attach (official proc-index layout) + denoise:
    image tokens steer the output; ip_adapter_scale=0 reproduces baseline."""
    import dataclasses

    from fastdm_tpu.models.loader import TensorSource
    from fastdm_tpu.models.sdxl import sdxl_attach_ip_adapter
    from fastdm_tpu.pipeline.denoise_more import make_sdxl_denoiser
    from fastdm_tpu.pipeline.schedulers import EulerDiscreteScheduler

    rng = np.random.default_rng(0)
    c0, c1, c2 = TINY.block_channels
    ctx = TINY.cross_attention_dim
    embed_dim = 24
    num_tokens = 4

    sd = {}
    idx = 0
    # traversal mirrors diffusers attn_processors registration order:
    # down1(2 t2d x n1), down2(2 x n2), up0(3 x n2), up1(3 x n1),
    # MID LAST (1 x n2) — UNet2DConditionModel registers mid_block after
    # both block ModuleLists
    n1, n2 = TINY.attn_layers[1], TINY.attn_layers[2]
    for ch, n_layers, count in ((c1, n1, 2), (c2, n2, 2), (c2, n2, 3),
                                (c1, n1, 3), (c2, n2, 1)):
        for _ in range(count):
            for _ in range(n_layers):
                idx += 1
                sd[f"ip_adapter.{idx}.to_k_ip.weight"] = (
                    rng.standard_normal((ch, ctx)).astype(np.float32) * 0.1)
                sd[f"ip_adapter.{idx}.to_v_ip.weight"] = (
                    rng.standard_normal((ch, ctx)).astype(np.float32) * 0.1)
                idx += 1
    sd["image_proj.proj.weight"] = rng.standard_normal(
        (num_tokens * ctx, embed_dim)).astype(np.float32) * 0.1
    sd["image_proj.proj.bias"] = rng.standard_normal(
        (num_tokens * ctx,)).astype(np.float32) * 0.02
    sd["image_proj.norm.weight"] = np.ones(ctx, np.float32)
    sd["image_proj.norm.bias"] = np.zeros(ctx, np.float32)

    params = sdxl_init_random(jax.random.key(0), TINY)
    proj = sdxl_attach_ip_adapter(params, TensorSource(sd), TINY)
    assert proj["num_tokens"] == num_tokens

    from fastdm_tpu.layers.ip_adapter import image_projection_apply

    img_emb = jnp.asarray(rng.standard_normal((1, embed_dim)), jnp.bfloat16)
    tokens = image_projection_apply(
        {k: proj[k] for k in ("proj", "norm")}, img_emb, num_tokens)
    assert tokens.shape == (1, num_tokens, ctx)
    ip_embeds = jnp.concatenate([jnp.zeros_like(tokens), tokens])

    sched = EulerDiscreteScheduler.create(2)
    h = w = 16
    k = jax.random.key(2)
    lat = jax.random.normal(k, (1, 4, h, w), jnp.float32) * sched.init_noise_sigma
    emb = jax.random.normal(k, (2, 6, ctx), jnp.bfloat16)
    pooled = jax.random.normal(k, (2, 8), jnp.bfloat16)
    tids = jnp.asarray(np.tile([h * 8, w * 8, 0, 0, h * 8, w * 8], (2, 1)), jnp.float32)

    run = make_sdxl_denoiser(TINY, sched, 2, guidance_scale=5.0)
    out_ip, _ = run(params, lat.copy(), emb, pooled, tids, ip_embeds)
    out_base, _ = run(params, lat.copy(), emb, pooled, tids, None)
    assert np.isfinite(np.asarray(out_ip, np.float32)).all()
    assert np.abs(np.asarray(out_ip - out_base, np.float32)).max() > 1e-5

    # scale 0: adapter branch contributes exactly nothing
    cfg0 = dataclasses.replace(TINY, ip_adapter_scale=0.0)
    run0 = make_sdxl_denoiser(cfg0, sched, 2, guidance_scale=5.0)
    out0, _ = run0(params, lat.copy(), emb, pooled, tids, ip_embeds)
    assert np.abs(np.asarray(out0 - out_base, np.float32)).max() == 0.0
