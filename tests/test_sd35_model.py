"""SD3.5 core model-level tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.models.sd35 import (
    SD3Config,
    sd3_cropped_pos_embed,
    sd3_forward,
    sd3_init_random,
)

TINY = SD3Config(
    sample_size=16,
    patch_size=2,
    in_channels=4,
    out_channels=4,
    num_layers=4,
    attention_head_dim=16,
    num_attention_heads=4,
    joint_attention_dim=32,
    caption_projection_dim=64,
    pooled_projection_dim=24,
    pos_embed_max_size=24,
    num_dual_layers=2,
    quant="int8",
)


def test_sd3_forward_shapes():
    cfg = TINY
    params = sd3_init_random(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    h, w = 16, 24
    latent = jnp.asarray(rng.standard_normal((1, cfg.in_channels, h, w)), jnp.bfloat16)
    encoder = jnp.asarray(rng.standard_normal((1, 20, cfg.joint_attention_dim)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_projection_dim)), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    pos = sd3_cropped_pos_embed(cfg, None, h, w)
    assert pos.shape == (1, (h // 2) * (w // 2), cfg.inner_dim)

    fwd = jax.jit(sd3_forward, static_argnames="cfg")
    out = fwd(params, cfg, latent, encoder, pooled, t, pos)
    assert out.shape == (1, cfg.out_channels, h, w)
    assert jnp.isfinite(out.astype(jnp.float32)).all()


def test_sd3_pos_embed_crop_is_centered():
    cfg = TINY
    full = sd3_cropped_pos_embed(cfg, None, cfg.pos_embed_max_size * 2, cfg.pos_embed_max_size * 2)
    # cropping the max size yields the full table
    assert full.shape[1] == cfg.pos_embed_max_size**2
    small = sd3_cropped_pos_embed(cfg, None, 8, 8)
    m, ht = cfg.pos_embed_max_size, 4
    top = left = (m - ht) // 2
    tbl = np.asarray(full).reshape(m, m, -1)
    np.testing.assert_allclose(
        np.asarray(small).reshape(ht, ht, -1), tbl[top : top + ht, left : left + ht]
    )


def test_sd3_dual_free_config_loads_and_runs():
    """num_dual_layers=0 (SD3.0-style, no dual attention) must init/run —
    stack_blocks([]) used to IndexError (review finding, round 2)."""
    import dataclasses

    cfg = dataclasses.replace(TINY, num_dual_layers=0)
    params = sd3_init_random(jax.random.key(1), cfg)
    assert params["dual_attn_blocks"] is None
    rng = np.random.default_rng(1)
    h, w = 16, 16
    latent = jnp.asarray(rng.standard_normal((1, cfg.in_channels, h, w)), jnp.bfloat16)
    encoder = jnp.asarray(rng.standard_normal((1, 8, cfg.joint_attention_dim)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_projection_dim)), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    pos = sd3_cropped_pos_embed(cfg, None, h, w)
    out = sd3_forward(params, cfg, latent, encoder, pooled, t, pos)
    assert out.shape == (1, cfg.out_channels, h, w)
    assert jnp.isfinite(out.astype(jnp.float32)).all()


def test_sd3_dicache_probe_spans_segments():
    """probe_depth > num_dual_layers: the probe must continue into the
    standard blocks — the old x[:depth] on the dual stack silently skipped
    blocks [nd, depth) on every compute step. With threshold=0 (never skip),
    the cached forward must equal the uncached one for ALL probe depths."""
    from fastdm_tpu.caching.config import DiCacheConfig
    from fastdm_tpu.caching.xcaching import cache_init_state
    from fastdm_tpu.models.sd35 import sd3_forward_cached

    cfg = TINY  # 4 layers, 2 dual
    params = sd3_init_random(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    h, w = 16, 16
    latent = jnp.asarray(rng.standard_normal((1, cfg.in_channels, h, w)), jnp.bfloat16)
    encoder = jnp.asarray(rng.standard_normal((1, 8, cfg.joint_attention_dim)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_projection_dim)), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    pos = sd3_cropped_pos_embed(cfg, None, h, w)
    ref = sd3_forward(params, cfg, latent, encoder, pooled, t, pos)
    n_tok = (h // 2) * (w // 2)
    for depth in (1, 3):  # within dual; spanning into std blocks
        ccfg = DiCacheConfig(cache_algorithm="dicache", enable_caching=True,
                             threshold=0.0, probe_depth=depth, ret_ratio=0.0)
        hshape = (1, n_tok, cfg.inner_dim)
        st = cache_init_state(ccfg, hshape, hshape)
        out, _ = sd3_forward_cached(
            params, cfg, ccfg, st, jnp.zeros((), jnp.int32), 4,
            latent, encoder, pooled, t, pos)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=1e-2, rtol=1e-2)
