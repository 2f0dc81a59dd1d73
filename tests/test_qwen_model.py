"""Qwen-Image core tests (tiny config): shapes + scale_rope cache semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.models.qwenimage import (
    QwenImageConfig,
    qwen_forward,
    qwen_init_random,
    qwen_rope_cos_sin,
)

TINY = QwenImageConfig(
    num_layers=2,
    attention_head_dim=32,
    num_attention_heads=4,
    joint_attention_dim=64,
    in_channels=16,
    out_channels=16,
    axes_dims_rope=(8, 12, 12),
)


def test_qwen_forward_shape():
    cfg = TINY
    params = qwen_init_random(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    ht, wt, txt = 4, 6, 10
    hidden = jnp.asarray(rng.standard_normal((1, ht * wt, cfg.in_channels)), jnp.bfloat16)
    encoder = jnp.asarray(rng.standard_normal((1, txt, cfg.joint_attention_dim)), jnp.bfloat16)
    t = jnp.full((1,), 0.4, jnp.float32)
    cos, sin = qwen_rope_cos_sin(cfg, 1, ht, wt, txt)
    assert cos.shape == (txt + ht * wt, cfg.attention_head_dim // 2)

    fwd = jax.jit(qwen_forward, static_argnames="cfg")
    out = fwd(params, cfg, hidden, encoder, t, cos, sin)
    assert out.shape == (1, ht * wt, cfg.patch_size**2 * cfg.out_channels)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_qwen_scale_rope_centering():
    """scale_rope gives H/W positions [-(n - n//2) .. n//2) and text offset by
    max(h//2, w//2) (ref: embeddings.py:829-835,846-851)."""
    cfg = TINY
    ht, wt, txt = 4, 6, 3
    cos, sin = qwen_rope_cos_sin(cfg, 1, ht, wt, txt)
    a1 = cfg.axes_dims_rope[0] // 2
    # text rows: frame-axis angles at positions max(h//2, w//2) + i
    offset = max(ht // 2, wt // 2)
    inv = 1.0 / 10000 ** (np.arange(0, cfg.axes_dims_rope[0], 2) / cfg.axes_dims_rope[0])
    expect = np.cos(np.outer(np.arange(offset, offset + txt), inv))
    np.testing.assert_allclose(np.asarray(cos[:txt, :a1]), expect, rtol=1e-5)
    # first img token: frame 0, h position -(ht - ht//2), w position -(wt - wt//2)
    a2 = cfg.axes_dims_rope[1] // 2
    inv_h = 1.0 / 10000 ** (np.arange(0, cfg.axes_dims_rope[1], 2) / cfg.axes_dims_rope[1])
    expect_h = np.sin(-(ht - ht // 2) * inv_h)
    np.testing.assert_allclose(np.asarray(sin[txt, a1 : a1 + a2]), expect_h, rtol=1e-5, atol=1e-7)


def test_qwen_rope_extra_shapes():
    """Edit-mode rope: entry i's frame position starts at i; txt offset uses
    the max over all entries."""
    cfg = TINY
    ht, wt, txt = 4, 6, 5
    cos, sin = qwen_rope_cos_sin(cfg, 1, ht, wt, txt, extra_shapes=((1, 8, 2),))
    assert cos.shape == (txt + ht * wt + 16, cfg.attention_head_dim // 2)
    # main-image rows must be identical to the single-image call
    cos1, _ = qwen_rope_cos_sin(cfg, 1, ht, wt, txt)
    np.testing.assert_allclose(
        np.asarray(cos)[txt : txt + ht * wt], np.asarray(cos1)[txt:], rtol=0, atol=0
    )
    # text offset: max(h//2, w//2) over entries = max(3, 4, 2) = 4 here;
    # bigger extra image shifts text rows vs the single-image variant
    cos2, _ = qwen_rope_cos_sin(cfg, 1, ht, wt, txt, extra_shapes=((1, 20, 2),))
    assert np.abs(np.asarray(cos2)[:txt] - np.asarray(cos1)[:txt]).max() > 0


def test_qwen_edit_denoiser():
    import dataclasses

    from fastdm_tpu.pipeline.denoise_more import make_qwen_edit_denoiser
    from fastdm_tpu.pipeline.schedulers import FlowMatchEulerScheduler

    # denoise loops need in_channels == patch^2 * out_channels (packed latents)
    cfg = dataclasses.replace(TINY, out_channels=4)
    params = qwen_init_random(jax.random.key(0), cfg)
    sched = FlowMatchEulerScheduler.create(2, shift=1.0)
    ht = wt = 4
    txt = 6
    cos, sin = qwen_rope_cos_sin(cfg, 1, ht, wt, txt, extra_shapes=((1, ht, wt),))
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, ht * wt, cfg.in_channels), jnp.float32)
    src = jax.random.normal(jax.random.key(2), lat.shape, jnp.float32)
    pos = jax.random.normal(k, (1, txt, cfg.joint_attention_dim), jnp.bfloat16)
    neg = jax.random.normal(jax.random.key(3), pos.shape, jnp.bfloat16)

    run = make_qwen_edit_denoiser(cfg, sched, 2, true_cfg_scale=3.0)
    out, _ = run(params, lat.copy(), src, pos, neg, cos, sin)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # a different source image must steer the result
    src2 = jax.random.normal(jax.random.key(4), lat.shape, jnp.float32)
    out2, _ = run(params, lat.copy(), src2, pos, neg, cos, sin)
    assert np.abs(np.asarray(out - out2, np.float32)).max() > 1e-5
