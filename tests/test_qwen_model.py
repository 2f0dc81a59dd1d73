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
