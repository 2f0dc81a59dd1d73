"""Wan core tests (tiny config): t2v shapes, i2v image-KV branch, per-token temb."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdm_tpu.models.wan import (
    WanConfig,
    wan_forward,
    wan_init_random,
    wan_rope_cos_sin,
)

TINY = WanConfig(
    num_attention_heads=2,
    attention_head_dim=24,
    in_channels=4,
    out_channels=4,
    text_dim=32,
    freq_dim=16,
    ffn_dim=64,
    num_layers=2,
    text_len=8,
    quant="int8",
)


def _video(b=1, c=4, f=2, h=8, w=8, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, c, f, h, w)), jnp.float32)


def test_wan_t2v_shape():
    cfg = TINY
    params = wan_init_random(jax.random.key(0), cfg)
    video = _video()
    rng = np.random.default_rng(1)
    text = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    fwd = jax.jit(wan_forward, static_argnames="cfg")
    out = fwd(params, cfg, video, t, text)
    assert out.shape == video.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_wan_i2v_image_branch():
    cfg = WanConfig(
        **{**TINY.__dict__, "image_dim": 20, "added_kv_proj_dim": TINY.inner_dim}
    )
    params = wan_init_random(jax.random.key(0), cfg)
    video = _video()
    rng = np.random.default_rng(2)
    text = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)), jnp.bfloat16)
    img = jnp.asarray(rng.standard_normal((1, 5, cfg.image_dim)), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    out = wan_forward(params, cfg, video, t, text, encoder_hidden_states_image=img)
    assert out.shape == video.shape
    # image context must influence the output
    img2 = img + 1.0
    out2 = wan_forward(params, cfg, video, t, text, encoder_hidden_states_image=img2)
    assert np.abs(np.asarray(out2 - out, np.float32)).max() > 1e-5


def test_wan_per_token_timestep():
    """wan2.2-ti2v: per-token timesteps (temb ndim 4, ref: wan.py:76-92)."""
    cfg = WanConfig(**{**TINY.__dict__, "per_token_timestep": True})
    params = wan_init_random(jax.random.key(0), cfg)
    video = _video()
    seq = (2 // 1) * (8 // 2) * (8 // 2)
    rng = np.random.default_rng(3)
    text = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)), jnp.bfloat16)
    t = jnp.broadcast_to(jnp.linspace(0, 999, seq), (1, seq)).astype(jnp.float32)
    out = wan_forward(params, cfg, video, t, text)
    assert out.shape == video.shape


def test_wan_sparse_mask_changes_output():
    cfg = TINY
    params = wan_init_random(jax.random.key(0), cfg)
    video = _video(f=2, h=16, w=16)
    seq = 2 * 8 * 8
    rng = np.random.default_rng(4)
    text = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    nb = seq // 128 + (seq % 128 > 0)
    mask = np.ones((1, cfg.num_attention_heads, nb, nb), np.int32)
    out_full = wan_forward(params, cfg, video, t, text, sparse_mask=jnp.asarray(mask))
    out_dense = wan_forward(params, cfg, video, t, text)
    np.testing.assert_allclose(
        np.asarray(out_full, np.float32), np.asarray(out_dense, np.float32),
        atol=5e-2,
    )


def test_wan_rope_cache_shape():
    cfg = TINY  # head_dim 24 -> t 8, h 8, w 8 pair dims 4+4+4
    cos, sin = wan_rope_cos_sin(cfg, 2, 8, 8)
    assert cos.shape == (2 * 4 * 4, 12)
    assert sin.shape == cos.shape


def test_wan_gather_sparse_form():
    """Tuple-form (indices, counts) sparse mask drives the gather kernel."""
    cfg = WanConfig(**{**TINY.__dict__, "sparse_gather_blocks": (16, 16)})
    params = wan_init_random(jax.random.key(0), cfg)
    video = _video(f=2, h=16, w=16)
    seq = 2 * 8 * 8  # 128 tokens -> 8 blocks of 16
    rng = np.random.default_rng(5)
    text = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    from fastdm_tpu.kernels.pallas.attention import mask_to_block_lists

    mask = np.ones((seq // 16, seq // 16), bool)
    idx, cnt, _ = mask_to_block_lists(mask)
    out = wan_forward(params, cfg, video, t, text,
                      sparse_mask=(jnp.asarray(idx), jnp.asarray(cnt)))
    out_dense = wan_forward(params, cfg, video, t, text)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out_dense, np.float32), atol=5e-2
    )


@pytest.mark.parametrize("quant", ["int8", "int4p", None])
def test_wan_split_qkv_matches_fused(quant):
    """split_qkv_proj (+ chunked projections) == the fused-QKV forward for
    every quant mode — the A14B HBM-capacity path computes the same
    function."""
    import dataclasses as dc

    cfg = dc.replace(TINY, quant=quant)
    params = wan_init_random(jax.random.key(3), cfg)
    video = _video(f=2, h=8, w=8, seed=5)
    rng = np.random.default_rng(6)
    text = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                       jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    fwd = jax.jit(wan_forward, static_argnames="cfg")
    ref = fwd(params, cfg, video, t, text)
    # 2*4*4 = 32 patch tokens; chunk of 16 divides it
    cfg_split = dc.replace(cfg, split_qkv_proj=True, ffn_chunk_tokens=16)
    out = fwd(params, cfg_split, video, t, text)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_qlinear_slice_out_equivalence():
    """qlinear_slice_out(params, a, b)(x) == qlinear_apply(params)(x)[..., a:b]
    for all quant modes (column independence of per-token quantization)."""
    from fastdm_tpu.layers.qlinear import (
        qlinear_apply, qlinear_random, qlinear_slice_out,
    )

    x = jnp.asarray(np.random.default_rng(7).standard_normal((2, 24, 32)),
                    jnp.bfloat16)
    for quant in [None, "int8", "fp8", "int4", "int4p"]:
        p = qlinear_random(jax.random.key(11), 32, 48, quant=quant)
        full = np.asarray(qlinear_apply(p, x), np.float32)
        for a, b in [(0, 16), (16, 32), (32, 48)]:
            part = np.asarray(
                qlinear_apply(qlinear_slice_out(p, a, b), x), np.float32)
            np.testing.assert_allclose(part, full[..., a:b], rtol=2e-2,
                                       atol=2e-2, err_msg=str(quant))
