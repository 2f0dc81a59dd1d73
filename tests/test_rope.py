"""Rotary embedding vs a slice-based numpy reference (ref tests/test_rope.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastdm_tpu.kernels import rotary_pos_embedding


def _ref_rope(x, cos, sin, is_neox):
    # x: (B, S, H, D); cos/sin: (S, D/2)
    x = x.astype(np.float64)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    if is_neox:
        d2 = x.shape[-1] // 2
        x1, x2 = x[..., :d2], x[..., d2:]
        return np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)
    x1, x2 = x[..., 0::2], x[..., 1::2]
    o1, o2 = x1 * c - x2 * s, x2 * c + x1 * s
    return np.stack([o1, o2], -1).reshape(x.shape)


@pytest.mark.parametrize("is_neox", [False, True])
@pytest.mark.parametrize("shape", [(1, 512, 24, 128), (2, 77, 8, 64)])
def test_rope(shape, is_neox):
    b, s, h, d = shape
    rng = np.random.default_rng(8)
    q = rng.standard_normal((b, s, h * d), dtype=np.float32)
    k = rng.standard_normal((b, s, h * d), dtype=np.float32)
    freqs = np.outer(np.arange(s), 1.0 / 10000 ** (np.arange(0, d, 2) / d))
    cos, sin = np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32)

    q_out, k_out = rotary_pos_embedding(
        jnp.asarray(q), jnp.asarray(k), d, jnp.asarray(cos), jnp.asarray(sin), is_neox
    )
    q_ref = _ref_rope(q.reshape(b, s, h, d), cos, sin, is_neox).reshape(b, s, h * d)
    k_ref = _ref_rope(k.reshape(b, s, h, d), cos, sin, is_neox).reshape(b, s, h * d)
    np.testing.assert_allclose(np.asarray(q_out), q_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(k_out), k_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("is_neox", [False, True])
@pytest.mark.parametrize("affine", [True, False])
@pytest.mark.parametrize("shape", [(1, 300, 8, 128), (2, 77, 4, 64)])
def test_qk_norm_rope_fused_vs_composition(shape, is_neox, affine):
    """The fused pallas kernel (interpret on CPU) == rms_norm on each half
    then rope (the jnp oracle / the pre-fusion wan path)."""
    from fastdm_tpu.kernels.jnp_backend.impl import qk_norm_rope_jnp
    from fastdm_tpu.kernels.pallas.elementwise import qk_norm_rope_pallas

    b, s, h, d = shape
    rng = np.random.default_rng(11)
    qk = jnp.asarray(
        rng.standard_normal((b, s, 2 * h * d)), jnp.bfloat16)
    gq = gk = None
    if affine:
        gq = jnp.asarray(rng.standard_normal(h * d), jnp.float32)
        gk = jnp.asarray(rng.standard_normal(h * d), jnp.float32)
    freqs = np.outer(np.arange(s), 1.0 / 10000 ** (np.arange(0, d, 2) / d))
    cos = jnp.asarray(np.cos(freqs), jnp.float32)
    sin = jnp.asarray(np.sin(freqs), jnp.float32)

    q_o, k_o = qk_norm_rope_jnp(qk, gq, gk, d, cos, sin, is_neox=is_neox,
                                eps=1e-6)
    q_p, k_p = qk_norm_rope_pallas(qk, gq, gk, d, cos, sin, is_neox=is_neox,
                                   eps=1e-6)
    np.testing.assert_allclose(
        np.asarray(q_p, np.float32), np.asarray(q_o, np.float32),
        rtol=0.02, atol=0.02)

    # full-qkv form (inner_dim given): BlockSpec carves [q|k], v untouched
    qkv = jnp.concatenate(
        [qk, jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)],
        axis=-1)
    q3_o, k3_o = qk_norm_rope_jnp(qkv, gq, gk, d, cos, sin,
                                  is_neox=is_neox, eps=1e-6, inner_dim=h * d)
    q3_p, k3_p = qk_norm_rope_pallas(qkv, gq, gk, d, cos, sin,
                                     is_neox=is_neox, eps=1e-6,
                                     inner_dim=h * d)
    np.testing.assert_allclose(np.asarray(q3_o, np.float32),
                               np.asarray(q_o, np.float32), rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(q3_p, np.float32), np.asarray(q3_o, np.float32),
        rtol=0.02, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(k3_p, np.float32), np.asarray(k3_o, np.float32),
        rtol=0.02, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(q_p, np.float32), np.asarray(q_o, np.float32),
        rtol=0.02, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(k_p, np.float32), np.asarray(k_o, np.float32),
        rtol=0.02, atol=0.02)


def test_rope_flux_cache_semantics():
    """The flux 3-axis cos/sin construction feeds the interleaved path
    (ref: fastdm/model/flux.py:426-428 merged-cache construction)."""
    from fastdm_tpu.layers.embeddings import flux_rope_cos_sin

    ids = np.stack(
        [np.zeros(100), np.repeat(np.arange(10), 10), np.tile(np.arange(10), 10)], -1
    ).astype(np.float32)
    cos, sin = flux_rope_cos_sin(jnp.asarray(ids), (16, 56, 56), theta=10000)
    assert cos.shape == (100, 64) and sin.shape == (100, 64)
    np.testing.assert_allclose(
        np.asarray(cos[:, :8]), np.ones((100, 8)), atol=1e-6
    )  # axis 0 ids are all zero -> angle 0


@pytest.mark.parametrize("affine", [True, False])
def test_qk_norm_rope2_split_matches_fused(affine):
    """Two-operand form (split-QKV projection path) == the fused [q|k]
    form on the same data, jnp oracle and pallas kernel both."""
    from fastdm_tpu.kernels.jnp_backend.impl import (
        qk_norm_rope2_jnp, qk_norm_rope_jnp,
    )
    from fastdm_tpu.kernels.pallas.elementwise import qk_norm_rope2_pallas

    b, s, h, d = 1, 300, 8, 128
    rng = np.random.default_rng(13)
    qk = jnp.asarray(rng.standard_normal((b, s, 2 * h * d)), jnp.bfloat16)
    q_in, k_in = qk[..., : h * d], qk[..., h * d :]
    gq = gk = None
    if affine:
        gq = jnp.asarray(rng.standard_normal(h * d), jnp.float32)
        gk = jnp.asarray(rng.standard_normal(h * d), jnp.float32)
    freqs = np.outer(np.arange(s), 1.0 / 10000 ** (np.arange(0, d, 2) / d))
    cos = jnp.asarray(np.cos(freqs), jnp.float32)
    sin = jnp.asarray(np.sin(freqs), jnp.float32)

    q_f, k_f = qk_norm_rope_jnp(qk, gq, gk, d, cos, sin, eps=1e-6)
    q_o, k_o = qk_norm_rope2_jnp(q_in, k_in, gq, gk, d, cos, sin, eps=1e-6)
    np.testing.assert_array_equal(np.asarray(q_o, np.float32),
                                  np.asarray(q_f, np.float32))
    np.testing.assert_array_equal(np.asarray(k_o, np.float32),
                                  np.asarray(k_f, np.float32))
    q_p, k_p = qk_norm_rope2_pallas(q_in, k_in, gq, gk, d, cos, sin,
                                    eps=1e-6)
    np.testing.assert_allclose(np.asarray(q_p, np.float32),
                               np.asarray(q_o, np.float32), rtol=0.02,
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(k_p, np.float32),
                               np.asarray(k_o, np.float32), rtol=0.02,
                               atol=0.02)
