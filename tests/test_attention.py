"""Attention across backends vs an fp32 reference (ref tests/test_attention.py).

INPUT_ARGS are scaled-down versions of the reference's real model shapes
(flux 4608x24x128, sdxl 4096/1024+77 cross, sd3 4685) — full sizes run on TPU,
CPU CI uses the structure-preserving smaller ones.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdm_tpu.kernels.jnp_backend.impl import sdpa_jnp, sdpa_sparse_jnp
from fastdm_tpu.kernels.pallas.attention import sdpa_pallas, sdpa_sparse_pallas

# (B, Sq, Skv, Hq, Hkv, D)
INPUT_ARGS = [
    (1, 384, 384, 4, 4, 128),    # flux-like joint attention (scaled down)
    (2, 333, 333, 2, 2, 64),     # ragged, sdxl head_dim
    (1, 256, 77, 2, 2, 64),      # sdxl cross attention
    (1, 256, 256, 4, 2, 64),     # GQA
]


def _ref_attention(q, k, v, hq, hkv, d, causal=False, scale=None):
    b, sq, _ = q.shape
    skv = k.shape[1]
    q4 = q.reshape(b, sq, hq, d).astype(np.float64)
    k4 = k.reshape(b, skv, hkv, d).astype(np.float64)
    v4 = v.reshape(b, skv, hkv, d).astype(np.float64)
    if hkv != hq:
        k4 = np.repeat(k4, hq // hkv, 2)
        v4 = np.repeat(v4, hq // hkv, 2)
    scale = d**-0.5 if scale is None else scale
    logits = np.einsum("bqhd,bkhd->bhqk", q4, k4) * scale
    if causal:
        mask = np.tril(np.ones((sq, skv), bool), k=skv - sq)
        logits = np.where(mask, logits, -np.inf)
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bkhd->bqhd", p, v4)
    return out.reshape(b, sq, hq * d)


@pytest.mark.parametrize("args", INPUT_ARGS)
@pytest.mark.parametrize("impl", [sdpa_jnp, sdpa_pallas])
def test_sdpa(args, impl):
    b, sq, skv, hq, hkv, d = args
    rng = np.random.default_rng(10)
    q = rng.standard_normal((b, sq, hq * d), dtype=np.float32)
    k = rng.standard_normal((b, skv, hkv * d), dtype=np.float32)
    v = rng.standard_normal((b, skv, hkv * d), dtype=np.float32)
    out = np.asarray(
        impl(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16), hq, hkv, d,
        ),
        np.float64,
    )
    qb = np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32)
    kb = np.asarray(jnp.asarray(k, jnp.bfloat16), np.float32)
    vb = np.asarray(jnp.asarray(v, jnp.bfloat16), np.float32)
    ref = _ref_attention(qb, kb, vb, hq, hkv, d)
    assert np.abs(out - ref).max() < 1.8e-2  # ref atol (tests/test_attention.py:94)


@pytest.mark.parametrize("impl", [sdpa_jnp, sdpa_pallas])
def test_sdpa_causal(impl):
    b, s, h, d = 1, 320, 2, 64
    rng = np.random.default_rng(11)
    q = rng.standard_normal((b, s, h * d), dtype=np.float32)
    k = rng.standard_normal((b, s, h * d), dtype=np.float32)
    v = rng.standard_normal((b, s, h * d), dtype=np.float32)
    out = np.asarray(
        impl(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h, h, d, is_causal=True),
        np.float64,
    )
    ref = _ref_attention(q, k, v, h, h, d, causal=True)
    assert np.abs(out - ref).max() < 1.8e-2


@pytest.mark.parametrize("impl", [sdpa_sparse_jnp, sdpa_sparse_pallas])
def test_sdpa_block_sparse(impl):
    """Random block mask; oracle = dense attention restricted to the mask
    (ref tests/test_sparge_attention.py)."""
    b, s, h, d, blk = 1, 384, 2, 64, 128
    nb = s // blk
    rng = np.random.default_rng(12)
    q = rng.standard_normal((b, s, h * d), dtype=np.float32)
    k = rng.standard_normal((b, s, h * d), dtype=np.float32)
    v = rng.standard_normal((b, s, h * d), dtype=np.float32)
    mask = rng.integers(0, 2, (b, h, nb, nb)).astype(np.int32)
    mask[..., 0] = 1  # keep at least one block per row (attention sink)

    out = np.asarray(
        impl(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h, h, d,
            sparse_mask=jnp.asarray(mask), block_q=blk, block_k=blk,
        ),
        np.float64,
    )

    # dense reference with mask expanded to elements
    q4 = q.reshape(b, s, h, d).astype(np.float64)
    k4 = k.reshape(b, s, h, d).astype(np.float64)
    v4 = v.reshape(b, s, h, d).astype(np.float64)
    logits = np.einsum("bqhd,bkhd->bhqk", q4, k4) * d**-0.5
    emask = np.repeat(np.repeat(mask, blk, 2), blk, 3).astype(bool)
    logits = np.where(emask, logits, -np.inf)
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", p, v4).reshape(b, s, h * d)
    assert np.abs(out - ref).max() < 1.8e-2


def test_pallas_matches_jnp_bf16():
    """Backend agreement at model dtype."""
    b, s, h, d = 1, 384, 2, 128
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
    a = np.asarray(sdpa_jnp(q, k, v, h, h, d), np.float32)
    p = np.asarray(sdpa_pallas(q, k, v, h, h, d), np.float32)
    np.testing.assert_allclose(a, p, atol=1.5e-2)


@pytest.mark.parametrize("sq", [300, 900])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_native_q_partial_tail(sq, causal):
    """Native-layout-q dense flash (_flash_attention_nq): multiple q blocks
    with a partial tail (Mosaic OOB masking) and the K-side scale fold must
    match the jnp oracle and the transposing form."""
    from fastdm_tpu.kernels.pallas.attention import _flash_attention_nq

    rng = np.random.default_rng(33)
    # skv == sq: the causal row/col alignment convention for sq != skv
    # differs between the oracle and the kernel (both kernels; causal is
    # API-parity only — no diffusion model here uses it)
    h, d, skv = 2, 64, sq
    q = jnp.asarray(rng.standard_normal((1, sq, h * d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, skv, h * d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, skv, h * d)), jnp.bfloat16)
    out = _flash_attention_nq(
        q, k, v, num_q_heads=h, num_kv_heads=h, head_dim=d,
        is_causal=causal, scale=None, block_q=128, block_k=256)
    ref = sdpa_jnp(q, k, v, h, h, d, causal, None)
    assert out.shape == (1, sq, h * d)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2,
                               rtol=2e-2)
