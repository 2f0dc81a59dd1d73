"""Pallas elementwise kernels vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdm_tpu.kernels.jnp_backend import impl as oracle
from fastdm_tpu.kernels.pallas import elementwise as pk


def test_rms_norm_matches_oracle():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 37, 256)), jnp.bfloat16)
    w = jnp.asarray(1 + 0.1 * rng.standard_normal(256), jnp.float32)
    for weight in (w, None):
        ours = np.asarray(pk.rms_norm_pallas(x, weight, 1e-6), np.float32)
        ref = np.asarray(oracle.rms_norm_jnp(x, weight, 1e-6), np.float32)
        np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=2e-2)


def test_gelu_and_mul_matches_oracle():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((5, 33, 512)), jnp.bfloat16)
    ours = np.asarray(pk.gelu_and_mul_pallas(x), np.float32)
    ref = np.asarray(oracle.gelu_and_mul_jnp(x), np.float32)
    np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("symmetric", [True, False])
def test_quantize_int8_matches_oracle(symmetric):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((67, 384)) * 3, jnp.float32)
    q, s, zp = pk.quantize_to_int8_pallas(x, symmetric=symmetric)
    q0, s0, zp0 = oracle.quantize_to_int8_jnp(x, symmetric=symmetric)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q0))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s0), rtol=1e-6)
    if not symmetric:
        np.testing.assert_array_equal(np.asarray(zp), np.asarray(zp0))


def test_quantize_fp8_matches_oracle():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((50, 256)) * 10, jnp.float32)
    q, s = pk.quantize_to_fp8_pallas(x)
    q0, s0 = oracle.quantize_to_fp8_jnp(x)
    np.testing.assert_array_equal(np.asarray(q).view(np.uint8),
                                  np.asarray(q0).view(np.uint8))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s0), rtol=1e-6)


@pytest.mark.parametrize("is_neox", [True, False])
def test_rope_matches_oracle(is_neox):
    rng = np.random.default_rng(4)
    b, sq, h, d = 2, 23, 4, 64
    q = jnp.asarray(rng.standard_normal((b, sq, h * d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, sq, h * d)), jnp.bfloat16)
    pos = np.arange(sq)
    inv = 1.0 / 10000 ** (np.arange(0, d, 2) / d)
    ang = np.outer(pos, inv)
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)
    oq, ok = pk.rotary_pos_embedding_pallas(q, k, d, cos, sin, is_neox)
    rq, rk = oracle.rotary_pos_embedding_jnp(q, k, d, cos, sin, is_neox)
    np.testing.assert_allclose(np.asarray(oq, np.float32), np.asarray(rq, np.float32),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(ok, np.float32), np.asarray(rk, np.float32),
                               atol=2e-2, rtol=2e-2)
