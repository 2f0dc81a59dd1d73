"""W4A4 int4 path: quantize op, matmul op, qlinear layer, SVDQuant low-rank.

TPU extension with no reference counterpart (the reference stops at 8-bit:
fastdm/layer/qlinear.py). Motivation is measured, not assumed: the v5e MXU
runs s4 x s4 at 1.15-1.35x its s8 rate at FLUX shapes (BENCH_NOTES
2026-08-19); the SVDQuant low-rank branch (arXiv:2411.05007) carries the
weight outliers the 4-bit grid cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdm_tpu.kernels import int4_matmul, quantize_to_int4
from fastdm_tpu.layers.qlinear import (
    INT4_LOWRANK_RANK,
    _lowrank_approx,
    qlinear_apply,
    qlinear_random,
    quantize_weight,
)


def test_quantize_to_int4_range_and_scale():
    x = jax.random.normal(jax.random.key(0), (16, 64), jnp.float32) * 3.0
    q, scale = quantize_to_int4(x)
    # int8 carrier (axon cannot move jnp.int4 across the jit boundary)
    assert q.dtype == jnp.int8
    assert scale.shape == (16, 1)
    qn = np.asarray(q)
    assert qn.min() >= -8 and qn.max() <= 7
    # per-token scale reproduces the row max at the |q|=7 positions
    recon = qn.astype(np.float32) * np.asarray(scale)
    assert np.max(np.abs(recon - np.asarray(x))) <= np.max(np.asarray(scale)) * 0.51


def test_int4_matmul_exact_on_int4_grid():
    # values already on the int4 grid -> the dot is exact integer math
    ka, kb = jax.random.split(jax.random.key(1))
    a = jax.random.randint(ka, (32, 128), -8, 8, jnp.int8)
    b = jax.random.randint(kb, (128, 48), -8, 8, jnp.int8)
    sa = jnp.full((32, 1), 0.5, jnp.float32)
    sb = jnp.full((48,), 2.0, jnp.float32)
    out = int4_matmul(a, b, sa, sb, jnp.float32)
    ref = (np.asarray(a, np.int64) @ np.asarray(b, np.int64)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_int4_matmul_bias_and_dtype():
    a = jnp.ones((4, 16), jnp.int8)
    b = jnp.ones((16, 8), jnp.int8)
    bias = jnp.arange(8, dtype=jnp.float32)
    out = int4_matmul(a, b, jnp.ones((4, 1)), jnp.ones((8,)), jnp.bfloat16, bias)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32)[0], 16.0 + np.arange(8))


def test_lowrank_approx_recovers_low_rank_matrix():
    k = jax.random.key(2)
    u0 = jax.random.normal(k, (96, 8), jnp.float32)
    v0 = jax.random.normal(jax.random.fold_in(k, 1), (8, 64), jnp.float32)
    w = u0 @ v0
    u, v = _lowrank_approx(w, rank=8)
    np.testing.assert_allclose(np.asarray(u @ v), np.asarray(w), atol=5e-3)


def test_quantize_weight_int4_params_and_consistency():
    w = jax.random.normal(jax.random.key(3), (128, 64), jnp.float32) * 0.02
    bias = jnp.ones((64,), jnp.float32)
    p = quantize_weight(w, "int4", bias)
    assert set(p) == {"w4", "scale", "lora_u", "lora_v", "bias"}
    assert p["w4"].dtype == jnp.int8
    assert p["lora_u"].shape == (128, INT4_LOWRANK_RANK)
    assert p["lora_v"].shape == (INT4_LOWRANK_RANK, 64)
    # dequantized residual + low-rank branch reconstructs w
    recon = (np.asarray(p["w4"], np.float32) * np.asarray(p["scale"])[None, :]
             + np.asarray(p["lora_u"], np.float32) @ np.asarray(p["lora_v"], np.float32))
    err = np.abs(recon - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert err < 0.12, err


def test_lowrank_branch_absorbs_outliers():
    """The SVDQuant claim, verified: on an outlier-heavy weight the rank-32
    branch makes W4A4 BETTER than plain-int4 by an order of magnitude (and
    competitive with int8)."""
    w = jax.random.normal(jax.random.key(4), (256, 128), jnp.float32) * 0.02
    w = w.at[:, 7].mul(40.0).at[3, :].mul(25.0)  # outlier column + row
    x = jax.random.normal(jax.random.key(5), (64, 256), jnp.bfloat16)
    ref = x.astype(jnp.float32) @ w

    def rel_err(y):
        return float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref))
                     / jnp.max(jnp.abs(ref)))

    e4 = rel_err(qlinear_apply(quantize_weight(w, "int4"), x))
    e8 = rel_err(qlinear_apply(quantize_weight(w, "int8"), x))

    # plain int4 (zeroed branch) for comparison
    w32 = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=0), 1e-12) / 7.0
    plain = {
        "w4": jnp.clip(jnp.round(w32 / s[None, :]), -8, 7).astype(jnp.int8),
        "scale": s,
        "lora_u": jnp.zeros((256, 1), jnp.bfloat16),
        "lora_v": jnp.zeros((1, 128), jnp.bfloat16),
    }
    ep = rel_err(qlinear_apply(plain, x))

    assert e4 < ep / 10, (e4, ep)
    assert e4 < e8 * 2.5, (e4, e8)  # within small factor of int8 accuracy


def test_qlinear_random_int4_and_jit():
    p = qlinear_random(jax.random.key(6), 64, 48, quant="int4")
    assert p["w4"].dtype == jnp.int8
    x = jax.random.normal(jax.random.key(7), (8, 64), jnp.bfloat16)
    y_eager = qlinear_apply(p, x)
    y_jit = jax.jit(qlinear_apply)(p, x)
    assert y_eager.shape == (8, 48)
    np.testing.assert_allclose(
        np.asarray(y_eager, np.float32), np.asarray(y_jit, np.float32),
        atol=2e-2, rtol=2e-2)


def test_flux_int4_forward_smoke():
    """A tiny FLUX core runs end-to-end with quant='int4'."""
    from fastdm_tpu.models.flux import FluxConfig, flux_forward, flux_init_random, flux_rope_cache

    cfg = FluxConfig(num_layers=1, num_single_layers=1, num_attention_heads=2,
                     attention_head_dim=32, joint_attention_dim=64,
                     pooled_projection_dim=32, in_channels=16, out_channels=16,
                     axes_dims_rope=(8, 12, 12), quant="int4", quant_mods=True)
    params = flux_init_random(jax.random.key(8), cfg)
    ht = wt = 4
    txt = 8
    lat = jax.random.normal(jax.random.key(9), (1, ht * wt, 16), jnp.bfloat16)
    enc = jax.random.normal(jax.random.key(10), (1, txt, 64), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(11), (1, 32), jnp.bfloat16)
    cos, sin = flux_rope_cache(cfg, txt, ht, wt)
    out = flux_forward(params, cfg, lat, enc, pooled,
                       jnp.array([0.5]), cos, sin, guidance=jnp.array([3.5]))
    assert out.shape == (1, ht * wt, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_engine_rejects_conflicting_quant_flags():
    from fastdm_tpu.engine import FastDMEngine

    with pytest.raises(ValueError, match="mutually exclusive"):
        FastDMEngine("/nonexistent", architecture="flux",
                     use_int8=True, use_int4=True)

def test_pack_unpack_int4_roundtrip():
    from fastdm_tpu.layers.qlinear import pack_int4, unpack_int4

    q = jax.random.randint(jax.random.key(12), (6, 64, 48), -8, 8, jnp.int8)
    p = pack_int4(q)
    assert p.shape == (6, 32, 48) and p.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(unpack_int4(p)), np.asarray(q))
    with pytest.raises(ValueError, match="even K"):
        pack_int4(q[:, :63, :])


def test_packed_int4_matches_unpacked_qlinear():
    """quant='int4p' is bit-identical to quant='int4' (same SVD split, same
    residual grid); only the carrier layout differs."""
    w = jax.random.normal(jax.random.key(13), (128, 64), jnp.float32) * 0.02
    w = w.at[:, 3].mul(30.0)
    bias = jnp.ones((64,), jnp.float32)
    p4 = quantize_weight(w, "int4", bias)
    p4p = quantize_weight(w, "int4p", bias)
    assert set(p4p) == {"w4p", "scale", "lora_u", "lora_v", "bias"}
    assert p4p["w4p"].shape == (64, 64)
    x = jax.random.normal(jax.random.key(14), (8, 128), jnp.bfloat16)
    # the packed and unpacked carriers feed identical integer values into the
    # dot, but the two jit calls compile separate graphs whose float epilogues
    # may reassociate — so the outputs agree within tolerance here; the
    # bit-level guarantee is the unpack_int4(w4p) == w4 assert below
    y4 = jax.jit(qlinear_apply)(p4, x)
    y4p = jax.jit(qlinear_apply)(p4p, x)
    np.testing.assert_allclose(
        np.asarray(y4, np.float32), np.asarray(y4p, np.float32),
        rtol=2e-2, atol=2e-2)
    # and the unpacked carrier is bit-identical to the direct one
    from fastdm_tpu.layers.qlinear import unpack_int4

    np.testing.assert_array_equal(
        np.asarray(unpack_int4(p4p["w4p"])), np.asarray(p4["w4"]))


def test_flux_int4p_forward_smoke():
    """A tiny FLUX core runs end-to-end with the packed capacity form."""
    from fastdm_tpu.models.flux import FluxConfig, flux_forward, flux_init_random, flux_rope_cache

    cfg = FluxConfig(num_layers=1, num_single_layers=1, num_attention_heads=2,
                     attention_head_dim=32, joint_attention_dim=64,
                     pooled_projection_dim=32, in_channels=16, out_channels=16,
                     axes_dims_rope=(8, 12, 12), quant="int4p", quant_mods=True)
    params = flux_init_random(jax.random.key(15), cfg)
    leaves = {p for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
              for p in [p[-1].key] if p == "w4p"}
    assert "w4p" in leaves  # the packed carrier actually materialized
    ht = wt = 4
    txt = 8
    lat = jax.random.normal(jax.random.key(16), (1, ht * wt, 16), jnp.bfloat16)
    enc = jax.random.normal(jax.random.key(17), (1, txt, 64), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(18), (1, 32), jnp.bfloat16)
    cos, sin = flux_rope_cache(cfg, txt, ht, wt)
    out = flux_forward(params, cfg, lat, enc, pooled,
                       jnp.array([0.5]), cos, sin, guidance=jnp.array([3.5]))
    assert out.shape == (1, ht * wt, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_engine_pack_int4_requires_use_int4():
    from fastdm_tpu.engine import FastDMEngine

    with pytest.raises(ValueError, match="pack_int4 requires"):
        FastDMEngine("/nonexistent", architecture="flux", pack_int4=True)
