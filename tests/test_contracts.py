"""Kernel-boundary contract checks (SURVEY §5.2): malformed shapes/tables die
with a clear ValueError in Python instead of an opaque Mosaic error (or a
silent OOB DMA) on the chip. Mirrors the reference's TORCH_CHECK guards
(ref: csrc/torch_bindings.cpp:31-123)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastdm_tpu.kernels import contracts
from fastdm_tpu.kernels.pallas.attention import (
    sdpa_gather_pallas,
    sdpa_pallas,
    sdpa_sparse_pallas,
)
from fastdm_tpu.kernels.pallas.matmul import int8_matmul_pallas


def _qkv(b=1, sq=256, skv=256, h=2, kvh=2, d=64):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, sq, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, kvh * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, kvh * d)), jnp.float32)
    return q, k, v


def test_sdpa_feature_dim_mismatch():
    q, k, v = _qkv()
    with pytest.raises(ValueError, match="feature dim"):
        # claim 4 heads over a 2-head tensor
        sdpa_pallas(q, k, v, num_q_heads=4, num_kv_heads=4, head_dim=64)


def test_sdpa_kv_seq_mismatch():
    q, k, v = _qkv()
    with pytest.raises(ValueError, match="kv seq mismatch"):
        sdpa_pallas(q, k, v[:, :128], num_q_heads=2, num_kv_heads=2, head_dim=64)


def test_sdpa_gqa_divisibility():
    # 3 q heads over 2 kv heads: widths are self-consistent, ratio is not
    q, k, v = _qkv(h=3, kvh=2)
    with pytest.raises(ValueError, match="not a multiple"):
        contracts.check_sdpa("x", q, k, v, 3, 2, 64)


def test_gather_oob_block_index_dies_in_python():
    """The round-1 hardware incident: an index addressing a kv tile past the
    padded array must be rejected before the kernel launches."""
    q, k, v = _qkv(sq=1024, skv=1024)
    # skv=1024, block_k=512 -> 2 kv tiles; index 2 is OOB
    idx = jnp.asarray([[0, 2]], jnp.int32)
    cnt = jnp.asarray([[2]], jnp.int32)
    with pytest.raises(ValueError, match="out of range"):
        sdpa_gather_pallas(q, k, v, idx, cnt, num_q_heads=2, num_kv_heads=2,
                           head_dim=64, block_q=1024, block_k=512)


def test_gather_row_granularity_mismatch():
    q, k, v = _qkv(sq=1024, skv=1024)
    # 1024/512 = 2 q tiles, but the table has 1 row
    idx = jnp.zeros((1, 2), jnp.int32)
    cnt = jnp.ones((1, 1), jnp.int32)
    with pytest.raises(ValueError, match="granularity mismatch"):
        sdpa_gather_pallas(q, k, v, idx, cnt, num_q_heads=2, num_kv_heads=2,
                           head_dim=64, block_q=512, block_k=512)


def test_gather_count_exceeds_table_width():
    q, k, v = _qkv(sq=512, skv=1024)
    idx = jnp.zeros((1, 1), jnp.int32)
    cnt = jnp.asarray([[5]], jnp.int32)  # claims 5 active blocks, table holds 1
    with pytest.raises(ValueError, match="block_counts out of"):
        sdpa_gather_pallas(q, k, v, idx, cnt, num_q_heads=2, num_kv_heads=2,
                           head_dim=64, block_q=512, block_k=512)


def test_gather_wrong_dtype():
    q, k, v = _qkv(sq=512, skv=512)
    idx = jnp.zeros((1, 1), jnp.int64 if jnp.zeros(1).dtype == jnp.int64
                    else jnp.float32)
    cnt = jnp.ones((1, 1), jnp.int32)
    with pytest.raises(ValueError, match="int32"):
        sdpa_gather_pallas(q, k, v, idx, cnt, num_q_heads=2, num_kv_heads=2,
                           head_dim=64, block_q=512, block_k=512)


def test_sparse_mask_grid_mismatch():
    q, k, v = _qkv(sq=512, skv=512)
    # wrong tile grid: 512/128 = 4 tiles per side, give 2x2
    mask = jnp.ones((1, 2, 2, 2), jnp.bool_)
    with pytest.raises(ValueError, match="retile the mask"):
        sdpa_sparse_pallas(q, k, v, num_q_heads=2, num_kv_heads=2, head_dim=64,
                           sparse_mask=mask, block_q=128, block_k=128)


def test_tile_alignment_rejected():
    with pytest.raises(ValueError, match="multiples of"):
        contracts.check_block_tiles("x", 100, 128)


def test_scaled_mm_scale_shapes():
    a = jnp.zeros((8, 16), jnp.int8)
    b = jnp.zeros((16, 32), jnp.int8)
    ok_sa = jnp.ones((8, 1), jnp.float32)
    ok_sb = jnp.ones((32,), jnp.float32)
    adj = jnp.zeros((32,), jnp.float32)
    with pytest.raises(ValueError, match="scale_a"):
        int8_matmul_pallas(a, b, jnp.ones((3,)), ok_sb, jnp.float32, adj, None)
    with pytest.raises(ValueError, match="scale_b"):
        int8_matmul_pallas(a, b, ok_sa, jnp.ones((7,)), jnp.float32, adj, None)
    with pytest.raises(ValueError, match="inner dims"):
        int8_matmul_pallas(a, jnp.zeros((8, 32), jnp.int8), ok_sa, ok_sb,
                           jnp.float32, adj, None)
    with pytest.raises(ValueError, match="int8 path"):
        int8_matmul_pallas(a.astype(jnp.float32), b, ok_sa, ok_sb,
                           jnp.float32, adj, None)
    with pytest.raises(ValueError, match="azp_adj"):
        int8_matmul_pallas(a, b, ok_sa, ok_sb, jnp.float32,
                           jnp.zeros((5,), jnp.float32), None)


def test_valid_calls_still_pass():
    """Contracts must not reject the shapes the engine actually uses."""
    q, k, v = _qkv(b=2, sq=384, skv=384, h=4, kvh=2, d=64)
    contracts.check_sdpa("x", q, k, v, 4, 2, 64)
    idx, cnt = jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 1), jnp.int32)
    contracts.check_gather_lists("x", idx, cnt, 384, 384, 512, 512)
    mask = jnp.ones((2, 4, 3, 3), jnp.bool_)
    contracts.check_sparse_mask("x", mask, 2, 4, 384, 384, 128, 128)
    contracts.check_scaled_mm(
        "x", jnp.zeros((8, 16), jnp.int8), jnp.zeros((16, 32), jnp.int8),
        jnp.ones((8, 1)), jnp.ones((32,)), azp_adj=jnp.zeros((32,)),
        azp=jnp.zeros((8, 1), jnp.int32), bias=jnp.zeros((32,)), int8=True)
