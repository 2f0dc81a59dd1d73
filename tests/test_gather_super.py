"""Superblock gather-sparse attention (sdpa_gather_super): pallas kernel vs
the jnp oracle, equivalence with the fine kernel on the same mask (exact
sub-block masking -> bit-parity with the 64-token radial spec), table-builder
semantics, and contracts.

The superblock form is the scattered-DMA bandwidth fix for the fine kernel
(BENCH_NOTES: slots-depth was a null result; radial masks are diagonal bands,
so aligned 4-runs cover 85% of active fine blocks at the A14B shape)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastdm_tpu.kernels.jnp_backend.impl import (
    sdpa_gather_fine_jnp,
    sdpa_gather_super_jnp,
    sdpa_jnp,
)
from fastdm_tpu.kernels.pallas.attention import (
    sdpa_gather_fine_pallas,
    sdpa_gather_super_pallas,
)
from fastdm_tpu.sparse.config import RadialAttnConfig
from fastdm_tpu.sparse.xsparse import RadialAttn


def _qkv(rng, b, sq, skv, h, d):
    q = jnp.asarray(rng.standard_normal((b, sq, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h * d)), jnp.float32)
    return q, k, v


def _super_tables_from_mask(m, group, sb):
    """Pack a (nq, nfine) bool mask into superblock CSR tables (the layout
    RadialAttn.block_lists_super emits)."""
    nq, nfine = m.shape
    nsuper = -(-nfine // sb)
    mp = np.zeros((nq, nsuper * sb), bool)
    mp[:, :nfine] = m
    weights = (1 << np.arange(sb)).astype(np.int32)
    idx_segs, val_segs = [], []
    rows = np.zeros((nq, 2), np.int32)
    start = 0
    for r in range(nq):
        sub = mp[r].reshape(nsuper, sb)
        act = np.nonzero(sub.any(1))[0].astype(np.int32)
        padded = -(-max(1, len(act)) // group) * group
        seg_i = np.zeros(padded, np.int32)
        seg_v = np.zeros(padded, np.int32)
        seg_i[: len(act)] = act
        seg_v[: len(act)] = (sub[act] * weights[None]).sum(1)
        rows[r] = (start, len(act))
        start += padded
        idx_segs.append(seg_i)
        val_segs.append(seg_v)
    return (np.concatenate(idx_segs), np.concatenate(val_segs), rows)


def _fine_tables_from_mask(m, group, fine, skv):
    nq, nfine = m.shape
    tail_id, tail_valid = nfine - 1, skv - (nfine - 1) * fine
    idx_segs, val_segs = [], []
    rows = np.zeros((nq, 2), np.int32)
    start = 0
    for r in range(nq):
        act = np.nonzero(m[r])[0].astype(np.int32)
        padded = -(-max(1, len(act)) // group) * group
        seg_i = np.zeros(padded, np.int32)
        seg_v = np.zeros(padded, np.int32)
        seg_i[: len(act)] = act
        seg_v[: len(act)] = np.where(act == tail_id, min(tail_valid, fine),
                                     fine)
        rows[r] = (start, len(act))
        start += padded
        idx_segs.append(seg_i)
        val_segs.append(seg_v)
    return (np.concatenate(idx_segs), np.concatenate(val_segs), rows)


@pytest.mark.parametrize("skv,group,sb", [(1024, 2, 4), (961, 2, 4),
                                          (1024, 4, 2), (900, 1, 8)])
def test_gather_super_matches_oracle(skv, group, sb):
    rng = np.random.default_rng(0)
    b, sq, h, d, fine, bq = 1, 512, 2, 64, 64, 256
    q, k, v = _qkv(rng, b, sq, skv, h, d)
    nq, nfine = sq // bq, -(-skv // fine)
    m = rng.random((nq, nfine)) < 0.4
    m[:, 0] = True
    idx, val, rows = _super_tables_from_mask(m, group, sb)
    args = (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))
    out_p = sdpa_gather_super_pallas(q, k, v, *args, h, h, d, block_q=bq,
                                     group=group, fine=fine, superblock=sb)
    out_j = sdpa_gather_super_jnp(q, k, v, *args, h, h, d, block_q=bq,
                                  group=group, fine=fine, superblock=sb)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_j, np.float32), atol=2e-2)


def test_gather_super_bit_parity_with_fine():
    """The super kernel masks inactive sub-blocks EXACTLY, so on the same
    fine mask it must agree with the fine kernel (same attention set)."""
    rng = np.random.default_rng(1)
    b, sq, skv, h, d, fine, bq, sb = 1, 512, 993, 2, 64, 64, 256, 4
    q, k, v = _qkv(rng, b, sq, skv, h, d)
    nq, nfine = sq // bq, -(-skv // fine)
    m = rng.random((nq, nfine)) < 0.35
    m[:, 0] = True
    fi, fv, fr = _fine_tables_from_mask(m, 4, fine, skv)
    si, sv, sr = _super_tables_from_mask(m, 2, sb)
    out_f = sdpa_gather_fine_pallas(
        q, k, v, jnp.asarray(fi), jnp.asarray(fv), jnp.asarray(fr),
        h, h, d, block_q=bq, group=4, fine=fine)
    out_s = sdpa_gather_super_pallas(
        q, k, v, jnp.asarray(si), jnp.asarray(sv), jnp.asarray(sr),
        h, h, d, block_q=bq, group=2, fine=fine, superblock=sb)
    np.testing.assert_allclose(np.asarray(out_s, np.float32),
                               np.asarray(out_f, np.float32), atol=2e-2)


def test_gather_super_full_mask_equals_dense():
    rng = np.random.default_rng(2)
    b, sq, skv, h, d, fine, bq, sb = 1, 256, 512, 2, 64, 64, 128, 4
    q, k, v = _qkv(rng, b, sq, skv, h, d)
    nq, nfine = sq // bq, skv // fine
    m = np.ones((nq, nfine), bool)
    idx, val, rows = _super_tables_from_mask(m, 2, sb)
    out = sdpa_gather_super_pallas(
        q, k, v, jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows),
        h, h, d, block_q=bq, group=2, fine=fine, superblock=sb)
    ref = sdpa_jnp(q, k, v, h, h, d, False, None)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_block_lists_super_semantics():
    """Builder output reconstructs the exact fine mask, with aligned
    superblock ids and group-padded segments."""
    cfg = RadialAttnConfig(block_size=64, decay_factor=0.2, model_type="wan")
    attn = RadialAttn(cfg)
    attn.post_init(video_token_num=8 * 576, num_frame=8)
    sb, group = 4, 8
    idx, val, rows = attn.block_lists_super(512, group, sb)
    m = np.asarray(attn._mask2d(), bool)
    from fastdm_tpu.kernels.pallas.attention import coarsen_block_mask

    mq = np.asarray(coarsen_block_mask(m, 512 // 64, 1), bool)
    nq, nfine = mq.shape
    assert rows.shape == (nq, 2)
    assert idx.shape == val.shape and idx.ndim == 1
    assert idx.shape[0] % group == 0
    recon = np.zeros_like(mq)
    for r in range(nq):
        s, c = rows[r]
        for t in range(s, s + c):
            for j in range(sb):
                if (val[t] >> j) & 1:
                    fid = idx[t] * sb + j
                    if fid < nfine:
                        recon[r, fid] = True
    np.testing.assert_array_equal(recon, mq)
    # padding slots carry zero bits
    for r in range(nq):
        s, c = rows[r]
        pend = s + -(-max(1, c) // group) * group
        assert (val[s + c : pend] == 0).all()


def test_gather_super_wan_dispatch():
    """cfg.sparse_gather_superblock > 1 routes a 3-tuple sparse mask through
    the super kernel inside the wan self-attention (engine 'super' mode)."""
    import jax

    from fastdm_tpu.models.wan import WanConfig, wan_forward, wan_init_random

    cfg = WanConfig(num_attention_heads=2, attention_head_dim=64,
                    in_channels=4, out_channels=4, text_dim=16, freq_dim=8,
                    ffn_dim=32, num_layers=1, text_len=8, quant=None,
                    sparse_gather_fine_blocks=(128, 8, 64),
                    sparse_gather_superblock=4)
    params = wan_init_random(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 4, 2, 16, 32), jnp.bfloat16)
    text = jax.random.normal(jax.random.key(2), (1, 8, 16), jnp.bfloat16)
    t = jnp.full((1,), 500.0)
    # tokens = 2 * 8 * 16 = 256 -> nq=2 (bq128), nfine=4, nsuper=1
    nq, nfine, sb = 2, 4, 4
    m = np.ones((nq, nfine), bool)
    idx, val, rows = _super_tables_from_mask(m, 2, sb)
    mask = (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))
    out_sparse = wan_forward(params, cfg, lat, t, text, sparse_mask=mask)
    out_dense = wan_forward(params, cfg, lat, t, text)
    # full mask == dense attention
    np.testing.assert_allclose(np.asarray(out_sparse, np.float32),
                               np.asarray(out_dense, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_gather_super_contracts():
    from fastdm_tpu.kernels.contracts import check_gather_super

    rows = jnp.zeros((2, 2), jnp.int32)
    idx = jnp.zeros((8,), jnp.int32)
    val = jnp.zeros((8,), jnp.int32)
    check_gather_super("t", idx, val, rows, 512, 1024, 256, 4, 64, 4)
    with pytest.raises(ValueError, match="multiple of 128"):
        check_gather_super("t", idx, val, rows, 512, 1024, 256, 1, 8, 4)
    with pytest.raises(ValueError, match="block_q"):
        check_gather_super("t", idx, val, rows, 512, 1024, 100, 4, 64, 4)
    with pytest.raises(ValueError, match="out of range"):
        check_gather_super("t", jnp.full((8,), 99, jnp.int32), val, rows,
                           512, 1024, 256, 4, 64, 4)
    with pytest.raises(ValueError, match="valbits"):
        check_gather_super("t", idx, jnp.full((8,), 16, jnp.int32), rows,
                           512, 1024, 256, 4, 64, 4)


def test_registry_auto_routes_gather_ops_to_pallas():
    """Regression: 'auto' must route the fine/super gather ops to pallas on
    TPU — they were missing from _AUTO_PALLAS_OPS, silently running the
    dense jnp oracle through the engine's sparse path."""
    from fastdm_tpu.kernels.registry import kernel_registry

    for op in ("sdpa_gather_fine", "sdpa_gather_super"):
        assert op in kernel_registry._AUTO_PALLAS_OPS
        assert "pallas" in kernel_registry._ops.get(op, {})
        assert "jnp" in kernel_registry._ops.get(op, {})


@pytest.mark.parametrize("sq", [480, 300])
def test_gather_super_partial_tail_q_block(sq):
    """sq % block_q != 0: the kernel relies on Mosaic OOB load/store masking
    for the partial tail q-block (no zero-padded q copy since r4) — assert
    oracle parity including the tail rows (advisor r4 low)."""
    rng = np.random.default_rng(21)
    b, h, d, fine, bq, group, sb = 1, 2, 64, 64, 256, 2, 4
    skv = 1024
    q, k, v = _qkv(rng, b, sq, skv, h, d)
    nq, nfine = -(-sq // bq), -(-skv // fine)
    m = rng.random((nq, nfine)) < 0.5
    m[:, 0] = True
    idx, val, rows = _super_tables_from_mask(m, group, sb)
    args = (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))
    out_p = sdpa_gather_super_pallas(q, k, v, *args, h, h, d, block_q=bq,
                                     group=group, fine=fine, superblock=sb)
    out_j = sdpa_gather_super_jnp(q, k, v, *args, h, h, d, block_q=bq,
                                  group=group, fine=fine, superblock=sb)
    assert out_p.shape == (b, sq, h * d)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_j, np.float32), atol=2e-2)
