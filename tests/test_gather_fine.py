"""Fine-granularity gather-sparse attention (sdpa_gather_fine): pallas kernel
vs the jnp token-mask oracle, table-builder semantics, and contracts.

The kernel assembles (group*fine)-token compute tiles from COMPACTED active
fine KV blocks via manual double-buffered HBM->VMEM DMA, so its MXU work
ratio vs dense equals the fine radial-mask density (the TPU answer to the
reference's SpargeAttn fetch-then-skip, fastdm/kernel/cuda/attention.py:
218-260; mask semantics per fastdm/sparse/xsparse.py). Tables are CSR-flat:
one flat index array of group-padded row segments + (nq, 2) [start, count]
rows, so scalar-prefetch SMEM scales with ACTIVE blocks, not row width."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastdm_tpu.kernels.jnp_backend.impl import sdpa_gather_fine_jnp, sdpa_jnp
from fastdm_tpu.kernels.pallas.attention import sdpa_gather_fine_pallas
from fastdm_tpu.sparse.config import RadialAttnConfig
from fastdm_tpu.sparse.xsparse import RadialAttn


def _qkv(rng, b, sq, skv, h, d):
    q = jnp.asarray(rng.standard_normal((b, sq, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h * d)), jnp.float32)
    return q, k, v


def _csr_from_mask(m, group, fine, skv):
    """Pack a (nq, nfine) bool mask into CSR-flat gather tables (the same
    layout RadialAttn.block_lists_fine emits)."""
    nq, nfine = m.shape
    tail_id = nfine - 1
    tail_valid = skv - tail_id * fine
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
    return np.concatenate(idx_segs), np.concatenate(val_segs), rows


def _random_tables(rng, nq, nfine, group, fine, skv, density=0.5):
    """CSR tables over a random fine mask; the mask always keeps block 0
    (mirrors the radial sink) so no row is empty."""
    m = rng.random((nq, nfine)) < density
    m[:, 0] = True
    return _csr_from_mask(m, group, fine, skv)


@pytest.mark.parametrize("skv,group", [(448, 2), (512, 2), (441, 4)])
def test_gather_fine_matches_oracle(skv, group):
    rng = np.random.default_rng(0)
    b, sq, h, d, fine, bq = 1, 512, 2, 64, 64, 256
    q, k, v = _qkv(rng, b, sq, skv, h, d)
    nq, nfine = sq // bq, -(-skv // fine)
    idx, val, rows = _random_tables(rng, nq, nfine, group, fine, skv)
    args = (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))
    out_p = sdpa_gather_fine_pallas(q, k, v, *args, h, h, d,
                                    block_q=bq, group=group, fine=fine)
    out_j = sdpa_gather_fine_jnp(q, k, v, *args, h, h, d,
                                 block_q=bq, group=group, fine=fine)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_j, np.float32), atol=2e-2)


def test_gather_fine_ragged_rows():
    """Rows with very different active counts (the radial sink row is dense,
    far rows are narrow) — CSR's raison d'etre — stay correct."""
    rng = np.random.default_rng(5)
    b, sq, skv, h, d, fine, group, bq = 1, 512, 1024, 2, 64, 64, 4, 128
    q, k, v = _qkv(rng, b, sq, skv, h, d)
    nq, nfine = sq // bq, skv // fine
    m = np.zeros((nq, nfine), bool)
    m[0] = True                      # dense sink row
    m[1, [0, 3]] = True              # sparse
    m[2, 0] = True                   # single block
    m[3, [0, 7, 15]] = True          # includes the tail block
    idx, val, rows = _csr_from_mask(m, group, fine, skv)
    args = (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))
    out_p = sdpa_gather_fine_pallas(q, k, v, *args, h, h, d,
                                    block_q=bq, group=group, fine=fine)
    out_j = sdpa_gather_fine_jnp(q, k, v, *args, h, h, d,
                                 block_q=bq, group=group, fine=fine)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_j, np.float32), atol=2e-2)


def test_gather_fine_full_mask_equals_dense():
    rng = np.random.default_rng(1)
    b, sq, skv, h, d, fine, group, bq = 1, 256, 256, 2, 64, 64, 2, 256
    q, k, v = _qkv(rng, b, sq, skv, h, d)
    nfine = skv // fine
    idx, val, rows = _csr_from_mask(np.ones((1, nfine), bool), group, fine,
                                    skv)
    out = sdpa_gather_fine_pallas(
        q, k, v, jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows),
        h, h, d, block_q=bq, group=group, fine=fine)
    ref = sdpa_jnp(q, k, v, h, h, d)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_gather_fine_gqa():
    rng = np.random.default_rng(2)
    b, sq, skv, hq, hkv, d, fine, group, bq = 1, 256, 384, 4, 2, 64, 64, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, hq * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, hkv * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, hkv * d)), jnp.float32)
    nq, nfine = sq // bq, skv // fine
    idx, val, rows = _random_tables(rng, nq, nfine, group, fine, skv)
    args = (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))
    out_p = sdpa_gather_fine_pallas(q, k, v, *args, hq, hkv, d,
                                    block_q=bq, group=group, fine=fine)
    out_j = sdpa_gather_fine_jnp(q, k, v, *args, hq, hkv, d,
                                 block_q=bq, group=group, fine=fine)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_j, np.float32), atol=2e-2)


def test_block_lists_fine_semantics():
    """CSR fine tables cover exactly the q-coarsened fine mask; valid counts
    are `fine` except the tail block; segments are group-padded with valid=0
    and packed back to back."""
    cfg = RadialAttnConfig(block_size=64, decay_factor=0.3, model_type="wan")
    attn = RadialAttn(cfg)
    tokens, frames = 13 * 576, 13  # non-multiple of 64: tail block partial
    attn.post_init(video_token_num=tokens, num_frame=frames)
    q_tokens, group = 512, 8
    idx, val, rows = attn.block_lists_fine(q_tokens, group)
    fine_mask = attn._mask2d()
    nfine = fine_mask.shape[0]
    nq = -(-nfine * 64 // q_tokens)
    assert idx.shape == val.shape and idx.ndim == 1
    assert idx.shape[0] % group == 0
    assert rows.shape == (nq, 2)
    assert idx.max() < nfine and idx.min() >= 0
    tail_valid = tokens - (nfine - 1) * 64
    pos = 0
    for r in range(nq):
        start, c = int(rows[r, 0]), int(rows[r, 1])
        assert start == pos, "segments must be packed back to back"
        padded = -(-max(1, c) // group) * group
        pos += padded
        seg_i, seg_v = idx[start:start + padded], val[start:start + padded]
        # active slots reproduce the q-ORed mask row exactly
        row = fine_mask[r * (q_tokens // 64): (r + 1) * (q_tokens // 64)].any(0)
        np.testing.assert_array_equal(np.sort(seg_i[:c]), np.nonzero(row)[0])
        # valid: fine for interior, tail remainder for the last block, 0 pad
        expect = np.where(seg_i[:c] == nfine - 1, tail_valid, 64)
        np.testing.assert_array_equal(seg_v[:c], expect)
        assert (seg_v[c:] == 0).all()
    assert pos == idx.shape[0]


def test_block_lists_fine_through_engine_kernel_path():
    """End-to-end: radial fine tables through the pallas kernel vs the jnp
    oracle at a real (small) wan-like shape."""
    rng = np.random.default_rng(3)
    cfg = RadialAttnConfig(block_size=64, decay_factor=1.0, model_type="wan")
    attn = RadialAttn(cfg)
    tokens, frames = 1024, 4
    attn.post_init(video_token_num=tokens, num_frame=frames)
    idx, val, rows = attn.block_lists_fine(q_tokens=256, group=2)
    b, h, d = 1, 2, 64
    q, k, v = _qkv(rng, b, tokens, tokens, h, d)
    args = (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))
    out_p = sdpa_gather_fine_pallas(q, k, v, *args, h, h, d,
                                    block_q=256, group=2, fine=64)
    out_j = sdpa_gather_fine_jnp(q, k, v, *args, h, h, d,
                                 block_q=256, group=2, fine=64)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_j, np.float32), atol=2e-2)


def test_gather_fine_contracts():
    rng = np.random.default_rng(4)
    q, k, v = _qkv(rng, 1, 256, 256, 2, 64)
    good_idx = jnp.zeros((2,), jnp.int32)
    good_val = jnp.full((2,), 64, jnp.int32)
    good_rows = jnp.asarray([[0, 1]], jnp.int32)
    with pytest.raises(ValueError, match="out of range"):
        sdpa_gather_fine_pallas(q, k, v, jnp.asarray([0, 7], jnp.int32),
                                good_val, good_rows, 2, 2, 64,
                                block_q=256, group=2, fine=64)
    with pytest.raises(ValueError, match="not a multiple"):
        sdpa_gather_fine_pallas(q, k, v, jnp.zeros((3,), jnp.int32),
                                jnp.zeros((3,), jnp.int32), good_rows,
                                2, 2, 64, block_q=256, group=2, fine=64)
    with pytest.raises(ValueError, match="block_valid out of"):
        sdpa_gather_fine_pallas(q, k, v, good_idx,
                                jnp.full((2,), 65, jnp.int32), good_rows,
                                2, 2, 64, block_q=256, group=2, fine=64)
    with pytest.raises(ValueError, match="exceeds flat table"):
        sdpa_gather_fine_pallas(q, k, v, good_idx, good_val,
                                jnp.asarray([[2, 2]], jnp.int32), 2, 2, 64,
                                block_q=256, group=2, fine=64)
    with pytest.raises(ValueError, match="group-aligned"):
        sdpa_gather_fine_pallas(
            q, k, v, jnp.zeros((4,), jnp.int32), jnp.zeros((4,), jnp.int32),
            jnp.asarray([[1, 1]], jnp.int32), 2, 2, 64,
            block_q=256, group=2, fine=64)


def test_gather_fine_oob_tables_clipped_in_graph():
    """Inside jit the tables are tracers, so the contract value checks are
    skipped; the wrapper's in-graph clamp must keep a corrupted table from
    OOB-DMAing (on hardware) — output is finite, not a chip crash."""
    import jax

    rng = np.random.default_rng(3)
    b, sq, skv, h, d, fine, bq, group = 1, 512, 512, 2, 64, 64, 256, 2
    q, k, v = _qkv(rng, b, sq, skv, h, d)
    nq, nfine = sq // bq, skv // fine
    idx, val, rows = _random_tables(rng, nq, nfine, group, fine, skv)
    idx = idx.copy()
    idx[0] = nfine + 7            # out-of-range fine block id
    rows = rows.copy()
    rows[-1, 0] = idx.shape[0]    # start beyond the flat table
    rows[-1, 1] = 10 ** 6         # absurd count

    @jax.jit
    def run(i, va, r):
        return sdpa_gather_fine_pallas(q, k, v, i, va, r, h, h, d,
                                       block_q=bq, group=group, fine=fine)

    out = run(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_gather_coarse_oob_tables_clipped_in_graph():
    import jax

    from fastdm_tpu.kernels.pallas.attention import sdpa_gather_pallas

    rng = np.random.default_rng(4)
    b, sq, skv, h, d = 1, 512, 2048, 2, 64
    bq, bk = 256, 512
    q, k, v = _qkv(rng, b, sq, skv, h, d)
    nq, nkv = sq // bq, skv // bk
    idx = np.tile(np.arange(nkv, dtype=np.int32), (nq, 1))
    cnt = np.full((nq, 1), nkv, np.int32)
    idx[0, 0] = nkv + 3           # OOB kv tile id
    cnt[1, 0] = nkv + 100         # count beyond max_nb

    @jax.jit
    def run(i, c):
        return sdpa_gather_pallas(q, k, v, i, c, h, h, d,
                                  block_q=bq, block_k=bk)

    out = run(jnp.asarray(idx), jnp.asarray(cnt))
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_fine_gather_slots_ring_matches_oracle():
    """slots=3/4 (deeper DMA ring, VERDICT r2 item 6) must be numerically
    identical to the shipped slots=2 double buffer."""
    rng = np.random.default_rng(3)
    b, sq, skv, h, d, fine, bq, group = 1, 512, 441, 2, 64, 64, 256, 4
    q, k, v = _qkv(rng, b, sq, skv, h, d)
    nq, nfine = sq // bq, -(-skv // fine)
    idx, val, rows = _random_tables(rng, nq, nfine, group, fine, skv)
    args = (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))
    ref = sdpa_gather_fine_pallas(q, k, v, *args, h, h, d,
                                  block_q=bq, group=group, fine=fine, slots=2)
    for slots in (3, 4):
        out = sdpa_gather_fine_pallas(q, k, v, *args, h, h, d,
                                      block_q=bq, group=group, fine=fine,
                                      slots=slots)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=1e-5)
