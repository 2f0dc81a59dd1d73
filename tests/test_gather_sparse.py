"""Gather-style (DMA-skipping) block-sparse attention vs the masked oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.kernels.pallas.attention import (
    _gather_sparse_attention,
    mask_to_block_lists,
)


def test_gather_matches_masked_dense():
    b, s, h, d, blk = 1, 256, 2, 32, 64
    nb = s // blk
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    mask = rng.integers(0, 2, (nb, nb)).astype(bool)
    mask[:, 0] = True  # sink keeps every row non-empty

    idx, cnt, max_nb = mask_to_block_lists(mask)
    out = _gather_sparse_attention(
        q, k, v, jnp.asarray(idx), jnp.asarray(cnt),
        num_q_heads=h, num_kv_heads=h, head_dim=d, scale=None,
        block_q=blk, block_k=blk, max_blocks=max_nb,
    )

    # dense oracle restricted to the mask
    q4 = np.asarray(q).reshape(b, s, h, d).astype(np.float64)
    k4 = np.asarray(k).reshape(b, s, h, d).astype(np.float64)
    v4 = np.asarray(v).reshape(b, s, h, d).astype(np.float64)
    logits = np.einsum("bqhd,bkhd->bhqk", q4, k4) * d**-0.5
    emask = np.repeat(np.repeat(mask, blk, 0), blk, 1)
    logits = np.where(emask[None, None], logits, -np.inf)
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", p, v4).reshape(b, s, h * d)
    assert np.abs(np.asarray(out, np.float64) - ref).max() < 1.8e-2


def test_mask_to_block_lists():
    m = np.array([[1, 0, 1], [0, 0, 1], [1, 1, 1]], bool)
    idx, cnt, max_nb = mask_to_block_lists(m)
    assert max_nb == 3
    np.testing.assert_array_equal(cnt.squeeze(), [2, 1, 3])
    np.testing.assert_array_equal(idx[0], [0, 2, 0])
    np.testing.assert_array_equal(idx[1], [2, 0, 0])
    np.testing.assert_array_equal(idx[2], [0, 1, 2])


def test_dispatched_gather_op_backends_agree():
    """sdpa_gather is a dispatched op: the pallas gather kernel and the jnp
    oracle (dense-mask reconstruction) must agree on the same block lists."""
    import numpy as np

    from fastdm_tpu.kernels import gather_sparse_attention
    from fastdm_tpu.kernels.registry import kernel_registry

    rng = np.random.default_rng(11)
    b, s, h, d = 1, 256, 2, 32
    bq = bk = 64
    q = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    mask = rng.random((s // bq, s // bk)) < 0.6
    mask[:, 0] = True  # no fully-masked rows
    idx, cnt, _ = mask_to_block_lists(mask)
    idx, cnt = jnp.asarray(idx), jnp.asarray(cnt)

    outs = {}
    for backend in ("jnp", "pallas"):
        fn = kernel_registry.select("sdpa_gather", backend)
        outs[backend] = np.asarray(
            fn(q, k, v, idx, cnt, h, h, d, None, bq, bk), np.float32
        )
    np.testing.assert_allclose(outs["pallas"], outs["jnp"], atol=2e-2)
