"""Radial mask semantics + sparse attention end-to-end against a dense oracle."""

import jax.numpy as jnp
import numpy as np

from fastdm_tpu.kernels import sparse_scaled_dot_product_attention
from fastdm_tpu.sparse.config import RadialAttnConfig
from fastdm_tpu.sparse.xsparse import RadialAttn, radial_block_mask


def test_radial_mask_properties():
    cfg = RadialAttnConfig(block_size=16, decay_factor=1.0, model_type="wan")
    num_frame, tpf = 8, 64
    s = num_frame * tpf
    mask = radial_block_mask(s, num_frame, cfg)
    nb = s // 16
    assert mask.shape == (nb, nb)
    # attention sink: every row attends to frame 0's blocks
    f0_blocks = tpf // 16
    assert mask[:, :f0_blocks].all()
    # diagonal (same-frame) blocks are kept
    assert all(mask[i, i] for i in range(nb))
    # sparsity increases with frame distance: last frame row attends to fewer
    # far blocks than near ones
    assert mask.sum() < mask.size  # actually sparse
    # symmetry is NOT required (sink breaks it), but windowed part is monotone:
    row_last = mask[-1]
    assert row_last[:f0_blocks].all()


def test_radial_mask_text_border_dense():
    cfg = RadialAttnConfig(block_size=16, model_type="wan")
    mask = radial_block_mask(8 * 32, 8, cfg, total_tokens=8 * 32 + 64)
    border = (8 * 32) // 16
    assert mask[border:, :].all() and mask[:, border:].all()


def test_radial_attn_matches_dense_where_mask_full():
    """Single frame -> window covers everything -> sparse == dense attention."""
    cfg = RadialAttnConfig(block_size=16, decay_factor=1.0, model_type="wan")
    attn = RadialAttn(cfg)
    attn.post_init(video_token_num=128, num_frame=1)
    mask = attn.block_mask(1, 2)
    assert mask.all()

    rng = np.random.default_rng(0)
    b, s, h, d = 1, 128, 2, 32
    q = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.float32)
    out_sparse = sparse_scaled_dot_product_attention(
        q, k, v, h, h, d, sparse_mask=jnp.asarray(mask), block_q=16, block_k=16
    )
    from fastdm_tpu.kernels import scaled_dot_product_attention

    out_dense = scaled_dot_product_attention(q, k, v, h, h, d)
    np.testing.assert_allclose(
        np.asarray(out_sparse, np.float32), np.asarray(out_dense, np.float32), atol=2e-2
    )


def test_sparse_config_json_roundtrip(tmp_path):
    import json

    f = tmp_path / "radial.json"
    f.write_text(json.dumps({
        "sparse_algorithm": "radial", "block_size": 64, "decay_factor": 0.3,
        "model_type": "wan", "dense_layers": 1, "dense_steps": 11,
    }))
    from fastdm_tpu.sparse.xsparse import SparseAttn

    attn = SparseAttn.from_json(str(f))
    assert isinstance(attn, RadialAttn)
    assert attn.config.block_size == 64
    assert attn.config.dense_steps == 11


def test_block_lists_indices_respect_mask_granularity():
    """Regression (v5e OOB DMA, 2026-08-17): with the reference's block_size
    64 radial config, gather indices must address k_tokens-sized tiles —
    i.e. stay below ceil(padded_tokens / k_tokens) — not block_size tiles."""
    cfg = RadialAttnConfig(block_size=64, decay_factor=0.3, model_type="wan")
    attn = RadialAttn(cfg)
    tokens, frames = 31 * 576, 31  # wan-5B 768^2 x121f latent shape
    attn.post_init(video_token_num=tokens, num_frame=frames)
    q_tokens, k_tokens = 512, 1024
    idx, cnt = attn.block_lists(q_tokens, k_tokens)
    n_fine = attn._mask2d().shape[0]
    nq = -(-n_fine * 64 // q_tokens)
    nk = -(-n_fine * 64 // k_tokens)
    assert idx.shape[0] == nq and cnt.shape == (nq, 1)
    assert idx.max() < nk, (idx.max(), nk)
    assert (cnt[:, 0] <= nk).all()
    # incompatible tile sizes are rejected, not silently mis-scaled
    import pytest

    with pytest.raises(ValueError):
        attn.block_lists(96, 1024)


def test_block_mask_retiles_to_consumer_granularity():
    """block_mask(block_tokens=) retiles the native block_size-64 mask to the
    kernel's 128-token tiles (coarsen = OR, a safe superset) — the analog of
    the reference's sparge_mask_convert 128<->64 (ref xsparse.py:230-250)."""
    cfg = RadialAttnConfig(block_size=64, decay_factor=0.3, model_type="wan")
    attn = RadialAttn(cfg)
    tokens, frames = 8 * 256, 8
    attn.post_init(video_token_num=tokens, num_frame=frames)
    fine = attn.block_mask(1, 1)  # native 64 granularity
    coarse = attn.block_mask(1, 1, block_tokens=128)
    n64 = fine.shape[2]
    assert coarse.shape[2] == -(-n64 // 2)
    # superset: wherever any covered fine block is active, coarse is active
    for i in range(coarse.shape[2]):
        for j in range(coarse.shape[3]):
            f = fine[0, 0, 2 * i:2 * i + 2, 2 * j:2 * j + 2]
            assert coarse[0, 0, i, j] == int(f.any())
    # refine = repeat
    finer = attn.block_mask(1, 1, block_tokens=32)
    assert finer.shape[2] == 2 * n64
    assert (finer[0, 0, ::2, ::2] == fine[0, 0]).all()
