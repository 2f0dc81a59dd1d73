"""SDXL UNet core tests (tiny config): shapes, skip bookkeeping, ControlNet add."""

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.models.sdxl import SDXLConfig, sdxl_forward, sdxl_init_random

TINY = SDXLConfig(
    block_channels=(8, 16, 32),
    cross_attention_dim=16,
    attn_layers=(0, 1, 2),
    head_dim=8,
    addition_time_embed_dim=4,
    time_embed_dim=16,
    add_embedding_in_dim=8 + 6 * 4,  # pooled 8 + 6 time-ids * 4
    norm_groups=4,
    quant="int8",
)


def _inputs(b=1, h=32, w=32):
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.standard_normal((b, 4, h, w)), jnp.float32)
    t = jnp.full((b,), 500.0, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 12, TINY.cross_attention_dim)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((b, 8)), jnp.bfloat16)
    time_ids = jnp.asarray(np.tile([h, w, 0, 0, h, w], (b, 1)), jnp.float32)
    return sample, t, ctx, pooled, time_ids


def test_sdxl_forward_shape():
    params = sdxl_init_random(jax.random.key(0), TINY)
    sample, t, ctx, pooled, time_ids = _inputs()
    fwd = jax.jit(sdxl_forward, static_argnames="cfg")
    out = fwd(params, TINY, sample, t, ctx, pooled, time_ids)
    assert out.shape == sample.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_sdxl_controlnet_residual_changes_output():
    params = sdxl_init_random(jax.random.key(0), TINY)
    sample, t, ctx, pooled, time_ids = _inputs()
    out0 = sdxl_forward(params, TINY, sample, t, ctx, pooled, time_ids)

    # 9 down-block skips: s0 + 3 per down block stage (ref: sdxl.py:411-434)
    c0, c1, c2 = TINY.block_channels
    shapes = [
        (1, 32, 32, c0), (1, 32, 32, c0), (1, 32, 32, c0), (1, 16, 16, c0),
        (1, 16, 16, c1), (1, 16, 16, c1), (1, 8, 8, c1),
        (1, 8, 8, c2), (1, 8, 8, c2),
    ]
    res = [jnp.ones(s, jnp.float32) * 0.1 for s in shapes]
    mid = jnp.ones((1, 8, 8, c2), jnp.float32) * 0.1
    out1 = sdxl_forward(
        params, TINY, sample, t, ctx, pooled, time_ids,
        down_block_additional_residuals=res, mid_block_additional_residual=mid,
    )
    assert np.abs(np.asarray(out1 - out0, np.float32)).max() > 1e-4
