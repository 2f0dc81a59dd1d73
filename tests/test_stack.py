"""scan_suffix: cache probe-prefix re-entry must not materialize a sliced
copy of the stacked weights.

The reference re-enters its torch block ModuleList at an offset for free
(fastdm/caching/xcaching.py start_block-style loops); on the XLA side the
naive `lax.scan(blocks[start:])` makes the slice an HLO temp inside the
cache `lax.cond` compute branch — measured at ~6.9 GiB on Wan2.2-A14B int4p
@720p81f, the difference between fitting and OOM on one 16 GiB v5e."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdm_tpu.models.stack import scan_suffix


def test_scan_suffix_matches_sliced_scan():
    rng = np.random.default_rng(0)
    blocks = {
        "w": jnp.asarray(rng.standard_normal((6, 4, 4)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((6, 4)), jnp.float32),
    }

    def body(c, blk):
        return jnp.tanh(c @ blk["w"] + blk["b"]), c.sum()

    c0 = jnp.ones((2, 4))
    for start, stop in ((0, None), (2, None), (0, 3), (1, 5)):
        sliced = jax.tree.map(lambda x: x[start:stop], blocks)
        want, want_ys = jax.lax.scan(body, c0, sliced)
        got, got_ys = scan_suffix(body, c0, blocks, start, stop)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got_ys), np.asarray(want_ys),
                                   rtol=1e-6)


def test_scan_suffix_tuple_xs():
    blocks = jnp.arange(8, dtype=jnp.float32).reshape(4, 2)
    residuals = jnp.arange(4, dtype=jnp.float32)

    def body(c, xs):
        blk, res = xs
        return c + blk.sum() + res, None

    want, _ = jax.lax.scan(body, 0.0, (blocks[1:], residuals[1:]))
    got, _ = scan_suffix(body, 0.0, (blocks, residuals), 1)
    assert float(got) == float(want)


def test_cached_wan_branch_has_no_stack_suffix_slice():
    """Compile the FBCache wan cached forward and assert the cond compute
    branch contains no slice of the [1:n] weight-stack suffix."""
    from fastdm_tpu.caching.config import FBCacheConfig
    from fastdm_tpu.caching.xcaching import cache_init_state
    from fastdm_tpu.models.wan import (
        WanConfig, wan_forward_cached, wan_init_random, wan_rope_cos_sin,
    )

    n_layers = 4
    cfg = WanConfig(num_layers=n_layers, num_attention_heads=2,
                    attention_head_dim=32, ffn_dim=128, text_dim=32,
                    text_len=8, freq_dim=32, quant=None)
    params = wan_init_random(jax.random.key(0), cfg)
    lf, lh, lw = 4, 8, 8
    cos, sin = wan_rope_cos_sin(cfg, lf, lh, lw)
    pt, ph, pw = cfg.patch_size
    tokens = (lf // pt) * (lh // ph) * (lw // pw)
    dim = cfg.num_attention_heads * cfg.attention_head_dim
    ccfg = FBCacheConfig(cache_algorithm="fbcache", enable_caching=True,
                         threshold=0.15, warmup_steps=0)
    video = jnp.zeros((1, cfg.in_channels, lf, lh, lw), jnp.bfloat16)
    text = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    state = cache_init_state(ccfg, (1, tokens, dim), (1, tokens, dim))

    def f(params, state, video, text, t):
        return wan_forward_cached(params, cfg, ccfg, state, jnp.asarray(1),
                                  4, video, t, text, rope_cos=cos,
                                  rope_sin=sin)

    hlo = jax.jit(f).lower(params, state, video, text,
                           jnp.asarray([0.5], jnp.float32)).compile().as_text()
    bad = [l for l in hlo.splitlines()
           if re.search(r" slice\(", l)
           and f"slice={{[1:{n_layers}]" in l]
    assert not bad, (
        "weight-stack suffix slice materialized inside the cache branch "
        f"(would near-double weight HBM):\n" + "\n".join(bad[:4]))


def test_feedforward_chunked_matches_unchunked():
    """chunk_tokens is numerically equivalent: per-row ops + matmuls over
    row chunks — differences are bf16 reduction-order ulps only."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastdm_tpu.layers.feedforward import feedforward_apply
    from fastdm_tpu.layers.qlinear import qlinear_random

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    params = {"proj": qlinear_random(k1, 64, 160, quant="int8"),
              "out": qlinear_random(k2, 160, 64, quant="int8")}
    x = jax.random.normal(k3, (2, 48, 64), jnp.bfloat16)
    full = np.asarray(
        feedforward_apply(params, x, "gelu-approximate")).astype(np.float32)
    chunked = np.asarray(feedforward_apply(
        params, x, "gelu-approximate", chunk_tokens=12)).astype(np.float32)
    assert np.abs(chunked - full).max() <= 1e-3
    # non-dividing chunk falls back to the unchunked path (bit-identical)
    fb = np.asarray(feedforward_apply(
        params, x, "gelu-approximate", chunk_tokens=7)).astype(np.float32)
    np.testing.assert_array_equal(fb, full)
