"""Multi-device sharding test on the virtual CPU mesh (SURVEY.md §4 implication)."""

import jax
import pytest

from fastdm_tpu.parallel.mesh import factor_mesh, flux_dryrun_step, make_mesh


def test_factor_mesh():
    assert factor_mesh(8) == (1, 2, 4)
    assert factor_mesh(4) == (1, 1, 4)
    assert factor_mesh(1) == (1, 1, 1)
    assert factor_mesh(3) == (3, 1, 1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_flux_dryrun_8dev():
    flux_dryrun_step(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pp_dryrun_8dev():
    from fastdm_tpu.parallel.pipeline import pp_dryrun_step

    pp_dryrun_step(8)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
@pytest.mark.parametrize("pp,m", [(2, 1), (2, 4), (4, 2), (4, 4)])
def test_gpipe_matches_sequential(pp, m):
    """GPipe over the pp axis computes the same function as the sequential
    layer scan for every (stages, microbatches) shape, including the M < pp
    bubble-dominated case."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from fastdm_tpu.parallel.pipeline import gpipe_run_blocks, shard_stacked_layers

    layers, dim = 8, 16
    k = jax.random.key(0)
    w = jax.random.normal(k, (layers, dim, dim), jnp.float32) * 0.3
    b = jax.random.normal(jax.random.key(1), (layers, dim), jnp.float32)
    params = {"w": w, "b": b}
    xs = jax.random.normal(jax.random.key(2), (m, 2, dim), jnp.float32)

    def block(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    mesh = Mesh(np.asarray(jax.devices()[:pp]), ("pp",))
    out = gpipe_run_blocks(block, shard_stacked_layers(params, mesh), xs, mesh)

    def seq(x):
        for i in range(layers):
            x = block({"w": w[i], "b": b[i]}, x)
        return x

    ref = jax.vmap(seq)(xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_gpipe_rejects_indivisible_layers():
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from fastdm_tpu.parallel.pipeline import gpipe_run_blocks

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pp",))
    params = {"w": jnp.zeros((6, 4, 4))}
    with pytest.raises(ValueError, match="not divisible"):
        gpipe_run_blocks(lambda p, x: x, params, jnp.zeros((2, 1, 4)), mesh)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_gpipe_wan_blocks_match_sequential():
    """PP on a REAL model family's block body: the wan DiT block (self-attn +
    cross-attn + ffn with fp32 modulation islands) through GPipe over pp=4
    equals the sequential lax.scan the single-chip path runs."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from fastdm_tpu.models.wan import (
        WanConfig, wan_block, wan_init_random, wan_rope_cos_sin,
    )
    from fastdm_tpu.parallel.pipeline import gpipe_run_blocks, shard_stacked_layers

    cfg = WanConfig(num_layers=4, num_attention_heads=2, attention_head_dim=8,
                    ffn_dim=32, text_dim=16, freq_dim=32, text_len=8,
                    quant=None)
    params = wan_init_random(jax.random.key(0), cfg)
    blocks = params["blocks"]
    m, n, d = 4, 16, cfg.inner_dim  # M=4 microbatches of batch 1
    hidden = jax.random.normal(jax.random.key(1), (m, 1, n, d), jnp.bfloat16)
    encoder = jax.random.normal(jax.random.key(2), (1, cfg.text_len, d), jnp.bfloat16)
    temb6 = jax.random.normal(jax.random.key(3), (1, 6, d), jnp.float32)
    cos, sin = wan_rope_cos_sin(cfg, 4, 4, 4)  # pre-patchify dims -> 16 tokens

    def block_fn(blk, h):
        return wan_block(blk, h, encoder, temb6, cos, sin, cfg, None)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pp",))
    out = gpipe_run_blocks(block_fn, shard_stacked_layers(blocks, mesh),
                           hidden, mesh)

    def seq(h):
        def body(carry, blk):
            return wan_block(blk, carry, encoder, temb6, cos, sin, cfg, None), None
        return jax.lax.scan(body, h, blocks)[0]

    ref = jax.vmap(seq)(hidden)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)
