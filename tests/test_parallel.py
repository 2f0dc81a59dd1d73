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


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_flux_forward_pp_state_matches_sequential():
    """The pp_state routing inside flux_run_blocks (the ENGINE's path to PP):
    with an active pp mesh the whole flux forward must equal the sequential
    scan; without one the PP code must be bypassed entirely."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from fastdm_tpu.models.flux import (
        FluxConfig, flux_forward, flux_init_random, flux_rope_cache,
    )
    from fastdm_tpu.parallel import pp_state
    from fastdm_tpu.parallel.pipeline import shard_model_stacks_pp

    cfg = FluxConfig(num_layers=2, num_single_layers=2, attention_head_dim=32,
                     num_attention_heads=4, joint_attention_dim=64,
                     pooled_projection_dim=48, in_channels=16, out_channels=16,
                     axes_dims_rope=(8, 12, 12), quant="int8", quant_mods=True)
    params = flux_init_random(jax.random.key(0), cfg)
    txt, ht, wt = 8, 4, 4
    b = 2  # 2 microbatches through the 2-stage pipeline
    k = jax.random.key(1)
    hidden = jax.random.normal(k, (b, ht * wt, cfg.in_channels), jnp.bfloat16)
    encoder = jax.random.normal(k, (b, txt, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(k, (b, cfg.pooled_projection_dim), jnp.bfloat16)
    t = jnp.full((b,), 0.5, jnp.float32)
    g = jnp.full((b,), 3.5, jnp.float32)
    cos, sin = flux_rope_cache(cfg, txt, ht, wt)

    ref = flux_forward(params, cfg, hidden, encoder, pooled, t, cos, sin,
                       guidance=g)

    import numpy as onp
    mesh = Mesh(onp.asarray(jax.devices()[:2]).reshape(1, 1, 1, 2),
                ("dp", "sp", "tp", "pp"))
    sharded = shard_model_stacks_pp(params, mesh)
    pp_state.set_pp_mesh(mesh)
    try:
        out = jax.jit(flux_forward, static_argnames="cfg")(
            sharded, cfg, hidden, encoder, pooled, t, cos, sin, guidance=g)
    finally:
        pp_state.set_pp_mesh(None)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_wan_forward_pp_state_matches_sequential():
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from fastdm_tpu.models.wan import WanConfig, wan_forward, wan_init_random
    from fastdm_tpu.parallel import pp_state
    from fastdm_tpu.parallel.pipeline import shard_model_stacks_pp

    cfg = WanConfig(num_attention_heads=2, attention_head_dim=24, in_channels=4,
                    out_channels=4, text_dim=16, freq_dim=8, ffn_dim=32,
                    num_layers=2, text_len=8, quant="int8")
    params = wan_init_random(jax.random.key(0), cfg)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 2, 8, 8), jnp.bfloat16)
    text = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    t = jnp.full((1,), 500.0)

    ref = wan_forward(params, cfg, lat, t, text)

    import numpy as onp
    mesh = Mesh(onp.asarray(jax.devices()[:2]).reshape(1, 1, 1, 2),
                ("dp", "sp", "tp", "pp"))
    sharded = dict(params)
    sharded.update(shard_model_stacks_pp(
        {k2: v for k2, v in params.items() if k2 in ("blocks", "dense_blocks")
         and v is not None}, mesh))
    pp_state.set_pp_mesh(mesh)
    try:
        out = wan_forward(sharded, cfg, lat, t, text)
    finally:
        pp_state.set_pp_mesh(None)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2)


def test_engine_rejects_pp_with_tp_or_sp():
    from fastdm_tpu.engine import FastDMEngine

    with pytest.raises(ValueError, match="pp > 1 requires"):
        FastDMEngine("/nonexistent", architecture="flux",
                     mesh_shape=(1, 1, 2, 2))
    with pytest.raises(ValueError, match="mesh_shape must be"):
        FastDMEngine("/nonexistent", architecture="flux", mesh_shape=(2, 2))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_int4p_qlinear_under_tp_matches_single_device():
    """The packed-halves int4 carrier stays correct when its K//2 dim is
    tp-sharded (row-parallel rule P(None, 'tp', None) on w4p): the unpack
    concat makes the packed-K sharding misalign with the activation K, and
    GSPMD must reshard rather than silently mis-stitch the halves
    (layers/qlinear.py pack_int4 layout note). Covers both row- and
    column-parallel placements over stacked block leaves."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fastdm_tpu.layers.qlinear import quantize_weight, qlinear_apply
    from fastdm_tpu.parallel.mesh import AXES, generic_param_pspec

    kk, nn, layers = 64, 64, 2  # square so layers chain through the scan
    ws = [jax.random.normal(jax.random.key(40 + i), (kk, nn), jnp.float32) * 0.02
          for i in range(layers)]
    ws = [w.at[:, 1].mul(25.0) for w in ws]  # outlier column -> branch active
    per_layer = [quantize_weight(w, "int4p", jnp.ones((nn,), jnp.float32))
                 for w in ws]
    stacked = {k: jnp.stack([p[k] for p in per_layer]) for k in per_layer[0]}
    x = jax.random.normal(jax.random.key(50), (4, kk), jnp.bfloat16)

    def run_stack(params, x):
        def body(h, layer):
            return qlinear_apply(layer, h), None
        h, _ = jax.lax.scan(body, x, params)
        return h

    ref = jax.jit(run_stack)(stacked, x)

    import numpy as onp
    mesh = jax.sharding.Mesh(onp.asarray(jax.devices()[:2]).reshape(1, 1, 2),
                             AXES)
    for role in ("blocks.ff.proj", "blocks.ff.out"):  # col- and row-parallel
        sharded = {
            k: jax.device_put(v, NamedSharding(
                mesh, generic_param_pspec(f"{role}.{k}")))
            for k, v in stacked.items()
        }
        spec = generic_param_pspec(f"{role}.w4p")
        assert "tp" in jax.tree_util.tree_leaves(spec) or spec != P()
        out = jax.jit(run_stack)(sharded, x)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_qwen_forward_pp_state_matches_sequential():
    """qwen_run_blocks routes its homogeneous 60-block stack through GPipe
    when a pp mesh is active — Qwen-Image is the weights-don't-fit case PP
    exists for (13.6 GB int8 > one 16 GB chip)."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from fastdm_tpu.models.qwenimage import (
        QwenImageConfig, qwen_forward, qwen_init_random, qwen_rope_cos_sin,
    )
    from fastdm_tpu.parallel import pp_state
    from fastdm_tpu.parallel.pipeline import shard_model_stacks_pp

    cfg = QwenImageConfig(num_layers=2, attention_head_dim=32,
                          num_attention_heads=2, joint_attention_dim=24,
                          in_channels=16, out_channels=4,
                          axes_dims_rope=(8, 12, 12), quant="int8")
    params = qwen_init_random(jax.random.key(0), cfg)
    b, txt, ht, wt = 2, 6, 4, 4
    k = jax.random.key(1)
    hidden = jax.random.normal(k, (b, ht * wt, cfg.in_channels), jnp.bfloat16)
    encoder = jax.random.normal(k, (b, txt, cfg.joint_attention_dim), jnp.bfloat16)
    t = jnp.full((b,), 0.5, jnp.float32)
    cos, sin = qwen_rope_cos_sin(cfg, 1, ht, wt, txt)

    ref = qwen_forward(params, cfg, hidden, encoder, t, cos, sin)

    import numpy as onp
    mesh = Mesh(onp.asarray(jax.devices()[:2]).reshape(1, 1, 1, 2),
                ("dp", "sp", "tp", "pp"))
    sharded = shard_model_stacks_pp(params, mesh)
    pp_state.set_pp_mesh(mesh)
    try:
        out = jax.jit(qwen_forward, static_argnames="cfg")(
            sharded, cfg, hidden, encoder, t, cos, sin)
    finally:
        pp_state.set_pp_mesh(None)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2)


def test_engine_rejects_pp_for_unrouted_configs():
    """pp > 1 must fail loudly where no GPipe routing exists — a pp-sharded
    stack consumed by a sequential scan would make GSPMD gather full weights
    per chip (the exact OOM pp is bought to avoid)."""
    from fastdm_tpu.engine import FastDMEngine

    with pytest.raises(ValueError, match="not supported for architecture"):
        FastDMEngine("/nonexistent", architecture="sd35",
                     mesh_shape=(1, 1, 1, 2))
    with pytest.raises(ValueError, match="not supported for architecture"):
        FastDMEngine("/nonexistent", architecture="sdxl",
                     mesh_shape=(1, 1, 1, 2))
    with pytest.raises(ValueError, match="incompatible with controlnet"):
        FastDMEngine("/nonexistent", architecture="flux",
                     mesh_shape=(1, 1, 1, 2), controlnet_path="/nonexistent-cn")


def test_engine_rejects_pp_with_probe_prefix_caches():
    """FBCache/DiCache probe the first block(s) standalone and then run the
    rest with start_block > 0 — that prefix split bypasses the GPipe route,
    so a sequential scan over pp-sharded stacks would gather full weights per
    chip (ADVICE r3). TeaCache replays the full stack and stays allowed."""
    from fastdm_tpu.engine import FastDMEngine

    for algo in ("fbcache", "dicache"):
        with pytest.raises(ValueError, match="probe-prefix"):
            FastDMEngine("/nonexistent", architecture="flux",
                         mesh_shape=(1, 1, 1, 2),
                         cache_config={"cache_algorithm": algo,
                                       "enable_caching": True})
    # teacache passes this gate (fails later on the nonexistent path instead)
    with pytest.raises(Exception) as ei:
        FastDMEngine("/nonexistent", architecture="flux",
                     mesh_shape=(1, 1, 1, 2),
                     cache_config={"cache_algorithm": "teacache",
                                   "enable_caching": True})
    assert "probe-prefix" not in str(ei.value)
    # disabled probe-prefix cache also passes the gate
    with pytest.raises(Exception) as ei:
        FastDMEngine("/nonexistent", architecture="flux",
                     mesh_shape=(1, 1, 1, 2),
                     cache_config={"cache_algorithm": "fbcache",
                                   "enable_caching": False})
    assert "probe-prefix" not in str(ei.value)
