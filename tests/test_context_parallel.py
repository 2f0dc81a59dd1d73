"""Ring attention (context parallelism) vs single-device attention oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastdm_tpu.parallel.context_parallel import make_cp_attention


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_ring_attention_matches_dense():
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4, 1)
    mesh = Mesh(devs, ("dp", "sp", "tp"))

    b, s, h, d = 1, 256, 4, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

    attn = make_cp_attention(mesh, "sp")
    sharding = NamedSharding(mesh, P(None, "sp", None, None))
    out = attn(*(jax.device_put(x, sharding) for x in (q, k, v)))

    # dense oracle
    logits = np.einsum("bqhd,bkhd->bhqk", np.asarray(q), np.asarray(k)) * d**-0.5
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_ring_sdpa_backend_matches_jnp():
    """The registered 'ring' sdpa backend (flattened-head op contract) equals
    the jnp oracle, and the auto policy routes to it only while a CP mesh is
    active."""
    from fastdm_tpu.kernels import scaled_dot_product_attention
    from fastdm_tpu.kernels.registry import kernel_registry
    from fastdm_tpu.parallel import cp_state

    devs = np.asarray(jax.devices()[:4]).reshape(1, 4, 1)
    mesh = Mesh(devs, ("dp", "sp", "tp"))

    b, s, heads, d = 1, 128, 4, 32
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, s, heads * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, heads * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, heads * d)), jnp.float32)

    ref = np.asarray(
        kernel_registry.select("sdpa", "jnp")(q, k, v, heads, heads, d, False, None)
    )
    assert kernel_registry.backend_for("sdpa") != "ring"
    cp_state.set_cp_mesh(mesh)
    try:
        assert kernel_registry.backend_for("sdpa") == "ring"
        out = np.asarray(scaled_dot_product_attention(q, k, v, heads, heads, d))
    finally:
        cp_state.set_cp_mesh(None)
    assert kernel_registry.backend_for("sdpa") != "ring"
    np.testing.assert_allclose(out, ref, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_wan_forward_under_cp_mesh_matches_single():
    """A full wan forward with sequence-parallel ring attention active equals
    the single-device forward (the 81f/720p scale-out path, scaled down)."""
    from fastdm_tpu.models.wan import WanConfig, wan_forward, wan_init_random
    from fastdm_tpu.parallel import cp_state
    from fastdm_tpu.parallel.mesh import AXES

    cfg = WanConfig(num_attention_heads=2, attention_head_dim=24, in_channels=4,
                    out_channels=4, text_dim=16, freq_dim=8, ffn_dim=32,
                    num_layers=2, text_len=8, quant="int8")
    params = wan_init_random(jax.random.key(0), cfg)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 2, 16, 16), jnp.bfloat16)  # 128 tokens
    text = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    t = jnp.full((1,), 500.0)

    ref = np.asarray(wan_forward(params, cfg, lat, t, text), np.float32)

    devs = np.asarray(jax.devices()[:8]).reshape(1, 8, 1)
    mesh = Mesh(devs, AXES)
    cp_state.set_cp_mesh(mesh)
    try:
        out = np.asarray(wan_forward(params, cfg, lat, t, text), np.float32)
    finally:
        cp_state.set_cp_mesh(None)
    # same math, different reduction walk (ring online-softmax) in bf16
    assert np.abs(out - ref).max() < 0.1
    assert np.abs(out - ref).mean() < 0.01
