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
