"""IP-Adapter projections: shapes + resampler block behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.layers.ip_adapter import (
    image_projection_apply,
    ip_adapter_plus_projection_apply,
)
from fastdm_tpu.layers.qlinear import qlinear_random


def test_image_projection_shapes():
    k = jax.random.key(0)
    params = {
        "proj": qlinear_random(k, 16, 4 * 32, quant=None),
        "norm": {"gamma": jnp.ones((32,), jnp.bfloat16),
                 "beta": jnp.zeros((32,), jnp.bfloat16)},
    }
    emb = jax.random.normal(k, (2, 16), jnp.bfloat16)
    out = image_projection_apply(params, emb, num_tokens=4)
    assert out.shape == (2, 4, 32)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_ip_adapter_plus_resampler():
    k = jax.random.key(1)
    hd, heads, hidden, out_d, nq = 8, 2, 16, 24, 4
    ks = jax.random.split(k, 8)

    def norm(c):
        return {"gamma": jnp.ones((c,), jnp.bfloat16), "beta": jnp.zeros((c,), jnp.bfloat16)}

    blk = {
        "norm0": norm(hidden), "norm1": norm(hidden),
        "attn": {
            "q": qlinear_random(ks[0], hidden, hidden, bias=False, quant=None),
            "kv": qlinear_random(ks[1], hidden, 2 * hidden, bias=False, quant=None),
            "out": qlinear_random(ks[2], hidden, hidden, bias=False, quant=None),
        },
        "ff_norm": norm(hidden),
        "ff": {
            "proj": qlinear_random(ks[3], hidden, 4 * hidden, bias=False, quant=None),
            "out": qlinear_random(ks[4], 4 * hidden, hidden, bias=False, quant=None),
        },
    }
    params = {
        "latents": jax.random.normal(ks[5], (1, nq, hidden), jnp.bfloat16) * 0.1,
        "proj_in": qlinear_random(ks[6], 12, hidden, quant=None),
        "proj_out": qlinear_random(ks[7], hidden, out_d, quant=None),
        "norm_out": norm(out_d),
        "layers": [blk, blk],
    }
    x = jax.random.normal(k, (3, 10, 12), jnp.bfloat16)
    out = ip_adapter_plus_projection_apply(params, x, heads=heads, head_dim=hd)
    assert out.shape == (3, nq, out_d)
    assert np.isfinite(np.asarray(out, np.float32)).all()
