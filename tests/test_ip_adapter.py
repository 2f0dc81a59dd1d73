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


def test_sdxl_attach_ip_adapter_plus_layout():
    """Official IP-Adapter-Plus resampler checkpoint layout loads and the
    projected tokens condition the SDXL attention branch."""
    import numpy as np

    from fastdm_tpu.layers.ip_adapter import ip_adapter_plus_projection_apply
    from fastdm_tpu.models.loader import TensorSource
    from fastdm_tpu.models.sdxl import SDXLConfig, sdxl_attach_ip_adapter, sdxl_init_random

    cfg = SDXLConfig(
        block_channels=(8, 16, 32), cross_attention_dim=16, attn_layers=(0, 1, 2),
        head_dim=8, addition_time_embed_dim=4, time_embed_dim=16,
        add_embedding_in_dim=32, norm_groups=4, quant=None,
    )
    rng = np.random.default_rng(0)
    hidden, embed, out_dim, queries, depth = 64, 24, cfg.cross_attention_dim, 4, 2

    sd = {}
    idx = 0
    # processor order = diffusers registration order: down, up, MID LAST
    for ch, nl, cnt in ((16, 1, 2), (32, 2, 2), (32, 2, 3), (16, 1, 3), (32, 2, 1)):
        for _ in range(cnt):
            for _ in range(nl):
                idx += 1
                for n in ("to_k_ip", "to_v_ip"):
                    sd[f"ip_adapter.{idx}.{n}.weight"] = (
                        rng.standard_normal((ch, out_dim)).astype(np.float32) * 0.1)
                idx += 1

    def lin(name, k, n):
        sd[f"{name}.weight"] = rng.standard_normal((n, k)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros((n,), np.float32)

    def ln(name, c):
        sd[f"{name}.weight"] = np.ones((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)

    sd["image_proj.latents"] = rng.standard_normal((1, queries, hidden)).astype(np.float32) * 0.1
    lin("image_proj.proj_in", embed, hidden)
    lin("image_proj.proj_out", hidden, out_dim)
    ln("image_proj.norm_out", out_dim)
    for i in range(depth):
        ln(f"image_proj.layers.{i}.0.norm1", hidden)
        ln(f"image_proj.layers.{i}.0.norm2", hidden)
        lin(f"image_proj.layers.{i}.0.to_q", hidden, hidden)
        lin(f"image_proj.layers.{i}.0.to_kv", hidden, 2 * hidden)
        lin(f"image_proj.layers.{i}.0.to_out", hidden, hidden)
        ln(f"image_proj.layers.{i}.1.0", hidden)
        lin(f"image_proj.layers.{i}.1.1", hidden, 4 * hidden)
        lin(f"image_proj.layers.{i}.1.3", 4 * hidden, hidden)

    params = sdxl_init_random(jax.random.key(0), cfg)
    proj = sdxl_attach_ip_adapter(params, TensorSource(sd), cfg)
    assert proj["kind"] == "plus" and proj["num_tokens"] == queries
    assert proj["heads"] == 1  # hidden 64 / head_dim 64

    x = jnp.asarray(rng.standard_normal((1, 10, embed)), jnp.bfloat16)
    tokens = ip_adapter_plus_projection_apply(proj, x, heads=proj["heads"],
                                              head_dim=proj["head_dim"])
    assert tokens.shape == (1, queries, out_dim)
    assert np.isfinite(np.asarray(tokens, np.float32)).all()
