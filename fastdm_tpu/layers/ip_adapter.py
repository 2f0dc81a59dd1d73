"""IP-Adapter image-projection modules (ref: fastdm/layer/embeddings.py:
FastdmImageProjection :592, FastdmMultiIPAdapterImageProjection :618,
FastdmIPAdapterPlusImageProjection resampler :685 + blocks :642).

Pure functions over param dicts; feed the `ip_embeds` consumed by the SDXL
cross-attention branch (models/sdxl.py _attention's ipadp_kv path).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from fastdm_tpu.kernels import scaled_dot_product_attention
from fastdm_tpu.layers.normalization import layer_norm
from fastdm_tpu.layers.qlinear import qlinear_apply

Array = jax.Array


def image_projection_apply(params, image_embeds: Array, num_tokens: int = 4) -> Array:
    """CLIP image embedding -> num_tokens context tokens
    (ref: FastdmImageProjection.forward)."""
    b = image_embeds.shape[0]
    x = qlinear_apply(params["proj"], image_embeds)
    x = x.reshape(b, num_tokens, -1)
    return layer_norm(x, params["norm"]["gamma"], params["norm"]["beta"], 1e-5)


def multi_image_projection_apply(layers_params: List, image_embeds: List[Array],
                                 num_tokens: int = 4) -> List[Array]:
    """(ref: FastdmMultiIPAdapterImageProjection.forward)"""
    out = []
    for p, emb in zip(layers_params, image_embeds):
        b, n = emb.shape[0], emb.shape[1]
        flat = emb.reshape((b * n,) + emb.shape[2:])
        proj = image_projection_apply(p, flat, num_tokens)
        out.append(proj.reshape((b, n) + proj.shape[1:]))
    return out


def _resampler_block(params, x: Array, latents: Array, heads: int, head_dim: int) -> Array:
    """Perceiver-style resampler block (ref: IPAdapterPlusImageProjectionBlock)."""
    residual = latents
    enc = layer_norm(x, params["norm0"]["gamma"], params["norm0"]["beta"], 1e-5)
    lat_n = layer_norm(latents, params["norm1"]["gamma"], params["norm1"]["beta"], 1e-5)
    kv_src = jnp.concatenate([enc, lat_n], axis=-2)

    q = qlinear_apply(params["attn"]["q"], lat_n)
    kv = qlinear_apply(params["attn"]["kv"], kv_src)
    c = q.shape[-1]
    k, v = kv[..., :c], kv[..., c:]
    attn = scaled_dot_product_attention(q, k, v, heads, heads, head_dim, False, head_dim**-0.5)
    latents = qlinear_apply(params["attn"]["out"], attn.astype(latents.dtype)) + residual

    ff_in = latents
    h = layer_norm(latents, params["ff_norm"]["gamma"], params["ff_norm"]["beta"], 1e-5)
    h = qlinear_apply(params["ff"]["proj"], h)
    h = jax.nn.gelu(h, approximate=False)
    return qlinear_apply(params["ff"]["out"], h) + ff_in


def ip_adapter_plus_projection_apply(params, x: Array, heads: int = 16,
                                     head_dim: int = 64) -> Array:
    """IP-Adapter-Plus resampler (ref: FastdmIPAdapterPlusImageProjection).

    x: (B, S_img_tokens, embed_dims) CLIP penultimate features."""
    b = x.shape[0]
    latents = jnp.broadcast_to(params["latents"], (b,) + params["latents"].shape[1:])
    x = qlinear_apply(params["proj_in"], x)
    for blk in params["layers"]:
        latents = _resampler_block(blk, x, latents, heads, head_dim)
    latents = qlinear_apply(params["proj_out"], latents)
    return layer_norm(latents, params["norm_out"]["gamma"], params["norm_out"]["beta"], 1e-5)
