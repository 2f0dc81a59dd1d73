"""Shared NHWC conv / groupnorm primitives for UNet + VAE paths.

NHWC is the TPU-native conv layout (channel-last lands on the lane dim).
Weights are stored HWIO; diffusers (out,in,kh,kw) checkpoints are transposed
once at load. Convs accumulate in f32.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def conv2d(params: Dict[str, Array], x: Array, stride: int = 1, padding="SAME") -> Array:
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        params["w"].astype(jnp.bfloat16),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + params["b"].astype(jnp.float32)).astype(jnp.bfloat16)


def group_norm(
    params: Optional[Dict[str, Array]], x: Array, groups: int, eps: float = 1e-6
) -> Array:
    b, h, w, c = x.shape
    x32 = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
    var = jnp.var(x32, axis=(1, 3), keepdims=True)
    x32 = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    if params is not None:
        x32 = x32 * params["gamma"].astype(jnp.float32) + params["beta"].astype(jnp.float32)
    return x32.astype(x.dtype)


def upsample_nearest2x(x: Array) -> Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def conv_from_torch(w: np.ndarray, b) -> Dict[str, Array]:
    """(out,in,kh,kw) torch conv weight -> HWIO param dict."""
    w = np.asarray(w, np.float32)
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), jnp.bfloat16),
        "b": jnp.asarray(np.asarray(b, np.float32), jnp.float32),
    }
