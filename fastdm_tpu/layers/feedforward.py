"""FeedForward with the reference's activation zoo
(ref: fastdm/layer/transformer.py:14-62, fastdm/layer/activations.py).

params: {"proj": QLinear, "out": QLinear}; activation_fn is static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastdm_tpu.kernels import gelu_and_mul
from fastdm_tpu.layers.qlinear import qlinear_apply

Array = jax.Array


def feedforward_apply(params, x: Array, activation_fn: str = "geglu") -> Array:
    h = qlinear_apply(params["proj"], x)
    if activation_fn == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    elif activation_fn == "gelu-approximate":
        h = jax.nn.gelu(h, approximate=True)
    elif activation_fn == "geglu":
        # hidden * GELU(gate), gate = second half -> the gelu_and_mul kernel
        h = gelu_and_mul(h)
    elif activation_fn == "geglu-approximate":
        # ApproximateGELU: x * sigmoid(1.702 x) on the full projection
        h = h * jax.nn.sigmoid(1.702 * h)
    elif activation_fn == "swiglu":
        d = h.shape[-1] // 2
        h = h[..., :d] * jax.nn.silu(h[..., d:])
    else:
        raise ValueError(f"unknown activation_fn {activation_fn!r}")
    return qlinear_apply(params["out"], h)
