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


def feedforward_apply(params, x: Array, activation_fn: str = "geglu",
                      chunk_tokens: int = 0) -> Array:
    """chunk_tokens > 0 (and dividing the token count): lax.scan the FFN over
    token chunks. Exact — every op is per-row — and shrinks the live set from
    O(S * ffn_dim) to O(chunk * ffn_dim): at Wan-A14B 720p/81f the unchunked
    FFN's f32 quantize upcast + activation buffers at 13824 width are the HBM
    high-water of the whole forward (75600x13824 f32 = 3.9 GiB each; the
    cached branch program peaked 16.7 GiB > one v5e, 2026-08-21). MXU
    efficiency is preserved for chunks >= ~4k rows."""
    s = x.shape[-2]
    if chunk_tokens and s > chunk_tokens and s % chunk_tokens == 0:
        # unrolled concat, NOT lax.scan — scan's stacked output layout
        # forces a full-size copy at the next custom-call boundary (see
        # qlinear_apply chunking note)
        ys = [
            feedforward_apply(params, x[..., i : i + chunk_tokens, :],
                              activation_fn)
            for i in range(0, s, chunk_tokens)
        ]
        return jnp.concatenate(ys, axis=-2)
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
