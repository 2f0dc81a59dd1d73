"""QLinear: THE quantized linear layer (ref: fastdm/layer/qlinear.py).

A QLinear is a param dict (pytree):
    {"w": (K, N) int8|float8_e4m3fn|bf16,
     "scale": (N,) float32 per-output-channel weight scale (quantized only),
     "colsum": (N,) int32 column sums of int8 weights (int8 only, azp_adj),
     "bias": (N,) bf16 | absent}

Weights are quantized once at load time (per-channel symmetric); activations
are quantized per-token at each call (int8 asymmetric / fp8 symmetric), then
the dispatched W8A8 matmul runs with the dequant epilogue fused
(ref math: doc/introduction.md:38-42).

The quantization mode is carried by the weight dtype, so the apply function
branches at trace time with no extra static config — mirroring the reference's
dtype-driven dispatch (fastdm/layer/qlinear.py:69-76).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from fastdm_tpu.kernels import (
    fp8_matmul,
    int8_matmul,
    quantize_to_fp8,
    quantize_to_int8,
)

Array = jax.Array
Params = Dict[str, Array]

_FP8_MAX = 448.0


def quantize_weight(w: Array, quant: Optional[str], bias: Optional[Array] = None) -> Params:
    """Quantize a (K, N) weight at load time.

    quant: None/"bf16" (no quant), "int8" (per-channel symmetric + colsum),
    "fp8" (per-channel symmetric e4m3).
    (ref: QLinear.weight_loading_and_quant, fastdm/layer/qlinear.py:18-54)
    """
    params: Params = {}
    if quant in (None, "bf16"):
        params["w"] = w.astype(jnp.bfloat16)
    elif quant == "int8":
        w32 = w.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(w32), axis=0), 1e-12)
        scale = amax / 127.0
        q = jnp.clip(jnp.round(w32 / scale[None, :]), -128, 127).astype(jnp.int8)
        params["w"] = q
        params["scale"] = scale
        params["colsum"] = jnp.sum(q.astype(jnp.int32), axis=0)
    elif quant == "fp8":
        w32 = w.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(w32), axis=0), 1e-12)
        scale = amax / _FP8_MAX
        q = jnp.clip(w32 / scale[None, :], -_FP8_MAX, _FP8_MAX).astype(jnp.float8_e4m3fn)
        params["w"] = q
        params["scale"] = scale
    else:
        raise ValueError(f"unsupported quant type {quant!r}")
    if bias is not None:
        params["bias"] = bias.astype(jnp.bfloat16)
    return params


def fuse_and_quantize(
    weights: Sequence[Array], biases: Sequence[Optional[Array]], quant: Optional[str]
) -> Params:
    """Concatenate fused projections (qkv / kv) along N, then quantize.

    Each weight is (K, N_i) — already transposed from checkpoint (out,in) layout
    by the loader. (ref: fastdm/layer/qlinear.py:22-31)
    """
    w = weights[0] if len(weights) == 1 else jnp.concatenate(list(weights), axis=1)
    bias = None
    if biases and any(b is not None for b in biases):
        # a mixed set (some projections bias-free) still needs the full-width
        # concat — zero-fill the missing segments rather than silently
        # dropping every bias (or crashing) based on biases[0] alone
        segs = [
            b if b is not None else jnp.zeros((wi.shape[1],), jnp.float32)
            for b, wi in zip(biases, weights)
        ]
        bias = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=0)
    return quantize_weight(w, quant, bias)


def qlinear_random(
    key: Array, in_features: int, out_features: int, *, bias: bool = True,
    quant: Optional[str] = None, w_std: float = 0.02,
) -> Params:
    """Random-initialized QLinear (profiling / tests without checkpoints).

    Quantized variants are generated DIRECTLY in the target dtype — no f32
    master is ever materialized. A 12B-model random init through the
    f32->quantize path transiently holds gigabytes of masters, which the
    lazy-committing TPU allocator never reclaims in time (observed OOM)."""
    kw, kb = jax.random.split(key)
    b = jax.random.normal(kb, (out_features,), jnp.bfloat16) * 0.01 if bias else None
    params: Params = {}
    if quant == "int8":
        params["w"] = jax.random.randint(kw, (in_features, out_features), -127, 128, jnp.int8)
        params["scale"] = jnp.full((out_features,), w_std / 127.0, jnp.float32)
        params["colsum"] = jnp.sum(params["w"].astype(jnp.int32), axis=0)
    elif quant == "fp8":
        # e4m3fn has no inf — clip before the cast or tails become NaN
        params["w"] = jnp.clip(
            jax.random.normal(kw, (in_features, out_features), jnp.bfloat16) * 150.0,
            -448.0, 448.0,
        ).astype(jnp.float8_e4m3fn)
        params["scale"] = jnp.full((out_features,), w_std / 448.0, jnp.float32)
    else:
        params["w"] = jax.random.normal(kw, (in_features, out_features), jnp.bfloat16) * w_std
    if b is not None:
        params["bias"] = b
    return params


def qlinear_apply(params: Params, x: Array) -> Array:
    """y = x @ w (+ bias), with per-token activation quantization when the
    weight is int8/fp8. x: (..., K) -> (..., N). (ref: QLinear.forward)"""
    w = params["w"]
    bias = params.get("bias")
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1])
    if w.dtype == jnp.int8:
        xq, xs, xzp = quantize_to_int8(x2, symmetric=False)
        out = int8_matmul(
            xq, w, xs, params["scale"], x.dtype, params["colsum"], xzp, bias
        )
    elif w.dtype == jnp.float8_e4m3fn:
        xq, xs = quantize_to_fp8(x2)
        out = fp8_matmul(xq, w, xs, params["scale"], x.dtype, bias)
    else:
        out = jnp.dot(x2, w.astype(x.dtype), preferred_element_type=jnp.float32)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        out = out.astype(x.dtype)
    return out.reshape(*orig_shape[:-1], w.shape[-1])
