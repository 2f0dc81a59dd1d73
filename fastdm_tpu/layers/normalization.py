"""Normalization layers (ref: fastdm/layer/normalization.py).

Pure functions; the AdaLN family takes a {"linear": QLinear-params} dict and
returns the modulated hidden states plus gate/shift/scale chunks. LayerNorm
accumulates in float32 (matches torch F.layer_norm numerics on bf16 inputs).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fastdm_tpu.kernels import rms_norm
from fastdm_tpu.layers.qlinear import qlinear_apply

Array = jax.Array


def layer_norm(
    x: Array, gamma: Optional[Array] = None, beta: Optional[Array] = None,
    eps: float = 1e-6,
) -> Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma.astype(jnp.float32)
    if beta is not None:
        y = y + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def fp32_layer_norm(
    x: Array, gamma: Optional[Array] = None, beta: Optional[Array] = None,
    eps: float = 1e-5,
) -> Array:
    """FP32 island: compute in f32 and RETURN f32 — the reference's
    FP32LayerNorm hands `F.layer_norm(x.float())` to the fp32 modulation
    without a bf16 round-trip (ref normalization.py:130-160; consumers cast
    after modulating, wan.py:95-112,371)."""
    return layer_norm(x.astype(jnp.float32), gamma, beta, eps)


def rms_norm_affine(x: Array, weight: Optional[Array], eps: float) -> Array:
    """RMSNorm with optional affine (ref: normalization.py:16-43)."""
    return rms_norm(x, weight, eps)


def ada_layer_norm_zero(
    params, x: Array, emb: Array, eps: float = 1e-6
) -> Tuple[Array, Array, Array, Array, Array]:
    """adaLN-Zero, 6-chunk modulation (ref: normalization.py:162-199).

    Returns (modulated_x, gate_msa, shift_mlp, scale_mlp, gate_mlp).
    """
    mod = qlinear_apply(params["linear"], jax.nn.silu(emb))
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
        mod, 6, axis=-1
    )
    x = layer_norm(x, eps=eps) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


def ada_layer_norm_zero_single(
    params, x: Array, emb: Array, eps: float = 1e-6
) -> Tuple[Array, Array]:
    """adaLN-Zero 3-chunk variant for Flux single blocks (ref: :201-236)."""
    mod = qlinear_apply(params["linear"], jax.nn.silu(emb))
    shift_msa, scale_msa, gate_msa = jnp.split(mod, 3, axis=-1)
    x = layer_norm(x, eps=eps) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    return x, gate_msa


def ada_layer_norm_continuous(
    params, x: Array, conditioning: Array, eps: float = 1e-6,
    gamma: Optional[Array] = None, beta: Optional[Array] = None,
) -> Array:
    """2-chunk (scale, shift) continuous AdaLN (ref: :90-128)."""
    mod = qlinear_apply(params["linear"], jax.nn.silu(conditioning).astype(x.dtype))
    scale, shift = jnp.split(mod, 2, axis=-1)
    return layer_norm(x, gamma, beta, eps) * (1 + scale)[:, None, :] + shift[:, None, :]


def sd35_ada_layer_norm_zero_x(
    params, x: Array, emb: Array, eps: float = 1e-6
) -> Tuple[Array, ...]:
    """SD3.5 dual-attention 9-chunk AdaLN (ref: normalization.py:45-87).

    Returns (x_mod, gate_msa, shift_mlp, scale_mlp, gate_mlp, x_mod2, gate_msa2).
    """
    mod = qlinear_apply(params["linear"], jax.nn.silu(emb).astype(x.dtype))
    (
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp,
        shift_msa2, scale_msa2, gate_msa2,
    ) = jnp.split(mod, 9, axis=-1)
    norm_x = layer_norm(x, eps=eps)
    x_mod = norm_x * (1 + scale_msa[:, None]) + shift_msa[:, None]
    x_mod2 = norm_x * (1 + scale_msa2[:, None]) + shift_msa2[:, None]
    return x_mod, gate_msa, shift_mlp, scale_mlp, gate_mlp, x_mod2, gate_msa2
