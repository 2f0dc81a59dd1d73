"""DiT attention layers (ref: fastdm/layer/transformer.py:64-391).

Joint (dual-stream) attention for FLUX/SD3.5/Qwen: fused-QKV projections,
per-head RMSNorm on q/k, optional context stream concatenated in front of the
image stream, fused RoPE, flash sdpa, split + output projections.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fastdm_tpu.kernels import rms_norm, rotary_pos_embedding, scaled_dot_product_attention
from fastdm_tpu.layers.qlinear import qlinear_apply

Array = jax.Array


def _qk_headnorm(x: Array, weight: Optional[Array], heads: int, eps: float) -> Array:
    """Per-head RMSNorm: reshape (B,S,H*D)->(B,S,H,D), normalize last dim."""
    if weight is None:
        return x
    b, s, hd = x.shape
    y = rms_norm(x.reshape(b, s, heads, hd // heads), weight, eps)
    return y.reshape(b, s, hd)


def attention_apply(
    params,
    hidden_states: Array,
    encoder_hidden_states: Optional[Array],
    *,
    heads: int,
    head_dim: int,
    rope_cos: Optional[Array] = None,
    rope_sin: Optional[Array] = None,
    pre_only: bool = False,
    context_pre_only: bool = False,
    eps: float = 1e-6,
    qkv_override: Optional[Array] = None,
) -> Array | Tuple[Array, Array]:
    """(ref: Attention.forward, fastdm/layer/transformer.py:232-317)

    Returns attn output; with a context stream, returns (hidden, encoder)
    pair. context_pre_only=False (the default, matching the reference)
    projects the context stream through to_add_out; True skips the
    projection (SD3.5's last block).

    qkv_override: a precomputed (B, S, 3*inner_dim) fused-QKV projection —
    used by blocks that fold the QKV projection into a wider shared matmul
    (FLUX single blocks fuse qkv+mlp_in so the input is quantized once).
    """
    if encoder_hidden_states is not None and "add_qkv" not in params:
        raise ValueError(
            "encoder_hidden_states passed but params has no 'add_qkv' "
            "context projections — the joint split would be silently wrong"
        )
    inner_dim = heads * head_dim
    if qkv_override is not None:
        qkv = qkv_override
    else:
        qkv = qlinear_apply(params["qkv"], hidden_states)
    q = qkv[..., :inner_dim]
    k = qkv[..., inner_dim : 2 * inner_dim]
    v = qkv[..., 2 * inner_dim :]

    q = _qk_headnorm(q, params.get("norm_q"), heads, eps)
    k = _qk_headnorm(k, params.get("norm_k"), heads, eps)

    if encoder_hidden_states is not None and "add_qkv" in params:
        ctx_qkv = qlinear_apply(params["add_qkv"], encoder_hidden_states)
        cq = ctx_qkv[..., :inner_dim]
        ck = ctx_qkv[..., inner_dim : 2 * inner_dim]
        cv = ctx_qkv[..., 2 * inner_dim :]
        cq = _qk_headnorm(cq, params.get("norm_added_q"), heads, eps)
        ck = _qk_headnorm(ck, params.get("norm_added_k"), heads, eps)
        # context tokens go FIRST (ref: transformer.py:293-295)
        q = jnp.concatenate([cq, q], axis=1)
        k = jnp.concatenate([ck, k], axis=1)
        v = jnp.concatenate([cv, v], axis=1)

    if rope_cos is not None:
        q, k = rotary_pos_embedding(q, k, head_dim, rope_cos, rope_sin, is_neox=False)

    out = scaled_dot_product_attention(q, k, v, heads, heads, head_dim, False, head_dim**-0.5)
    out = out.astype(hidden_states.dtype)

    if encoder_hidden_states is not None:
        ctx_len = encoder_hidden_states.shape[1]
        ctx_out, img_out = out[:, :ctx_len], out[:, ctx_len:]
        if not context_pre_only:
            ctx_out = qlinear_apply(params["to_add_out"], ctx_out)
        if not pre_only:
            img_out = qlinear_apply(params["to_out"], img_out)
        return img_out, ctx_out
    if not pre_only:
        out = qlinear_apply(params["to_out"], out)
    return out


def qwen_attention_apply(
    params,
    hidden_states: Array,
    encoder_hidden_states: Array,
    *,
    heads: int,
    head_dim: int,
    rope_cos: Array,
    rope_sin: Array,
    eps: float = 1e-6,
) -> Tuple[Array, Array]:
    """Qwen-Image joint attention (ref: Attention.forward_qwen,
    transformer.py:319-391). Identical op order to attention_apply's joint
    branch — text-first concat, per-head q/k norms, joint RoPE, projected
    split — so it delegates. Returns (img_attn_out, txt_attn_out)."""
    return attention_apply(
        params, hidden_states, encoder_hidden_states,
        heads=heads, head_dim=head_dim, rope_cos=rope_cos, rope_sin=rope_sin,
        context_pre_only=False, eps=eps,
    )
