"""SD3.5-medium MMDiT core (ref: fastdm/model/sd35.py).

TPU design notes:
  * The 24 joint blocks are heterogeneous (layers 0-12 dual-attention,
    13-22 standard, 23 context_pre_only) — they are grouped into three
    homogeneous segments: two lax.scan stacks + one unrolled final block.
  * Patchify is a reshape+matmul (stride-p conv == per-patch linear), which
    lands on the MXU without a conv lowering.
  * The SD3 cropped 2D sincos pos-embed table is computed host-side once per
    resolution (ref: PatchEmbed.cropped_pos_embed, embeddings.py:324-345).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.layers.attention import attention_apply
from fastdm_tpu.layers.embeddings import (
    combined_timestep_text_proj_apply,
    sincos_pos_embed_2d,
)
from fastdm_tpu.layers.feedforward import feedforward_apply
from fastdm_tpu.layers.normalization import (
    ada_layer_norm_continuous,
    ada_layer_norm_zero,
    layer_norm,
    sd35_ada_layer_norm_zero_x,
)
from fastdm_tpu.layers.qlinear import qlinear_apply, qlinear_random
from fastdm_tpu.models.loader import TensorSource, stack_blocks

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SD3Config:
    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 384
    num_dual_layers: int = 13  # layers [0, 13) use dual attention (sd3.5)
    quant: Optional[str] = "int8"

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


# ---------------------------------------------------------------- params


def _attn_random(key, cfg, *, with_context: bool, context_pre_only: bool, quant):
    d = cfg.inner_dim
    ks = jax.random.split(key, 4)
    hd = cfg.attention_head_dim
    ones = jnp.ones((hd,), jnp.bfloat16)
    p = {
        "qkv": qlinear_random(ks[0], d, 3 * d, quant=quant),
        "norm_q": ones, "norm_k": ones,
    }
    p["to_out"] = qlinear_random(ks[1], d, d, quant=quant)
    if with_context:
        # joint attention: context supplies q, k AND v in every block,
        # including the context_pre_only last block (ref loads add_q/add_k/
        # add_v unconditionally, sd35.py:306-307)
        p["add_qkv"] = qlinear_random(ks[2], d, 3 * d, quant=quant)
        p["norm_added_q"] = ones
        p["norm_added_k"] = ones
        if not context_pre_only:
            p["to_add_out"] = qlinear_random(ks[3], d, d, quant=quant)
    return p


def _joint_block_random(key, cfg: SD3Config, *, dual: bool, last: bool) -> Dict:
    d, q = cfg.inner_dim, cfg.quant
    ks = jax.random.split(key, 9)
    blk = {
        "norm1": {"linear": qlinear_random(ks[0], d, (9 if dual else 6) * d, quant=None)},
        "norm1_context": {"linear": qlinear_random(ks[1], d, (2 if last else 6) * d, quant=None)},
        "attn": _attn_random(ks[2], cfg, with_context=True, context_pre_only=last, quant=q),
        "ff": {
            "proj": qlinear_random(ks[3], d, 4 * d, quant=q),
            "out": qlinear_random(ks[4], 4 * d, d, quant=q),
        },
    }
    if dual:
        blk["attn2"] = _attn_random(ks[5], cfg, with_context=False, context_pre_only=False, quant=q)
        blk["attn2"]["to_out"] = qlinear_random(ks[6], d, d, quant=q)
    if not last:
        blk["ff_context"] = {
            "proj": qlinear_random(ks[7], d, 4 * d, quant=q),
            "out": qlinear_random(ks[8], 4 * d, d, quant=q),
        }
    return blk


def sd3_init_random(key: Array, cfg: SD3Config) -> Dict:
    d, q = cfg.inner_dim, cfg.quant
    keys = jax.random.split(key, 8 + cfg.num_layers)
    p = cfg.patch_size
    params = {
        "patch_proj": qlinear_random(keys[0], cfg.in_channels * p * p, d, quant=None),
        "time_text_embed": {
            "timestep_embedder": {
                "linear1": qlinear_random(keys[1], 256, d, quant=None),
                "linear2": qlinear_random(keys[2], d, d, quant=None),
            },
            "text_embedder": {
                "linear1": qlinear_random(keys[3], cfg.pooled_projection_dim, d, quant=None),
                "linear2": qlinear_random(keys[4], d, d, quant=None),
            },
        },
        "context_embedder": qlinear_random(keys[5], cfg.joint_attention_dim, cfg.caption_projection_dim, quant=None),
        "norm_out": {"linear": qlinear_random(keys[6], d, 2 * d, quant=q)},
        "proj_out": qlinear_random(keys[7], d, p * p * cfg.out_channels, quant=q),
    }
    nd = cfg.num_dual_layers
    dual = [_joint_block_random(keys[8 + i], cfg, dual=True, last=False)
            for i in range(nd)]
    params["dual_attn_blocks"] = stack_blocks(dual) if dual else None
    std = [
        _joint_block_random(keys[8 + i], cfg, dual=False, last=False)
        for i in range(nd, cfg.num_layers - 1)
    ]
    params["std_blocks"] = stack_blocks(std) if std else None
    params["last_block"] = _joint_block_random(
        keys[8 + cfg.num_layers - 1], cfg, dual=False, last=True
    )
    return params


def _load_attn(src: TensorSource, p: str, q, *, with_context: bool, context_pre_only: bool):
    out = {
        "qkv": src.fused_linear([f"{p}.to_q", f"{p}.to_k", f"{p}.to_v"], q),
        "norm_q": src.tensor(f"{p}.norm_q.weight"),
        "norm_k": src.tensor(f"{p}.norm_k.weight"),
    }
    out["to_out"] = src.linear(f"{p}.to_out.0", q)
    if with_context:
        # context supplies q, k and v in every block, incl. the
        # context_pre_only last one (ref loads all three, sd35.py:306-307)
        out["add_qkv"] = src.fused_linear(
            [f"{p}.add_q_proj", f"{p}.add_k_proj", f"{p}.add_v_proj"], q
        )
        if not context_pre_only:
            out["to_add_out"] = src.linear(f"{p}.to_add_out", q)
        out["norm_added_q"] = src.tensor(f"{p}.norm_added_q.weight")
        out["norm_added_k"] = src.tensor(f"{p}.norm_added_k.weight")
    return out


def sd3_load(src: TensorSource, cfg: SD3Config) -> Dict:
    """Load a diffusers SD3.5 checkpoint (name map ref: sd35.py:285-331)."""
    q = cfg.quant
    conv_w = np.asarray(src.tensor("pos_embed.proj.weight", jnp.float32))  # (D, C, p, p)
    d_out = conv_w.shape[0]
    patch_w = jnp.asarray(conv_w.reshape(d_out, -1).T, jnp.bfloat16)  # (C*p*p, D)
    params = {
        "patch_proj": {"w": patch_w, "bias": src.tensor("pos_embed.proj.bias")},
        "pos_embed_table": src.tensor("pos_embed.pos_embed", jnp.float32),
        "time_text_embed": {
            "timestep_embedder": {
                "linear1": src.linear("time_text_embed.timestep_embedder.linear_1", None),
                "linear2": src.linear("time_text_embed.timestep_embedder.linear_2", None),
            },
            "text_embedder": {
                "linear1": src.linear("time_text_embed.text_embedder.linear_1", None),
                "linear2": src.linear("time_text_embed.text_embedder.linear_2", None),
            },
        },
        "context_embedder": src.linear("context_embedder", None),
        "norm_out": {"linear": src.linear("norm_out.linear", q)},
        "proj_out": src.linear("proj_out", q),
    }

    def load_block(i, dual, last):
        p = f"transformer_blocks.{i}"
        blk = {
            "norm1": {"linear": src.linear(f"{p}.norm1.linear", None)},
            "norm1_context": {"linear": src.linear(f"{p}.norm1_context.linear", None)},
            "attn": _load_attn(src, f"{p}.attn", q, with_context=True, context_pre_only=last),
            "ff": {
                "proj": src.linear(f"{p}.ff.net.0.proj", q),
                "out": src.linear(f"{p}.ff.net.2", q),
            },
        }
        if dual:
            blk["attn2"] = _load_attn(src, f"{p}.attn2", q, with_context=False, context_pre_only=False)
        if not last:
            blk["ff_context"] = {
                "proj": src.linear(f"{p}.ff_context.net.0.proj", q),
                "out": src.linear(f"{p}.ff_context.net.2", q),
            }
        return blk

    nd = cfg.num_dual_layers
    dual = [load_block(i, True, False) for i in range(nd)]
    params["dual_attn_blocks"] = stack_blocks(dual) if dual else None
    std = [load_block(i, False, False) for i in range(nd, cfg.num_layers - 1)]
    params["std_blocks"] = stack_blocks(std) if std else None
    params["last_block"] = load_block(cfg.num_layers - 1, False, True)
    src.assert_consumed()
    return params


# ---------------------------------------------------------------- forward


def sd3_joint_block(
    block, hidden: Array, encoder: Array, temb: Array, cfg: SD3Config,
    *, dual: bool, last: bool,
) -> Tuple[Array, Optional[Array]]:
    """(ref: JointTransformerBlock.forward, sd35.py:133-200)"""
    heads, hd = cfg.num_attention_heads, cfg.attention_head_dim
    if dual:
        (h_norm, gate_msa, shift_mlp, scale_mlp, gate_mlp, h_norm2, gate_msa2) = (
            sd35_ada_layer_norm_zero_x(block["norm1"], hidden, temb)
        )
    else:
        h_norm, gate_msa, shift_mlp, scale_mlp, gate_mlp = ada_layer_norm_zero(
            block["norm1"], hidden, temb
        )
    if last:
        e_norm = ada_layer_norm_continuous(block["norm1_context"], encoder, temb)
    else:
        e_norm, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = ada_layer_norm_zero(
            block["norm1_context"], encoder, temb
        )

    attn_out, ctx_attn_out = attention_apply(
        block["attn"], h_norm, e_norm, heads=heads, head_dim=hd,
        context_pre_only=last,
    )
    hidden = hidden + gate_msa[:, None] * attn_out

    if dual:
        attn2_out = attention_apply(
            block["attn2"], h_norm2, None, heads=heads, head_dim=hd
        )
        hidden = hidden + gate_msa2[:, None] * attn2_out

    h2 = layer_norm(hidden) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    hidden = hidden + gate_mlp[:, None] * feedforward_apply(block["ff"], h2, "gelu-approximate")

    if last:
        return hidden, None
    encoder = encoder + c_gate_msa[:, None] * ctx_attn_out
    e2 = layer_norm(encoder) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
    encoder = encoder + c_gate_mlp[:, None] * feedforward_apply(
        block["ff_context"], e2, "gelu-approximate"
    )
    return hidden, encoder


def _scan_segment(blocks, cfg, hidden, encoder, temb, *, dual, cn=None,
                  start=0):
    from fastdm_tpu.models.stack import scan_suffix

    def body(carry, xs):
        h, e = carry
        if cn is not None:
            block, res = xs
        else:
            block, res = xs, None
        h, e = sd3_joint_block(block, h, e, temb, cfg, dual=dual, last=False)
        if res is not None:
            h = h + res
        return (h, e), None

    xs = (blocks, cn) if cn is not None else blocks
    (hidden, encoder), _ = scan_suffix(body, (hidden, encoder), xs, start)
    return hidden, encoder


def sd3_run_blocks(
    params, cfg: SD3Config, hidden: Array, encoder: Array, temb: Array,
    controlnet_block_samples: Optional[Array] = None,
    start_block: int = 0,
) -> Array:
    """Run the three block segments (ref loop: sd35.py:393-407). controlnet
    residuals are pre-expanded to (num_layers, B, S, D) by the caller."""
    cn = controlnet_block_samples
    nd = cfg.num_dual_layers

    def seg_cn(lo, hi):
        return cn[lo:hi] if cn is not None else None

    if start_block < nd:
        hidden, encoder = _scan_segment(
            params["dual_attn_blocks"], cfg, hidden, encoder, temb,
            dual=True, cn=seg_cn(0, nd), start=start_block
        )
        start_block = nd
    std_lo = max(start_block, nd)
    std_blocks = params["std_blocks"]
    if std_blocks is not None:
        hidden, encoder = _scan_segment(
            std_blocks, cfg, hidden, encoder, temb, dual=False,
            cn=seg_cn(nd, cfg.num_layers - 1), start=std_lo - nd,
        )
    hidden, _ = sd3_joint_block(
        params["last_block"], hidden, encoder, temb, cfg, dual=False, last=True
    )
    # ref adds the *last* controlnet residual after the final block via
    # controlnet_block_samples[-1 // interval] == [-1] (sd35.py:404-406)
    if cn is not None:
        hidden = hidden + cn[-1]
    return hidden


def sd3_forward_cached(
    params, cfg: SD3Config, cache_cfg, cache_state, step: Array, total_steps: int,
    hidden_states: Array, encoder_hidden_states: Array, pooled_projections: Array,
    timestep: Array, pos_embed: Array,
) -> Tuple[Array, dict]:
    """sd3_forward with a step-skipping cache (ref cache hooks for sd35:
    fastdm/caching/xcaching.py model_type='sd35' paths)."""
    from fastdm_tpu.caching.config import DiCacheConfig, FBCacheConfig, TeaCacheConfig
    from fastdm_tpu.caching.xcaching import cached_run

    b, c, h, w = hidden_states.shape
    hidden, temb, encoder = _sd3_embed(
        params, cfg, hidden_states, encoder_hidden_states, pooled_projections,
        timestep, pos_embed)

    first_dual = cfg.num_dual_layers > 0

    if isinstance(cache_cfg, TeaCacheConfig):
        blk0 = jax.tree.map(lambda x: x[0], params["dual_attn_blocks" if first_dual else "std_blocks"])

        def probe_fn(hh, ee):
            if first_dual:
                probe, *_ = sd35_ada_layer_norm_zero_x(blk0["norm1"], hh, temb)
            else:
                probe, *_ = ada_layer_norm_zero(blk0["norm1"], hh, temb)
            return probe, (hh, ee)

        def rest_fn(hh, ee):
            return sd3_run_blocks(params, cfg, hh, ee, temb)

    elif isinstance(cache_cfg, (FBCacheConfig, DiCacheConfig)):
        depth = 1 if isinstance(cache_cfg, FBCacheConfig) else cache_cfg.probe_depth
        # the probe spans SEGMENTS: first min(depth, nd) dual-attn blocks,
        # then (depth - nd) standard blocks — an unclamped x[:depth] on the
        # dual stack alone would silently drop blocks [nd, depth) from every
        # compute step when probe_depth > num_dual_layers. The last block is
        # never probed (its context_pre_only output shape differs).
        depth = min(depth, cfg.num_layers - 1)
        nd_ = cfg.num_dual_layers
        d_dual, d_std = min(depth, nd_), max(0, depth - nd_)
        blk_d = (jax.tree.map(lambda x: x[:d_dual], params["dual_attn_blocks"])
                 if d_dual else None)
        blk_s = (jax.tree.map(lambda x: x[:d_std], params["std_blocks"])
                 if d_std else None)

        def probe_fn(hh, ee):
            h2, e2 = hh, ee
            if blk_d is not None:
                h2, e2 = _scan_segment(blk_d, cfg, h2, e2, temb, dual=True)
            if blk_s is not None:
                h2, e2 = _scan_segment(blk_s, cfg, h2, e2, temb, dual=False)
            return h2, (h2, e2)

        def rest_fn(hh, ee):
            return sd3_run_blocks(params, cfg, hh, ee, temb, start_block=depth)

    else:
        raise ValueError(f"unsupported cache config {type(cache_cfg)}")

    hidden, new_state = cached_run(
        cache_cfg, cache_state, step, total_steps, hidden, encoder, probe_fn, rest_fn
    )
    return _sd3_output(params, cfg, hidden, temb, b, h, w), new_state


def sd3_patchify(params, cfg: SD3Config, latent: Array, pos_embed: Array) -> Array:
    """(B, C, H, W) -> (B, N, D) patch tokens + cropped pos-embed."""
    b, c, h, w = latent.shape
    p = cfg.patch_size
    x = latent.reshape(b, c, h // p, p, w // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, (h // p) * (w // p), c * p * p)
    x = qlinear_apply(params["patch_proj"], x.astype(jnp.bfloat16))
    return (x + pos_embed.astype(jnp.float32)).astype(x.dtype)


def sd3_cropped_pos_embed(cfg: SD3Config, table: Optional[Array], h: int, w: int) -> Array:
    """Center-crop the (max, max, D) sincos table to (h/p, w/p) tokens
    (ref: embeddings.py:324-345). Host-side, once per resolution."""
    m = cfg.pos_embed_max_size
    ht, wt = h // cfg.patch_size, w // cfg.patch_size
    if table is None:
        base = cfg.sample_size // cfg.patch_size
        table = jnp.asarray(
            sincos_pos_embed_2d(cfg.inner_dim, m, m, base_size=base), jnp.float32
        )
    top, left = (m - ht) // 2, (m - wt) // 2
    t = jnp.asarray(table, jnp.float32).reshape(m, m, -1)
    return t[top : top + ht, left : left + wt].reshape(1, ht * wt, -1)


def _sd3_embed(params, cfg, hidden_states, encoder_hidden_states,
               pooled_projections, timestep, pos_embed):
    """Shared forward preamble (one implementation for cached + uncached,
    like flux's _flux_embed)."""
    hidden = sd3_patchify(params, cfg, hidden_states, pos_embed)
    temb = combined_timestep_text_proj_apply(
        params["time_text_embed"], timestep.astype(jnp.float32), pooled_projections
    )
    encoder = qlinear_apply(params["context_embedder"], encoder_hidden_states)
    return hidden, temb, encoder


def _sd3_output(params, cfg, hidden, temb, b, h, w):
    """Shared output modulation + projection + unpatchify (ref: sd35.py:412-421)."""
    hidden = ada_layer_norm_continuous(params["norm_out"], hidden, temb)
    hidden = qlinear_apply(params["proj_out"], hidden)
    p = cfg.patch_size
    ht, wt = h // p, w // p
    x = hidden.reshape(b, ht, wt, p, p, cfg.out_channels)
    x = jnp.einsum("nhwpqc->nchpwq", x)
    return x.reshape(b, cfg.out_channels, ht * p, wt * p)


def sd3_forward(
    params,
    cfg: SD3Config,
    hidden_states: Array,          # (B, C, H, W) latent
    encoder_hidden_states: Array,  # (B, S_txt, joint_attention_dim)
    pooled_projections: Array,     # (B, pooled_projection_dim)
    timestep: Array,               # (B,) train-timestep units (sigma*1000)
    pos_embed: Array,              # (1, N, D) cropped table (host-side)
    controlnet_block_samples: Optional[Array] = None,
) -> Array:
    """(ref: SD3TransformerModelCore.forward, sd35.py:336-421)"""
    b, c, h, w = hidden_states.shape
    hidden, temb, encoder = _sd3_embed(
        params, cfg, hidden_states, encoder_hidden_states, pooled_projections,
        timestep, pos_embed)
    hidden = sd3_run_blocks(params, cfg, hidden, encoder, temb, controlnet_block_samples)
    return _sd3_output(params, cfg, hidden, temb, b, h, w)
