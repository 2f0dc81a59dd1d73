"""SDXL-base UNet core (ref: fastdm/model/sdxl.py, fastdm/layer/unetblock.py).

TPU design notes:
  * NHWC convs (channel-last = lane dim); stride-2 downsampling / nearest-2x
    upsampling exactly as diffusers.
  * Each Transformer2DModel's BasicTransformerBlocks are stacked and scanned
    (the 10-layer 1280-ch stacks dominate compile time otherwise).
  * Self-attn qkv and cross-attn kv are fused projections quantized at load
    (ref: unetblock.py:32-36); FF is GEGLU via the gelu_and_mul kernel with
    the gate in the second half (ref: FeedForward_SDXL, unetblock.py:205-217).
  * IP-Adapter: optional extra KV branch on every cross-attention
    (diffusers-style case, ref: unetblock.py:77-88,118-122).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.kernels import gelu_and_mul, scaled_dot_product_attention
from fastdm_tpu.layers.conv2d import conv2d, group_norm, upsample_nearest2x
from fastdm_tpu.layers.embeddings import get_timestep_embedding, timestep_embedding_apply
from fastdm_tpu.layers.normalization import layer_norm
from fastdm_tpu.layers.qlinear import qlinear_apply, qlinear_random
from fastdm_tpu.models.loader import TensorSource, stack_blocks

Array = jax.Array

_GN_EPS = 1e-5
_LN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class SDXLConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_channels: Tuple[int, ...] = (320, 640, 1280)
    cross_attention_dim: int = 2048
    attn_layers: Tuple[int, ...] = (0, 2, 10)  # per down block; mid uses 10
    head_dim: int = 64
    addition_time_embed_dim: int = 256
    time_embed_dim: int = 1280
    add_embedding_in_dim: int = 2816  # 1280 pooled text + 6*256 time ids
    addition_embed_num_heads: int = 64  # TextTimeEmbedding pooler heads
    norm_groups: int = 32
    quant: Optional[str] = "int8"
    ip_adapter: bool = False
    ip_adapter_scale: float = 0.6


# ---------------------------------------------------------------- layers


def _attention(params, x: Array, ctx: Optional[Array], head_dim: int,
               ip_embeds: Optional[Array] = None, ip_scale: float = 0.6) -> Array:
    """Self (fused qkv) or cross (q + fused kv) attention on (B, S, C) tokens
    (ref: Attention_SDXL.forward, unetblock.py:42-127)."""
    c = x.shape[-1]
    heads = c // head_dim
    if "qkv" in params:
        qkv = qlinear_apply(params["qkv"], x)
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    else:
        q = qlinear_apply(params["q"], x)
        kv = qlinear_apply(params["kv"], ctx)
        k, v = kv[..., :c], kv[..., c:]
    out = scaled_dot_product_attention(q, k, v, heads, heads, head_dim, False, head_dim**-0.5)
    if ip_embeds is not None and "ipadp_kv" in params:
        ip_kv = qlinear_apply(params["ipadp_kv"], ip_embeds)
        ip_k, ip_v = ip_kv[..., :c], ip_kv[..., c:]
        ip_out = scaled_dot_product_attention(
            q, ip_k, ip_v, heads, heads, head_dim, False, head_dim**-0.5
        )
        out = out + ip_scale * ip_out
    return qlinear_apply(params["out"], out.astype(x.dtype))


def _basic_block(params, x: Array, ctx: Array, cfg: SDXLConfig,
                 ip_embeds: Optional[Array],
                 ip_scale: Optional[Array] = None) -> Array:
    """LN+self-attn, LN+cross-attn, LN+GEGLU-FF, all residual
    (ref: BasicTransformerBlock.forward, unetblock.py:276-303)."""
    h = layer_norm(x, params["norm1"]["gamma"], params["norm1"]["beta"], _LN_EPS)
    x = x + _attention(params["attn1"], h, None, cfg.head_dim)
    h = layer_norm(x, params["norm2"]["gamma"], params["norm2"]["beta"], _LN_EPS)
    scale = cfg.ip_adapter_scale if ip_scale is None else ip_scale
    x = x + _attention(params["attn2"], h, ctx, cfg.head_dim, ip_embeds, scale)
    h = layer_norm(x, params["norm3"]["gamma"], params["norm3"]["beta"], _LN_EPS)
    h = qlinear_apply(params["ff"]["proj"], h)
    h = gelu_and_mul(h)
    x = x + qlinear_apply(params["ff"]["out"], h)
    return x


def _transformer2d(params, x: Array, ctx: Array, cfg: SDXLConfig,
                   ip_embeds: Optional[Array],
                   ip_scale: Optional[Array] = None) -> Array:
    """GroupNorm -> tokens -> proj_in -> scanned blocks -> proj_out + residual
    (ref: Transformer2DModel.forward, unetblock.py:333-369)."""
    b, hh, ww, c = x.shape
    res = x
    h = group_norm(params["norm"], x, cfg.norm_groups, eps=1e-6)
    h = h.reshape(b, hh * ww, c)
    h = qlinear_apply(params["proj_in"], h)

    def body(carry, block):
        return _basic_block(block, carry, ctx, cfg, ip_embeds, ip_scale), None

    h, _ = jax.lax.scan(body, h, params["blocks"])
    h = qlinear_apply(params["proj_out"], h)
    return h.reshape(b, hh, ww, c) + res


def _resnet(params, x: Array, temb: Array, groups: int = 32) -> Array:
    """(ref: ResnetBlock2D.forward, resnetblock.py:29-50); GN eps 1e-5."""
    h = group_norm(params["norm1"], x, groups, eps=_GN_EPS)
    h = conv2d(params["conv1"], jax.nn.silu(h))
    t = qlinear_apply(params["time_emb_proj"], jax.nn.silu(temb))
    h = h + t[:, None, None, :].astype(h.dtype)
    h = group_norm(params["norm2"], h, groups, eps=_GN_EPS)
    h = conv2d(params["conv2"], jax.nn.silu(h))
    if "shortcut" in params:
        x = conv2d(params["shortcut"], x)
    return x + h


# ---------------------------------------------------------------- forward


def sdxl_forward(
    params,
    cfg: SDXLConfig,
    sample: Array,                 # (B, 4, H, W) latent, NCHW like diffusers
    timestep: Array,               # (B,) train-timestep units
    encoder_hidden_states: Array,  # (B, 77, 2048)
    text_embeds: Array,            # (B, 1280) pooled
    time_ids: Array,               # (B, 6)
    ip_embeds: Optional[Array] = None,
    down_block_additional_residuals: Optional[List[Array]] = None,
    mid_block_additional_residual: Optional[Array] = None,
    ip_scale: Optional[Array] = None,  # runtime override of cfg.ip_adapter_scale
) -> Array:
    """(ref: SDXLUNetModelCore.forward, sdxl.py:379-470)"""
    b = sample.shape[0]
    dt = jnp.bfloat16

    t_emb = get_timestep_embedding(
        timestep, cfg.block_channels[0], flip_sin_to_cos=True, downscale_freq_shift=0.0
    )
    emb = timestep_embedding_apply(params["time_embedding"], t_emb.astype(dt))
    time_embeds = get_timestep_embedding(
        time_ids.reshape(-1), cfg.addition_time_embed_dim, flip_sin_to_cos=True,
        downscale_freq_shift=0.0,
    ).reshape(b, -1)
    add_embeds = jnp.concatenate([text_embeds.astype(jnp.float32), time_embeds], axis=-1)
    emb = emb + timestep_embedding_apply(params["add_embedding"], add_embeds.astype(dt))

    ctx = encoder_hidden_states.astype(dt)
    x = jnp.transpose(sample, (0, 2, 3, 1)).astype(dt)  # NCHW -> NHWC
    x = conv2d(params["conv_in"], x)

    skips = [x]
    # down 0: plain resnets (ref: DownBlock2D)
    for r in params["down0"]["resnets"]:
        x = _resnet(r, x, emb, cfg.norm_groups)
        skips.append(x)
    x = conv2d(params["down0"]["downsample"], x, stride=2)
    skips.append(x)
    # down 1 & 2: resnet + transformer pairs
    for name, has_down in (("down1", True), ("down2", False)):
        blk = params[name]
        for r, a in zip(blk["resnets"], blk["attns"]):
            x = _resnet(r, x, emb, cfg.norm_groups)
            x = _transformer2d(a, x, ctx, cfg, ip_embeds, ip_scale)
            skips.append(x)
        if has_down:
            x = conv2d(blk["downsample"], x, stride=2)
            skips.append(x)

    if down_block_additional_residuals is not None:
        skips = [s + r.astype(s.dtype) for s, r in zip(skips, down_block_additional_residuals)]

    # mid
    x = _resnet(params["mid"]["resnets"][0], x, emb, cfg.norm_groups)
    x = _transformer2d(params["mid"]["attn"], x, ctx, cfg, ip_embeds, ip_scale)
    x = _resnet(params["mid"]["resnets"][1], x, emb, cfg.norm_groups)
    if mid_block_additional_residual is not None:
        x = x + mid_block_additional_residual.astype(x.dtype)

    # up
    for name in ("up0", "up1", "up2"):
        blk = params[name]
        attns = blk.get("attns")
        for i, r in enumerate(blk["resnets"]):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = _resnet(r, x, emb, cfg.norm_groups)
            if attns is not None:
                x = _transformer2d(attns[i], x, ctx, cfg, ip_embeds, ip_scale)
        if "upsample" in blk:
            x = conv2d(blk["upsample"], upsample_nearest2x(x))

    x = group_norm(params["conv_norm_out"], x, cfg.norm_groups, eps=_GN_EPS)
    x = conv2d(params["conv_out"], jax.nn.silu(x))
    return jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW


# ---------------------------------------------------------------- loading


def _ln(src, p):
    return {"gamma": src.tensor(f"{p}.weight"), "beta": src.tensor(f"{p}.bias")}


def _conv_p(src, p):
    from fastdm_tpu.layers.conv2d import conv_from_torch

    return conv_from_torch(
        np.asarray(src.tensor(f"{p}.weight", jnp.float32)),
        np.asarray(src.tensor(f"{p}.bias", jnp.float32)),
    )


def _resnet_p(src, p, q):
    out = {
        "norm1": _ln(src, f"{p}.norm1"),
        "conv1": _conv_p(src, f"{p}.conv1"),
        "time_emb_proj": src.linear(f"{p}.time_emb_proj", q),
        "norm2": _ln(src, f"{p}.norm2"),
        "conv2": _conv_p(src, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in src:
        out["shortcut"] = _conv_p(src, f"{p}.conv_shortcut")
    return out


def _t2d_p(src, p, n_layers, q, ip_adapter):
    blocks = []
    for j in range(n_layers):
        bp = f"{p}.transformer_blocks.{j}"
        blk = {
            "norm1": _ln(src, f"{bp}.norm1"),
            "attn1": {
                "qkv": src.fused_linear(
                    [f"{bp}.attn1.to_q", f"{bp}.attn1.to_k", f"{bp}.attn1.to_v"], q
                ),
                "out": src.linear(f"{bp}.attn1.to_out.0", q),
            },
            "norm2": _ln(src, f"{bp}.norm2"),
            "attn2": {
                "q": src.linear(f"{bp}.attn2.to_q", q),
                "kv": src.fused_linear([f"{bp}.attn2.to_k", f"{bp}.attn2.to_v"], q),
                "out": src.linear(f"{bp}.attn2.to_out.0", q),
            },
            "norm3": _ln(src, f"{bp}.norm3"),
            "ff": {
                "proj": src.linear(f"{bp}.ff.net.0.proj", q),
                "out": src.linear(f"{bp}.ff.net.2", q),
            },
        }
        if ip_adapter and f"{bp}.attn2.processor.to_k_ip.0.weight" in src:
            blk["attn2"]["ipadp_kv"] = src.fused_linear(
                [f"{bp}.attn2.processor.to_k_ip.0", f"{bp}.attn2.processor.to_v_ip.0"], q
            )
        blocks.append(blk)
    return {
        "norm": _ln(src, f"{p}.norm"),
        "proj_in": src.linear(f"{p}.proj_in", q),
        "blocks": stack_blocks(blocks),
        "proj_out": src.linear(f"{p}.proj_out", q),
    }


def sdxl_load(src: TensorSource, cfg: SDXLConfig) -> Dict:
    """Load a diffusers SDXL UNet checkpoint (name map ref: sdxl.py:178-377)."""
    q = cfg.quant
    params: Dict = {
        "conv_in": _conv_p(src, "conv_in"),
        "time_embedding": {
            "linear1": src.linear("time_embedding.linear_1", None),
            "linear2": src.linear("time_embedding.linear_2", None),
        },
        "add_embedding": {
            "linear1": src.linear("add_embedding.linear_1", None),
            "linear2": src.linear("add_embedding.linear_2", None),
        },
        "conv_norm_out": _ln(src, "conv_norm_out"),
        "conv_out": _conv_p(src, "conv_out"),
    }
    params["down0"] = {
        "resnets": [_resnet_p(src, f"down_blocks.0.resnets.{j}", q) for j in range(2)],
        "downsample": _conv_p(src, "down_blocks.0.downsamplers.0.conv"),
    }
    for i, n_layers in ((1, cfg.attn_layers[1]), (2, cfg.attn_layers[2])):
        blk = {
            "resnets": [_resnet_p(src, f"down_blocks.{i}.resnets.{j}", q) for j in range(2)],
            "attns": [
                _t2d_p(src, f"down_blocks.{i}.attentions.{j}", n_layers, q, cfg.ip_adapter)
                for j in range(2)
            ],
        }
        if i == 1:
            blk["downsample"] = _conv_p(src, f"down_blocks.{i}.downsamplers.0.conv")
        params[f"down{i}"] = blk
    params["mid"] = {
        "resnets": [_resnet_p(src, f"mid_block.resnets.{j}", q) for j in range(2)],
        "attn": _t2d_p(src, "mid_block.attentions.0", cfg.attn_layers[2], q, cfg.ip_adapter),
    }
    for i, n_layers in ((0, cfg.attn_layers[2]), (1, cfg.attn_layers[1]), (2, 0)):
        blk = {
            "resnets": [_resnet_p(src, f"up_blocks.{i}.resnets.{j}", q) for j in range(3)],
        }
        if n_layers:
            blk["attns"] = [
                _t2d_p(src, f"up_blocks.{i}.attentions.{j}", n_layers, q, cfg.ip_adapter)
                for j in range(3)
            ]
        if i < 2:
            blk["upsample"] = _conv_p(src, f"up_blocks.{i}.upsamplers.0.conv")
        params[f"up{i}"] = blk
    src.assert_consumed()
    return params


# ---------------------------------------------------------------- random init


def _rand_conv(key, kh, kw, cin, cout):
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), jnp.bfloat16) * 0.03,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _rand_ln(c):
    return {"gamma": jnp.ones((c,), jnp.bfloat16), "beta": jnp.zeros((c,), jnp.bfloat16)}


def _rand_resnet(key, cin, cout, temb_dim, q):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": _rand_ln(cin),
        "conv1": _rand_conv(ks[0], 3, 3, cin, cout),
        "time_emb_proj": qlinear_random(ks[1], temb_dim, cout, quant=q),
        "norm2": _rand_ln(cout),
        "conv2": _rand_conv(ks[2], 3, 3, cout, cout),
    }
    if cin != cout:
        p["shortcut"] = _rand_conv(ks[3], 1, 1, cin, cout)
    return p


def _rand_t2d(key, c, ctx_dim, n_layers, q, ip):
    ks = jax.random.split(key, n_layers + 3)
    blocks = []
    for j in range(n_layers):
        bks = jax.random.split(ks[j], 8)
        blk = {
            "norm1": _rand_ln(c),
            "attn1": {
                "qkv": qlinear_random(bks[0], c, 3 * c, bias=False, quant=q),
                "out": qlinear_random(bks[1], c, c, quant=q),
            },
            "norm2": _rand_ln(c),
            "attn2": {
                "q": qlinear_random(bks[2], c, c, bias=False, quant=q),
                "kv": qlinear_random(bks[3], ctx_dim, 2 * c, bias=False, quant=q),
                "out": qlinear_random(bks[4], c, c, quant=q),
            },
            "norm3": _rand_ln(c),
            "ff": {
                "proj": qlinear_random(bks[5], c, 8 * c, quant=q),
                "out": qlinear_random(bks[6], 4 * c, c, quant=q),
            },
        }
        if ip:
            blk["attn2"]["ipadp_kv"] = qlinear_random(bks[7], ctx_dim, 2 * c, quant=q)
        blocks.append(blk)
    return {
        "norm": _rand_ln(c),
        "proj_in": qlinear_random(ks[-2], c, c, quant=q),
        "blocks": stack_blocks(blocks),
        "proj_out": qlinear_random(ks[-1], c, c, quant=q),
    }


def sdxl_init_random(key: Array, cfg: SDXLConfig) -> Dict:
    c0, c1, c2 = cfg.block_channels
    q = cfg.quant
    te = cfg.time_embed_dim
    ks = jax.random.split(key, 32)
    params: Dict = {
        "conv_in": _rand_conv(ks[0], 3, 3, cfg.in_channels, c0),
        "time_embedding": {
            "linear1": qlinear_random(ks[1], c0, te, quant=None),
            "linear2": qlinear_random(ks[2], te, te, quant=None),
        },
        "add_embedding": {
            "linear1": qlinear_random(ks[3], cfg.add_embedding_in_dim, te, quant=None),
            "linear2": qlinear_random(ks[4], te, te, quant=None),
        },
        "conv_norm_out": _rand_ln(c0),
        "conv_out": _rand_conv(ks[5], 3, 3, c0, cfg.out_channels),
    }
    ctx = cfg.cross_attention_dim
    n1, n2 = cfg.attn_layers[1], cfg.attn_layers[2]
    params["down0"] = {
        "resnets": [_rand_resnet(ks[6], c0, c0, te, q), _rand_resnet(ks[7], c0, c0, te, q)],
        "downsample": _rand_conv(ks[8], 3, 3, c0, c0),
    }
    params["down1"] = {
        "resnets": [_rand_resnet(ks[9], c0, c1, te, q), _rand_resnet(ks[10], c1, c1, te, q)],
        "attns": [_rand_t2d(ks[11], c1, ctx, n1, q, cfg.ip_adapter),
                  _rand_t2d(ks[12], c1, ctx, n1, q, cfg.ip_adapter)],
        "downsample": _rand_conv(ks[13], 3, 3, c1, c1),
    }
    params["down2"] = {
        "resnets": [_rand_resnet(ks[14], c1, c2, te, q), _rand_resnet(ks[15], c2, c2, te, q)],
        "attns": [_rand_t2d(ks[16], c2, ctx, n2, q, cfg.ip_adapter),
                  _rand_t2d(ks[17], c2, ctx, n2, q, cfg.ip_adapter)],
    }
    params["mid"] = {
        "resnets": [_rand_resnet(ks[18], c2, c2, te, q), _rand_resnet(ks[19], c2, c2, te, q)],
        "attn": _rand_t2d(ks[20], c2, ctx, n2, q, cfg.ip_adapter),
    }
    params["up0"] = {
        "resnets": [_rand_resnet(ks[21], c2 + c2, c2, te, q),
                    _rand_resnet(ks[22], c2 + c2, c2, te, q),
                    _rand_resnet(ks[23], c2 + c1, c2, te, q)],
        "attns": [_rand_t2d(ks[24], c2, ctx, n2, q, cfg.ip_adapter) for _ in range(3)],
        "upsample": _rand_conv(ks[25], 3, 3, c2, c2),
    }
    params["up1"] = {
        "resnets": [_rand_resnet(ks[26], c2 + c1, c1, te, q),
                    _rand_resnet(ks[27], c1 + c1, c1, te, q),
                    _rand_resnet(ks[28], c1 + c0, c1, te, q)],
        "attns": [_rand_t2d(ks[29], c1, ctx, n1, q, cfg.ip_adapter) for _ in range(3)],
        "upsample": _rand_conv(ks[30], 3, 3, c1, c1),
    }
    params["up2"] = {
        "resnets": [_rand_resnet(ks[31], c1 + c0, c0, te, q),
                    _rand_resnet(ks[6], c0 + c0, c0, te, q),
                    _rand_resnet(ks[7], c0 + c0, c0, te, q)],
    }
    return params


def sdxl_attach_ip_adapter(params: Dict, src: TensorSource, cfg: SDXLConfig) -> Dict:
    """Attach an IP-Adapter checkpoint to loaded UNet params and return the
    image-projection params.

    Expects the official IP-Adapter state-dict layout: 'image_proj.*' plus
    'ip_adapter.{proc_idx}.to_k_ip/to_v_ip' where proc_idx enumerates the
    UNet's attention processors in diffusers' named-module registration
    order — down_blocks, UP_BLOCKS, then MID_BLOCK LAST (UNet2DConditionModel
    creates both empty ModuleLists before assigning mid_block, so mid lands
    at the END of unet.attn_processors, which is the order official
    checkpoints were exported in); attn1 then attn2 per BasicTransformerBlock,
    so cross-attention weights sit on odd indices (ref: SDXL IP-Adapter
    conversion, sdxl.py:114-137).

    The fused (k,v) projections are quantized like the rest of the UNet and
    stacked per Transformer2DModel so the block scan slices them along with
    every other leaf.
    """
    q = cfg.quant
    idx = 0

    def attach_t2d(t2d, n_layers):
        nonlocal idx
        ip = []
        for _ in range(n_layers):
            idx += 1  # skip the attn1 (self-attention) processor slot
            ip.append(src.fused_linear(
                [f"ip_adapter.{idx}.to_k_ip", f"ip_adapter.{idx}.to_v_ip"], q
            ))
            idx += 1
        t2d["blocks"]["attn2"]["ipadp_kv"] = stack_blocks(ip)

    n1, n2 = cfg.attn_layers[1], cfg.attn_layers[2]
    for a in params["down1"]["attns"]:
        attach_t2d(a, n1)
    for a in params["down2"]["attns"]:
        attach_t2d(a, n2)
    for a in params["up0"]["attns"]:
        attach_t2d(a, n2)
    for a in params["up1"]["attns"]:
        attach_t2d(a, n1)
    attach_t2d(params["mid"]["attn"], n2)  # mid is LAST (see docstring)

    if "image_proj.proj.weight" in src:
        # plain ImageProjection: one linear -> num_tokens context tokens
        out_dim = src._tensors["image_proj.proj.weight"].shape[0]
        proj = {
            "kind": "simple",
            "proj": src.linear("image_proj.proj", None),
            "norm": _ln(src, "image_proj.norm"),
            "num_tokens": out_dim // cfg.cross_attention_dim,
        }
    elif "image_proj.latents" in src:
        # IP-Adapter-Plus perceiver resampler (official checkpoint layout:
        # image_proj.latents / proj_in / proj_out / norm_out +
        # layers.{i}.0.{norm1,norm2,to_q,to_kv,to_out} attention and
        # layers.{i}.1.{0,1,3} LayerNorm/Linear/Linear feed-forward —
        # ref analog: FastdmIPAdapterPlusImageProjection, embeddings.py:685+)
        latents = src.tensor("image_proj.latents", jnp.bfloat16)
        layers = []
        i = 0
        while f"image_proj.layers.{i}.0.to_q.weight" in src:
            p = f"image_proj.layers.{i}"
            layers.append({
                "norm0": _ln(src, f"{p}.0.norm1"),   # input (x) norm
                "norm1": _ln(src, f"{p}.0.norm2"),   # latents norm
                "attn": {
                    "q": src.linear(f"{p}.0.to_q", None),
                    "kv": src.linear(f"{p}.0.to_kv", None),
                    "out": src.linear(f"{p}.0.to_out", None),
                },
                "ff_norm": _ln(src, f"{p}.1.0"),
                "ff": {
                    "proj": src.linear(f"{p}.1.1", None),
                    "out": src.linear(f"{p}.1.3", None),
                },
            })
            i += 1
        hidden_dims = latents.shape[-1]
        proj = {
            "kind": "plus",
            "latents": latents,
            "proj_in": src.linear("image_proj.proj_in", None),
            "proj_out": src.linear("image_proj.proj_out", None),
            "norm_out": _ln(src, "image_proj.norm_out"),
            "layers": layers,
            "num_tokens": latents.shape[-2],
            "heads": hidden_dims // 64,
            "head_dim": 64,
        }
    else:
        raise NotImplementedError(
            "unrecognized image_proj layout in the IP-Adapter checkpoint"
        )
    src.assert_consumed()
    return proj
