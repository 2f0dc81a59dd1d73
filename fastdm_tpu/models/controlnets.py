"""ControlNet cores: SDXL and FLUX (ref: fastdm/model/controlnets.py).

Both reuse the base models' block functions:
  * SDXL CN mirrors the UNet's down+mid path (ref :80-737), adds the 4-conv
    hint encoder (ref ControlNetConditioningEmbedding :19-78) and per-skip
    zero 1x1 convs; returns (9 down residuals, 1 mid residual), NHWC.
  * FLUX CN runs N dual + M single blocks collecting per-block hidden states
    (a lax.scan with stacked ys — no Python-side accumulation), then applies
    stacked zero-linear heads in one einsum (ref :739-1046).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.layers.conv2d import conv2d, group_norm
from fastdm_tpu.layers.embeddings import (
    combined_timestep_text_proj_apply,
    get_timestep_embedding,
    timestep_embedding_apply,
)
from fastdm_tpu.layers.qlinear import qlinear_apply
from fastdm_tpu.models.flux import FluxConfig, flux_dual_block, flux_single_block
from fastdm_tpu.models.loader import TensorSource, stack_blocks
from fastdm_tpu.models.sdxl import SDXLConfig, _resnet, _transformer2d

Array = jax.Array


# ================================================================== SDXL


def controlnet_cond_embedding_apply(params, cond: Array) -> Array:
    """4-conv hint encoder, image space -> latent space
    (ref: ControlNetConditioningEmbedding.forward, controlnets.py:64-78).
    cond: (B, H, W, 3) NHWC in [0, 1]."""
    x = jax.nn.silu(conv2d(params["conv_in"], cond.astype(jnp.bfloat16)))
    for i, blk in enumerate(params["blocks"]):
        x = jax.nn.silu(conv2d(blk, x, stride=1 if i % 2 == 0 else 2))
    return conv2d(params["conv_out"], x)


def sdxl_controlnet_forward(
    params,
    cfg: SDXLConfig,
    sample: Array,                 # (B, 4, H, W) latent
    timestep: Array,
    encoder_hidden_states: Array,
    text_embeds: Array,
    time_ids: Array,
    controlnet_cond: Array,        # (B, 8H, 8W, 3) hint image, NHWC
    conditioning_scale: float = 1.0,
    guess_mode: bool = False,
) -> Tuple[List[Array], Array]:
    """(ref: SdxlControlNetModelCore.forward, controlnets.py:545-737).
    Returns (down_block_res_samples (9, NHWC), mid_block_res_sample)."""
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
    x = jnp.transpose(sample, (0, 2, 3, 1)).astype(dt)
    x = conv2d(params["conv_in"], x)
    x = x + controlnet_cond_embedding_apply(params["cond_embedding"], controlnet_cond)

    skips = [x]
    for r in params["down0"]["resnets"]:
        x = _resnet(r, x, emb, cfg.norm_groups)
        skips.append(x)
    x = conv2d(params["down0"]["downsample"], x, stride=2)
    skips.append(x)
    for name, has_down in (("down1", True), ("down2", False)):
        blk = params[name]
        for r, a in zip(blk["resnets"], blk["attns"]):
            x = _resnet(r, x, emb, cfg.norm_groups)
            x = _transformer2d(a, x, ctx, cfg, None)
            skips.append(x)
        if has_down:
            x = conv2d(blk["downsample"], x, stride=2)
            skips.append(x)

    x = _resnet(params["mid"]["resnets"][0], x, emb, cfg.norm_groups)
    x = _transformer2d(params["mid"]["attn"], x, ctx, cfg, None)
    x = _resnet(params["mid"]["resnets"][1], x, emb, cfg.norm_groups)

    down_samples = [
        conv2d(zc, s) for zc, s in zip(params["controlnet_down_blocks"], skips)
    ]
    mid_sample = conv2d(params["controlnet_mid_block"], x)

    if guess_mode:
        scales = jnp.logspace(-1, 0, len(down_samples) + 1) * conditioning_scale
        down_samples = [s * sc for s, sc in zip(down_samples, scales[:-1])]
        mid_sample = mid_sample * scales[-1]
    else:
        down_samples = [s * conditioning_scale for s in down_samples]
        mid_sample = mid_sample * conditioning_scale
    return down_samples, mid_sample


def sdxl_controlnet_load(src: TensorSource, cfg: SDXLConfig) -> Dict:
    """Load a diffusers SDXL ControlNet checkpoint."""
    from fastdm_tpu.models.sdxl import _conv_p, _resnet_p, _t2d_p

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
        "cond_embedding": {
            "conv_in": _conv_p(src, "controlnet_cond_embedding.conv_in"),
            "blocks": [
                _conv_p(src, f"controlnet_cond_embedding.blocks.{i}") for i in range(6)
            ],
            "conv_out": _conv_p(src, "controlnet_cond_embedding.conv_out"),
        },
    }
    params["down0"] = {
        "resnets": [_resnet_p(src, f"down_blocks.0.resnets.{j}", q) for j in range(2)],
        "downsample": _conv_p(src, "down_blocks.0.downsamplers.0.conv"),
    }
    for i, n_layers in ((1, cfg.attn_layers[1]), (2, cfg.attn_layers[2])):
        blk = {
            "resnets": [_resnet_p(src, f"down_blocks.{i}.resnets.{j}", q) for j in range(2)],
            "attns": [
                _t2d_p(src, f"down_blocks.{i}.attentions.{j}", n_layers, q, False)
                for j in range(2)
            ],
        }
        if i == 1:
            blk["downsample"] = _conv_p(src, f"down_blocks.{i}.downsamplers.0.conv")
        params[f"down{i}"] = blk
    params["mid"] = {
        "resnets": [_resnet_p(src, f"mid_block.resnets.{j}", q) for j in range(2)],
        "attn": _t2d_p(src, "mid_block.attentions.0", cfg.attn_layers[2], q, False),
    }
    params["controlnet_down_blocks"] = [
        _conv_p(src, f"controlnet_down_blocks.{i}") for i in range(9)
    ]
    params["controlnet_mid_block"] = _conv_p(src, "controlnet_mid_block")
    src.assert_consumed()
    return params


# ================================================================== FLUX


@dataclasses.dataclass(frozen=True)
class FluxControlNetConfig(FluxConfig):
    num_layers: int = 5
    num_single_layers: int = 0
    guidance_embeds: bool = False
    conditioning_embedding_channels: Optional[int] = None  # raw-image hint block


def flux_controlnet_forward(
    params,
    cfg: FluxControlNetConfig,
    hidden_states: Array,          # (B, S_img, in_channels) packed latents
    controlnet_cond: Array,        # (B, S_img, in_channels) packed hint
    encoder_hidden_states: Array,
    pooled_projections: Array,
    timestep: Array,
    rope_cos: Array,
    rope_sin: Array,
    guidance: Optional[Array] = None,
    conditioning_scale: float = 1.0,
) -> Tuple[Optional[Array], Optional[Array]]:
    """(ref: FluxControlNetModelCore.forward, controlnets.py:890-1046).
    Returns stacked (num_layers, B, S, D) and (num_single_layers, B, S, D)
    residuals (already scaled), ready for flux_forward's controlnet args."""
    hidden = qlinear_apply(params["x_embedder"], hidden_states)
    hidden = hidden + qlinear_apply(params["controlnet_x_embedder"], controlnet_cond)
    temb = combined_timestep_text_proj_apply(
        params["time_text_embed"],
        timestep.astype(jnp.float32) * 1000.0,
        pooled_projections,
        guidance.astype(jnp.float32) * 1000.0 if cfg.guidance_embeds else None,
    )
    encoder = qlinear_apply(params["context_embedder"], encoder_hidden_states)

    block_samples = single_block_samples = None
    if cfg.num_layers:
        def dual_body(carry, block):
            h, e = carry
            h, e = flux_dual_block(block, h, e, temb, rope_cos, rope_sin, cfg)
            return (h, e), h

        (hidden, encoder), block_samples = jax.lax.scan(
            dual_body, (hidden, encoder), params["dual_blocks"]
        )
    if cfg.num_single_layers:
        ctx_len = encoder.shape[1]
        joint = jnp.concatenate([encoder, hidden], axis=1)

        def single_body(carry, block):
            h = flux_single_block(block, carry, temb, rope_cos, rope_sin, cfg)
            return h, h[:, ctx_len:]

        _, single_block_samples = jax.lax.scan(
            single_body, joint, params["single_blocks"]
        )

    def zero_heads(samples, heads):
        # stacked per-layer zero-linear: (L,B,S,D) x (L,D,D) -> (L,B,S,D)
        out = jnp.einsum(
            "lbsd,lde->lbse", samples.astype(jnp.bfloat16),
            heads["w"].astype(jnp.bfloat16), preferred_element_type=jnp.float32,
        )
        out = out + heads["bias"][:, None, None, :].astype(jnp.float32)
        return (out * conditioning_scale).astype(samples.dtype)

    if block_samples is not None:
        block_samples = zero_heads(block_samples, params["controlnet_blocks"])
    if single_block_samples is not None:
        single_block_samples = zero_heads(
            single_block_samples, params["controlnet_single_blocks"]
        )
    return block_samples, single_block_samples


def flux_controlnet_load(src: TensorSource, cfg: FluxControlNetConfig) -> Dict:
    """Load a diffusers FLUX ControlNet (XLabs/InstantX layouts)."""
    from fastdm_tpu.models.flux import flux_load

    # reuse the flux loader for the shared trunk by name-compatibility; the CN
    # checkpoints carry the same block names plus controlnet_* heads.
    q = cfg.quant
    extra = {}
    extra["controlnet_x_embedder"] = src.linear("controlnet_x_embedder", None)
    heads = []
    i = 0
    while f"controlnet_blocks.{i}.weight" in src:
        w = np.asarray(src.take(f"controlnet_blocks.{i}.weight"), np.float32)
        b = np.asarray(src.take(f"controlnet_blocks.{i}.bias"), np.float32)
        heads.append({"w": jnp.asarray(w.T, jnp.bfloat16), "bias": jnp.asarray(b)})
        i += 1
    if heads:
        extra["controlnet_blocks"] = stack_blocks(heads)
    sheads = []
    i = 0
    while f"controlnet_single_blocks.{i}.weight" in src:
        w = np.asarray(src.take(f"controlnet_single_blocks.{i}.weight"), np.float32)
        b = np.asarray(src.take(f"controlnet_single_blocks.{i}.bias"), np.float32)
        sheads.append({"w": jnp.asarray(w.T, jnp.bfloat16), "bias": jnp.asarray(b)})
        i += 1
    if sheads:
        extra["controlnet_single_blocks"] = stack_blocks(sheads)

    base = flux_load(src, cfg)
    base.update(extra)
    return base
