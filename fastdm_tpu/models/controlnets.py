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
    text_image_projection_apply,
    text_image_time_embedding_apply,
    text_time_embedding_apply,
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
    class_labels: Optional[Array] = None,
    class_embed_sinusoidal: bool = False,  # class_embed_type == "timestep"
    image_embeds: Optional[Array] = None,  # Kandinsky-style added_cond_kwargs
    global_pool_conditions: bool = False,
) -> Tuple[List[Array], Array]:
    """(ref: SdxlControlNetModelCore.forward, controlnets.py:545-737).
    Returns (down_block_res_samples (9, NHWC), mid_block_res_sample).

    The addition/class/encoder-hid embedding variants are dispatched by param
    structure (the same information the reference routes through config
    strings, controlnets.py:255-325):
      add_embedding with {pool,proj}         -> addition_embed_type "text"
      add_embedding with {text_proj}         -> "text_image" (Kandinsky 2.1)
      add_embedding with {linear1,linear2}   -> "text_time" (SDXL default)
      class_embedding {weight} lookup table or {linear1,linear2} MLP
        (+ class_embed_sinusoidal for class_embed_type == "timestep")
      encoder_hid_proj with {image_embeds}   -> "text_image_proj", else "text_proj"
    """
    b = sample.shape[0]
    dt = jnp.bfloat16
    t_emb = get_timestep_embedding(
        timestep, cfg.block_channels[0], flip_sin_to_cos=True, downscale_freq_shift=0.0
    )
    emb = timestep_embedding_apply(params["time_embedding"], t_emb.astype(dt))

    ce = params.get("class_embedding")
    if ce is not None:
        if class_labels is None:
            raise ValueError(
                "this ControlNet checkpoint has a class_embedding — pass "
                "class_labels to sdxl_controlnet_forward (ref :646)"
            )
        if "weight" in ce:  # nn.Embedding lookup table
            class_emb = ce["weight"][class_labels]
        else:  # TimestepEmbedding MLP ("timestep" kind first converts labels
            # to the sinusoidal basis, ref :649-651 via time_proj)
            labels = class_labels
            if class_embed_sinusoidal:
                labels = get_timestep_embedding(
                    labels, cfg.block_channels[0], flip_sin_to_cos=True,
                    downscale_freq_shift=0.0,
                )
            class_emb = timestep_embedding_apply(ce, labels.astype(dt))
        emb = emb + class_emb.astype(emb.dtype)

    ae = params.get("add_embedding")
    if ae is not None:
        if "pool" in ae:  # addition_embed_type == "text"
            emb = emb + text_time_embedding_apply(
                ae, encoder_hidden_states.astype(dt), cfg.addition_embed_num_heads
            )
        elif "text_proj" in ae:  # "text_image"
            if image_embeds is None:
                raise ValueError(
                    "addition_embed_type 'text_image' needs image_embeds "
                    "(added_cond_kwargs['image_embeds'], ref :655-658)"
                )
            emb = emb + text_image_time_embedding_apply(
                ae, encoder_hidden_states.astype(dt), image_embeds.astype(dt)
            )
        else:  # "text_time" (SDXL)
            time_embeds = get_timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim,
                flip_sin_to_cos=True, downscale_freq_shift=0.0,
            ).reshape(b, -1)
            add_embeds = jnp.concatenate(
                [text_embeds.astype(jnp.float32), time_embeds], axis=-1
            )
            emb = emb + timestep_embedding_apply(ae, add_embeds.astype(dt))

    ctx = encoder_hidden_states.astype(dt)
    ehp = params.get("encoder_hid_proj")
    if ehp is not None:
        if "image_embeds" in ehp:  # "text_image_proj" (Kandinsky 2.1)
            if image_embeds is None:
                raise ValueError(
                    "encoder_hid_dim_type 'text_image_proj' needs "
                    "image_embeds (ref :146-154)"
                )
            ctx = text_image_projection_apply(ehp, ctx, image_embeds.astype(dt))
        else:  # "text_proj"
            ctx = qlinear_apply(ehp, ctx)
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

    if guess_mode and not global_pool_conditions:
        scales = jnp.logspace(-1, 0, len(down_samples) + 1) * conditioning_scale
        down_samples = [s * sc for s, sc in zip(down_samples, scales[:-1])]
        mid_sample = mid_sample * scales[-1]
    else:
        down_samples = [s * conditioning_scale for s in down_samples]
        mid_sample = mid_sample * conditioning_scale
    if global_pool_conditions:
        # spatial mean-pool of every residual (ref: controlnets.py:731-735);
        # NHWC here, so pool over (1, 2)
        down_samples = [jnp.mean(s, axis=(1, 2), keepdims=True) for s in down_samples]
        mid_sample = jnp.mean(mid_sample, axis=(1, 2), keepdims=True)
    return down_samples, mid_sample


def sdxl_controlnet_init_random(
    key, cfg: SDXLConfig, cond_channels: Tuple[int, ...] = (16, 32, 96, 256)
) -> Dict:
    """Random SDXL-CN params (profiling / tests without checkpoints); reuses
    the UNet's random down+mid path and adds hint encoder + zero convs
    (nonzero-random here so tests can detect the residuals)."""
    from fastdm_tpu.models.sdxl import _rand_conv, sdxl_init_random

    base = sdxl_init_random(key, cfg)
    params = {
        k: base[k]
        for k in ("conv_in", "time_embedding", "add_embedding",
                  "down0", "down1", "down2", "mid")
    }
    c0, c1, c2 = cfg.block_channels
    e = cond_channels
    ks = jax.random.split(jax.random.fold_in(key, 1), 20)
    params["cond_embedding"] = {
        "conv_in": _rand_conv(ks[0], 3, 3, 3, e[0]),
        "blocks": [
            _rand_conv(ks[1 + i], 3, 3, e[i // 2], e[(i + 1) // 2]) for i in range(6)
        ],
        "conv_out": _rand_conv(ks[7], 3, 3, e[3], c0),
    }
    skip_ch = [c0, c0, c0, c0, c1, c1, c1, c2, c2]
    params["controlnet_down_blocks"] = [
        _rand_conv(ks[8 + i], 1, 1, c, c) for i, c in enumerate(skip_ch)
    ]
    params["controlnet_mid_block"] = _rand_conv(ks[17], 1, 1, c2, c2)
    return params


def _cn_add_embedding_p(src: TensorSource):
    """Detect + load the checkpoint's addition_embed_type variant
    (ref config routing: controlnets.py:303-325)."""
    from fastdm_tpu.models.sdxl import _ln

    if "add_embedding.linear_1.weight" in src:  # "text_time" (SDXL)
        return {
            "linear1": src.linear("add_embedding.linear_1", None),
            "linear2": src.linear("add_embedding.linear_2", None),
        }
    if "add_embedding.pool.positional_embedding" in src:  # "text"
        return {
            "norm1": _ln(src, "add_embedding.norm1"),
            "pool": {
                "positional_embedding": src.tensor(
                    "add_embedding.pool.positional_embedding"
                ),
                "q_proj": src.linear("add_embedding.pool.q_proj", None),
                "k_proj": src.linear("add_embedding.pool.k_proj", None),
                "v_proj": src.linear("add_embedding.pool.v_proj", None),
            },
            "proj": src.linear("add_embedding.proj", None),
            "norm2": _ln(src, "add_embedding.norm2"),
        }
    if "add_embedding.text_proj.weight" in src:  # "text_image"
        return {
            "text_proj": src.linear("add_embedding.text_proj", None),
            "text_norm": _ln(src, "add_embedding.text_norm"),
            "image_proj": src.linear("add_embedding.image_proj", None),
        }
    return None


def _cn_class_embedding_p(src: TensorSource):
    """class_embed_type variants (ref: controlnets.py:281-301). The lookup
    table vs MLP distinction is recoverable from the checkpoint keys; the
    timestep-vs-projection distinction (sinusoid first or not) must come from
    config.json and is patched onto 'kind' by the caller when known."""
    if "class_embedding.weight" in src:  # nn.Embedding table
        return {"weight": src.tensor("class_embedding.weight")}
    if "class_embedding.linear_1.weight" in src:  # timestep/projection MLP
        return {
            "linear1": src.linear("class_embedding.linear_1", None),
            "linear2": src.linear("class_embedding.linear_2", None),
        }
    return None


def _cn_encoder_hid_p(src: TensorSource):
    """encoder_hid_dim_type variants (ref: controlnets.py:255-279)."""
    if "encoder_hid_proj.weight" in src:  # "text_proj": one linear
        return src.linear("encoder_hid_proj", None)
    if "encoder_hid_proj.image_embeds.weight" in src:  # "text_image_proj"
        return {
            "image_embeds": src.linear("encoder_hid_proj.image_embeds", None),
            "text_proj": src.linear("encoder_hid_proj.text_proj", None),
        }
    return None


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
        "cond_embedding": {
            "conv_in": _conv_p(src, "controlnet_cond_embedding.conv_in"),
            "blocks": [
                _conv_p(src, f"controlnet_cond_embedding.blocks.{i}") for i in range(6)
            ],
            "conv_out": _conv_p(src, "controlnet_cond_embedding.conv_out"),
        },
    }
    for name, loaded in (
        ("add_embedding", _cn_add_embedding_p(src)),
        ("class_embedding", _cn_class_embedding_p(src)),
        ("encoder_hid_proj", _cn_encoder_hid_p(src)),
    ):
        if loaded is not None:
            params[name] = loaded
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
    # raw-image hint variants (input_hint_block) are unsupported; the loader
    # rejects such checkpoints explicitly
    conditioning_embedding_channels: Optional[int] = None


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
    control_mode: Optional[int] = None,
) -> Tuple[Optional[Array], Optional[Array]]:
    """(ref: FluxControlNetModelCore.forward, controlnets.py:890-1046).
    Returns stacked (num_layers, B, S, D) and (num_single_layers, B, S, D)
    residuals (already scaled), ready for flux_forward's controlnet args.

    control_mode: union checkpoints prepend one mode-embedding token to the
    text stream — the caller's rope cos/sin must then cover txt_len+1 ids."""
    hidden = qlinear_apply(params["x_embedder"], hidden_states)
    if "input_hint_block" in params:
        # raw-image-hint variant: controlnet_cond is the (B, Hpx, Wpx, 3)
        # conditioning IMAGE in [-1, 1]; the conv stack (same module class
        # as the SDXL hint encoder) maps it to 1/8 resolution, then a
        # patch_size x patch_size pixel-unshuffle packs tokens the same way
        # the torch core does (ref: FluxControlNetModelCore.forward,
        # fastdm/model/controlnets.py:960-970 — reshape/permute to
        # (B, H*W, C*ps^2) with (c, ph, pw) channel order).
        hint = controlnet_cond_embedding_apply(
            params["input_hint_block"], controlnet_cond)
        b, hp, wp, c = hint.shape
        ps = 2
        hint = hint.reshape(b, hp // ps, ps, wp // ps, ps, c)
        hint = jnp.transpose(hint, (0, 1, 3, 5, 2, 4))
        controlnet_cond = hint.reshape(b, (hp // ps) * (wp // ps), c * ps * ps)
    hidden = hidden + qlinear_apply(params["controlnet_x_embedder"], controlnet_cond)
    # the loader auto-detects the guidance embedder from the checkpoint
    # (controlnets.py load: 'time_text_embed.guidance_embedder'); gate the
    # forward on the PARAMS, not the config default, and fail loudly when a
    # guidance-distilled CN gets no guidance
    use_guidance = "guidance_embedder" in params["time_text_embed"]
    if use_guidance and guidance is None:
        raise ValueError(
            "this FLUX ControlNet checkpoint is guidance-distilled; "
            "pass guidance=")
    temb = combined_timestep_text_proj_apply(
        params["time_text_embed"],
        timestep.astype(jnp.float32) * 1000.0,
        pooled_projections,
        guidance.astype(jnp.float32) * 1000.0 if use_guidance else None,
    )
    encoder = qlinear_apply(params["context_embedder"], encoder_hidden_states)
    if control_mode is not None and "controlnet_mode_embedder" in params:
        mode = params["controlnet_mode_embedder"][control_mode].astype(encoder.dtype)
        mode = jnp.broadcast_to(mode[None, None, :], (encoder.shape[0], 1, mode.shape[-1]))
        encoder = jnp.concatenate([mode, encoder], axis=1)

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


def flux_controlnet_init_random(key, cfg: FluxControlNetConfig) -> Dict:
    """Random FLUX-CN params (tests/profiling); zero-heads drawn small-random
    so injected residuals are detectable."""
    from fastdm_tpu.models.flux import flux_init_random
    from fastdm_tpu.layers.qlinear import qlinear_random

    base = flux_init_random(key, cfg)
    params = {
        k: base[k] for k in ("x_embedder", "context_embedder", "time_text_embed")
    }
    if cfg.num_layers:
        params["dual_blocks"] = base["dual_blocks"]
    if cfg.num_single_layers:
        params["single_blocks"] = base["single_blocks"]
    d = cfg.inner_dim
    k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 1), 3)
    params["controlnet_x_embedder"] = qlinear_random(k1, cfg.in_channels, d, quant=None)

    def heads(k, n):
        return {
            "w": 0.02 * jax.random.normal(k, (n, d, d), jnp.bfloat16),
            "bias": jnp.zeros((n, d), jnp.float32),
        }

    if cfg.num_layers:
        params["controlnet_blocks"] = heads(k2, cfg.num_layers)
    if cfg.num_single_layers:
        params["controlnet_single_blocks"] = heads(k3, cfg.num_single_layers)
    return params


def flux_controlnet_load(src: TensorSource, cfg: FluxControlNetConfig) -> Dict:
    """Load a diffusers FLUX ControlNet checkpoint (InstantX/XLabs layouts).

    CN checkpoints carry the flux trunk WITHOUT norm_out/proj_out, plus
    controlnet_x_embedder and zero-linear heads; union variants add a mode
    embedder, raw-image variants an input_hint_block conv stack (loaded
    below; the forward then takes the conditioning IMAGE, not latents)."""
    from fastdm_tpu.models.sdxl import _conv_p

    if "input_hint_block.0.weight" in src:
        raise NotImplementedError(
            "this FLUX ControlNet's input_hint_block uses a flat Sequential "
            "layout; only the diffusers ControlNetConditioningEmbedding "
            "layout (conv_in/blocks.N/conv_out) is supported")

    q = cfg.quant
    qm = q if cfg.quant_mods else None
    params: Dict = {
        "x_embedder": src.linear("x_embedder", None),
        "context_embedder": src.linear("context_embedder", None),
        "controlnet_x_embedder": src.linear("controlnet_x_embedder", None),
    }
    if "input_hint_block.conv_in.weight" in src:
        # raw-image-hint variant: diffusers ControlNetConditioningEmbedding
        # conv stack (same module class as the SDXL hint encoder)
        n_blocks = 0
        while f"input_hint_block.blocks.{n_blocks}.weight" in src:
            n_blocks += 1
        params["input_hint_block"] = {
            "conv_in": _conv_p(src, "input_hint_block.conv_in"),
            "blocks": [
                _conv_p(src, f"input_hint_block.blocks.{i}")
                for i in range(n_blocks)
            ],
            "conv_out": _conv_p(src, "input_hint_block.conv_out"),
        }
    tte = {
        "timestep_embedder": {
            "linear1": src.linear("time_text_embed.timestep_embedder.linear_1", None),
            "linear2": src.linear("time_text_embed.timestep_embedder.linear_2", None),
        },
        "text_embedder": {
            "linear1": src.linear("time_text_embed.text_embedder.linear_1", None),
            "linear2": src.linear("time_text_embed.text_embedder.linear_2", None),
        },
    }
    if "time_text_embed.guidance_embedder.linear_1.weight" in src:
        tte["guidance_embedder"] = {
            "linear1": src.linear("time_text_embed.guidance_embedder.linear_1", None),
            "linear2": src.linear("time_text_embed.guidance_embedder.linear_2", None),
        }
    params["time_text_embed"] = tte

    dual = []
    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}"
        dual.append({
            "norm1": {"linear": src.linear(f"{p}.norm1.linear", qm)},
            "norm1_context": {"linear": src.linear(f"{p}.norm1_context.linear", qm)},
            "attn": {
                "qkv": src.fused_linear(
                    [f"{p}.attn.to_q", f"{p}.attn.to_k", f"{p}.attn.to_v"], q
                ),
                "add_qkv": src.fused_linear(
                    [f"{p}.attn.add_q_proj", f"{p}.attn.add_k_proj",
                     f"{p}.attn.add_v_proj"], q
                ),
                "norm_q": src.tensor(f"{p}.attn.norm_q.weight"),
                "norm_k": src.tensor(f"{p}.attn.norm_k.weight"),
                "norm_added_q": src.tensor(f"{p}.attn.norm_added_q.weight"),
                "norm_added_k": src.tensor(f"{p}.attn.norm_added_k.weight"),
                "to_out": src.linear(f"{p}.attn.to_out.0", q),
                "to_add_out": src.linear(f"{p}.attn.to_add_out", q),
            },
            "ff": {
                "proj": src.linear(f"{p}.ff.net.0.proj", q),
                "out": src.linear(f"{p}.ff.net.2", q),
            },
            "ff_context": {
                "proj": src.linear(f"{p}.ff_context.net.0.proj", q),
                "out": src.linear(f"{p}.ff_context.net.2", q),
            },
        })
    if dual:
        params["dual_blocks"] = stack_blocks(dual)

    single = []
    for i in range(cfg.num_single_layers):
        p = f"single_transformer_blocks.{i}"
        single.append({
            "norm": {"linear": src.linear(f"{p}.norm.linear", qm)},
            # same fused q|k|v|mlp_in layout as models/flux.py single blocks
            "qkv_mlp": src.fused_linear(
                [f"{p}.attn.to_q", f"{p}.attn.to_k", f"{p}.attn.to_v",
                 f"{p}.proj_mlp"], q
            ),
            "proj_out": src.linear(f"{p}.proj_out", q),
            "attn": {
                "norm_q": src.tensor(f"{p}.attn.norm_q.weight"),
                "norm_k": src.tensor(f"{p}.attn.norm_k.weight"),
            },
        })
    if single:
        params["single_blocks"] = stack_blocks(single)

    def zero_heads(prefix):
        heads, i = [], 0
        while f"{prefix}.{i}.weight" in src:
            w = np.asarray(src.take(f"{prefix}.{i}.weight"), np.float32)
            b = np.asarray(src.take(f"{prefix}.{i}.bias"), np.float32)
            heads.append({"w": jnp.asarray(w.T, jnp.bfloat16), "bias": jnp.asarray(b)})
            i += 1
        return stack_blocks(heads) if heads else None

    hb = zero_heads("controlnet_blocks")
    if hb is not None:
        params["controlnet_blocks"] = hb
    hs = zero_heads("controlnet_single_blocks")
    if hs is not None:
        params["controlnet_single_blocks"] = hs

    # union-mode embedding table (ref: num_mode controlnets)
    if "controlnet_mode_embedder.weight" in src:
        params["controlnet_mode_embedder"] = src.tensor("controlnet_mode_embedder.weight")

    src.assert_consumed()
    return params
