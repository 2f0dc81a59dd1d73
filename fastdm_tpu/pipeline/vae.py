"""AutoencoderKL VAE in JAX (decoder + encoder).

The reference borrows diffusers' torch VAE (SURVEY.md §1 note: "Scheduler/VAE/
text-encoders are NOT reimplemented"); the TPU rebuild owns it so decode runs
on-device right after the denoise loop. Supports the SDXL (4ch) and FLUX/SD3.5
(16ch) AutoencoderKL variants and loads diffusers vae safetensors unchanged.

Layout: NHWC internally (TPU conv-friendly); weights are transposed once at
load. Convs run in bf16 with f32 accumulation; GroupNorm in f32.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.models.loader import TensorSource

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16            # 4 for SDXL, 16 for FLUX/SD3.5
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.3611       # FLUX; SDXL 0.13025; SD3.5 1.5305
    shift_factor: float = 0.1159         # FLUX; 0 elsewhere
    mid_block_add_attention: bool = True


from fastdm_tpu.layers.conv2d import conv2d as _conv_impl, group_norm as _gn_impl, upsample_nearest2x as _upsample_nearest2x


def _conv(params, x: Array, stride: int = 1, padding="SAME") -> Array:
    return _conv_impl(params, x, stride, padding)


def _group_norm(params, x: Array, groups: int, eps: float = 1e-6) -> Array:
    return _gn_impl(params, x, groups, eps)


def _resnet(params, x: Array, groups: int) -> Array:
    """GroupNorm+SiLU+Conv x2 with residual (diffusers ResnetBlock2D, no temb)."""
    h = _group_norm(params["norm1"], x, groups)
    h = _conv(params["conv1"], jax.nn.silu(h))
    h = _group_norm(params["norm2"], h, groups)
    h = _conv(params["conv2"], jax.nn.silu(h))
    if "shortcut" in params:
        x = _conv(params["shortcut"], x)
    return x + h


def _spatial_attention(params, x: Array, groups: int) -> Array:
    """Single-head spatial self-attention in the mid block."""
    b, h, w, c = x.shape
    y = _group_norm(params["norm"], x, groups)
    y = y.reshape(b, h * w, c)

    def proj(p, t):
        return (jnp.einsum("bsc,cd->bsd", t.astype(jnp.bfloat16),
                           p["w"].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
                + p["b"].astype(jnp.float32)).astype(jnp.bfloat16)

    q, k, v = proj(params["q"], y), proj(params["k"], y), proj(params["v"], y)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (c**-0.5), axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v, preferred_element_type=jnp.float32)
    o = proj(params["out"], o.astype(jnp.bfloat16))
    return x + o.reshape(b, h, w, c)


def vae_decode(params, cfg: VAEConfig, latents: Array) -> Array:
    """(B, C_lat, H, W) latents -> (B, H*8, W*8, 3) image in [-1, 1].

    Applies the scaling/shift factors (z / scale + shift) like diffusers'
    pipeline does before calling the decoder.
    """
    z = latents.astype(jnp.float32) / cfg.scaling_factor + cfg.shift_factor
    x = jnp.transpose(z, (0, 2, 3, 1)).astype(jnp.bfloat16)  # NCHW -> NHWC
    return _decoder_core(params, cfg, x)


def _decoder_core(params, cfg: VAEConfig, x: Array) -> Array:
    """Decoder on already-scaled NHWC latents -> (B, 8H, 8W, 3)."""
    if "post_quant_conv" in params:
        x = _conv(params["post_quant_conv"], x)
    g = cfg.norm_num_groups

    x = _conv(params["conv_in"], x)
    # mid
    x = _resnet(params["mid"]["resnet0"], x, g)
    if cfg.mid_block_add_attention:
        x = _spatial_attention(params["mid"]["attn"], x, g)
    x = _resnet(params["mid"]["resnet1"], x, g)
    # up blocks (reversed channel list), 2x upsample between
    n_up = len(cfg.block_out_channels)
    for i in range(n_up):
        blk = params["up"][i]
        for r in range(cfg.layers_per_block + 1):
            x = _resnet(blk[f"resnet{r}"], x, g)
        if "upsample" in blk:
            x = _conv(blk["upsample"], _upsample_nearest2x(x))
    x = _group_norm(params["norm_out"], x, g)
    x = _conv(params["conv_out"], jax.nn.silu(x))
    return x.astype(jnp.float32)


# per-tile-shape jit caches (at most 4 distinct tile shapes each)
_decoder_core_jit = jax.jit(_decoder_core, static_argnums=(1,))
_vae_decode_jit = jax.jit(vae_decode, static_argnums=(1,))


# ------------------------------------------------------- tiling / slicing
#
# The reference inherits diffusers' enable_vae_tiling/enable_vae_slicing on
# its pipelines; this is the owned equivalent. Same algorithm as diffusers
# AutoencoderKL.tiled_decode/tiled_encode: overlapping tiles (default 512px /
# 64-latent tiles, 25% overlap), linear cross-fade over the overlap band,
# then crop each tile to its non-blended extent. Cuts peak decode HBM from
# O(full image) to O(tile) — the enabler for 2048px images and video frames
# on a 16 GB chip.


def _blend_v(a: Array, b: Array, extent: int) -> Array:
    """Cross-fade b's top rows into a's bottom rows (NHWC, axis=1)."""
    extent = min(a.shape[1], b.shape[1], extent)
    if extent <= 0:
        return b
    w = (jnp.arange(extent, dtype=jnp.float32) / extent)[None, :, None, None]
    head = a[:, a.shape[1] - extent:].astype(jnp.float32) * (1 - w) \
        + b[:, :extent].astype(jnp.float32) * w
    return jnp.concatenate([head.astype(b.dtype), b[:, extent:]], axis=1)


def _blend_h(a: Array, b: Array, extent: int) -> Array:
    """Cross-fade b's left columns into a's right columns (NHWC, axis=2)."""
    extent = min(a.shape[2], b.shape[2], extent)
    if extent <= 0:
        return b
    w = (jnp.arange(extent, dtype=jnp.float32) / extent)[None, None, :, None]
    head = a[:, :, a.shape[2] - extent:].astype(jnp.float32) * (1 - w) \
        + b[:, :, :extent].astype(jnp.float32) * w
    return jnp.concatenate([head.astype(b.dtype), b[:, :, extent:]], axis=2)


def vae_decode_tiled(
    params, cfg: VAEConfig, latents: Array,
    tile_latent_size: int = 64, overlap_factor: float = 0.25,
) -> Array:
    """Tiled decode (diffusers AutoencoderKL.tiled_decode parity).

    latents: (B, C_lat, H, W). Each (tile_latent_size)^2 latent tile decodes
    independently — one XLA compile per distinct tile shape (4 for sizes
    aligned to the tile stride: interior/right/bottom/corner; unaligned
    sizes add one truncated shape per edge), overlaps cross-fade linearly.
    """
    z = latents.astype(jnp.float32) / cfg.scaling_factor + cfg.shift_factor
    x = jnp.transpose(z, (0, 2, 3, 1)).astype(jnp.bfloat16)  # NHWC
    h, w = x.shape[1], x.shape[2]
    if h <= tile_latent_size and w <= tile_latent_size:
        # small inputs take the same jitted core as the tiles — the eager
        # op-by-op decoder is only for tracing
        return _decoder_core_jit(params, cfg, x)

    sf = 2 ** (len(cfg.block_out_channels) - 1)                  # px per latent
    overlap = int(tile_latent_size * (1 - overlap_factor))       # latent step
    blend_extent = int(tile_latent_size * sf * overlap_factor)   # px fade band
    row_limit = tile_latent_size * sf - blend_extent             # px kept/tile

    rows = []
    for i in range(0, h, overlap):
        row = []
        for j in range(0, w, overlap):
            tile = x[:, i:i + tile_latent_size, j:j + tile_latent_size, :]
            row.append(_decoder_core_jit(params, cfg, tile))
        rows.append(row)

    out_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend_extent)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend_extent)
            result_row.append(tile[:, :row_limit, :row_limit, :])
        out_rows.append(jnp.concatenate(result_row, axis=2))
    out = jnp.concatenate(out_rows, axis=1)
    return out[:, : h * sf, : w * sf, :].astype(jnp.float32)


def vae_encode_tiled(
    params, cfg: VAEConfig, image: Array,
    tile_sample_size: int = 512, overlap_factor: float = 0.25,
) -> Array:
    """Tiled deterministic encode (diffusers tiled_encode parity).

    image: (B, H, W, 3) in [-1, 1] -> (B, C_lat, H/8, W/8) scaled latents.
    Blending happens on the scaled latents — valid because the scale/shift
    map is affine, so it commutes with the convex cross-fade.
    """
    h, w = image.shape[1], image.shape[2]
    if h <= tile_sample_size and w <= tile_sample_size:
        return _vae_encode_jit(params, cfg, image)

    sf = 2 ** (len(cfg.block_out_channels) - 1)                  # px per latent
    overlap = int(tile_sample_size * (1 - overlap_factor))       # px step
    lat_tile = tile_sample_size // sf
    blend_extent = int(lat_tile * overlap_factor)                # latent fade
    row_limit = lat_tile - blend_extent

    rows = []
    for i in range(0, h, overlap):
        row = []
        for j in range(0, w, overlap):
            tile = image[:, i:i + tile_sample_size, j:j + tile_sample_size, :]
            z = _vae_encode_jit(params, cfg, tile)                # (B,C,h',w')
            row.append(jnp.transpose(z, (0, 2, 3, 1)))           # NHWC blend
        rows.append(row)

    out_rows = []
    for i, row in enumerate(rows):
        result_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend_extent)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend_extent)
            result_row.append(tile[:, :row_limit, :row_limit, :])
        out_rows.append(jnp.concatenate(result_row, axis=2))
    out = jnp.concatenate(out_rows, axis=1)[:, : h // sf, : w // sf, :]
    return jnp.transpose(out, (0, 3, 1, 2))


def vae_decode_sliced(params, cfg: VAEConfig, latents: Array) -> Array:
    """Batch-sliced decode (diffusers enable_vae_slicing parity): decode one
    sample at a time so peak activation memory is batch-independent."""
    if latents.shape[0] == 1:
        return _vae_decode_jit(params, cfg, latents)
    return jnp.concatenate(
        [_vae_decode_jit(params, cfg, latents[i:i + 1])
         for i in range(latents.shape[0])],
        axis=0,
    )


def vae_encode(params, cfg: VAEConfig, image: Array, sample_noise: Optional[Array] = None) -> Array:
    """(B, H, W, 3) image in [-1,1] -> (B, C_lat, H/8, W/8) scaled latents.

    Deterministic (mode) unless sample_noise is given: z = mean + std * noise.
    """
    g = cfg.norm_num_groups
    x = image.astype(jnp.bfloat16)
    x = _conv(params["conv_in"], x)
    n_down = len(cfg.block_out_channels)
    for i in range(n_down):
        blk = params["down"][i]
        for r in range(cfg.layers_per_block):
            x = _resnet(blk[f"resnet{r}"], x, g)
        if "downsample" in blk:
            # diffusers pads (0,1,0,1) then stride-2 VALID conv
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = _conv(blk["downsample"], x, stride=2, padding="VALID")
    x = _resnet(params["mid"]["resnet0"], x, g)
    if cfg.mid_block_add_attention:
        x = _spatial_attention(params["mid"]["attn"], x, g)
    x = _resnet(params["mid"]["resnet1"], x, g)
    x = _group_norm(params["norm_out"], x, g)
    x = _conv(params["conv_out"], jax.nn.silu(x))
    if "quant_conv" in params:
        x = _conv(params["quant_conv"], x)
    mean, logvar = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    if sample_noise is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * sample_noise
    z = jnp.transpose(mean, (0, 3, 1, 2))  # NHWC -> NCHW latents
    return (z - cfg.shift_factor) * cfg.scaling_factor


_vae_encode_jit = jax.jit(vae_encode, static_argnums=(1,))


# ---------------------------------------------------------------- loading


def _take_conv(src: TensorSource, prefix: str) -> Dict[str, Array]:
    w = np.asarray(src.tensor(f"{prefix}.weight", jnp.float32))  # (out,in,kh,kw)
    b = src.tensor(f"{prefix}.bias", jnp.float32)
    if w.ndim == 4:
        from fastdm_tpu.layers.conv2d import conv_from_torch

        return conv_from_torch(w, np.asarray(b, np.float32))
    # attention projections stored as (out,in) linear
    return {"w": jnp.asarray(w.T, jnp.bfloat16), "b": b}


def _take_norm(src: TensorSource, prefix: str) -> Dict[str, Array]:
    return {
        "gamma": src.tensor(f"{prefix}.weight", jnp.float32),
        "beta": src.tensor(f"{prefix}.bias", jnp.float32),
    }


def _take_resnet(src: TensorSource, prefix: str) -> Dict[str, Array]:
    p = {
        "norm1": _take_norm(src, f"{prefix}.norm1"),
        "conv1": _take_conv(src, f"{prefix}.conv1"),
        "norm2": _take_norm(src, f"{prefix}.norm2"),
        "conv2": _take_conv(src, f"{prefix}.conv2"),
    }
    if f"{prefix}.conv_shortcut.weight" in src:
        p["shortcut"] = _take_conv(src, f"{prefix}.conv_shortcut")
    return p


def _take_attn(src: TensorSource, prefix: str) -> Dict[str, Array]:
    return {
        "norm": _take_norm(src, f"{prefix}.group_norm"),
        "q": _take_conv(src, f"{prefix}.to_q"),
        "k": _take_conv(src, f"{prefix}.to_k"),
        "v": _take_conv(src, f"{prefix}.to_v"),
        "out": _take_conv(src, f"{prefix}.to_out.0"),
    }


def vae_load(src: TensorSource, cfg: VAEConfig) -> Dict:
    """Load a diffusers AutoencoderKL checkpoint (decoder + encoder)."""
    n = len(cfg.block_out_channels)
    params: Dict = {
        "conv_in": _take_conv(src, "decoder.conv_in"),
        "mid": {
            "resnet0": _take_resnet(src, "decoder.mid_block.resnets.0"),
            "resnet1": _take_resnet(src, "decoder.mid_block.resnets.1"),
        },
        "norm_out": _take_norm(src, "decoder.conv_norm_out"),
        "conv_out": _take_conv(src, "decoder.conv_out"),
        "up": [],
    }
    if cfg.mid_block_add_attention:
        params["mid"]["attn"] = _take_attn(src, "decoder.mid_block.attentions.0")
    for i in range(n):
        blk = {
            f"resnet{r}": _take_resnet(src, f"decoder.up_blocks.{i}.resnets.{r}")
            for r in range(cfg.layers_per_block + 1)
        }
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in src:
            blk["upsample"] = _take_conv(src, f"decoder.up_blocks.{i}.upsamplers.0.conv")
        params["up"].append(blk)
    if "post_quant_conv.weight" in src:
        params["post_quant_conv"] = _take_conv(src, "post_quant_conv")

    # encoder (for i2i / i2v)
    if "encoder.conv_in.weight" in src:
        enc: Dict = {
            "conv_in": _take_conv(src, "encoder.conv_in"),
            "mid": {
                "resnet0": _take_resnet(src, "encoder.mid_block.resnets.0"),
                "resnet1": _take_resnet(src, "encoder.mid_block.resnets.1"),
            },
            "norm_out": _take_norm(src, "encoder.conv_norm_out"),
            "conv_out": _take_conv(src, "encoder.conv_out"),
            "down": [],
        }
        if cfg.mid_block_add_attention:
            enc["mid"]["attn"] = _take_attn(src, "encoder.mid_block.attentions.0")
        for i in range(n):
            blk = {
                f"resnet{r}": _take_resnet(src, f"encoder.down_blocks.{i}.resnets.{r}")
                for r in range(cfg.layers_per_block)
            }
            if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in src:
                blk["downsample"] = _take_conv(src, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            enc["down"].append(blk)
        if "quant_conv.weight" in src:
            enc["quant_conv"] = _take_conv(src, "quant_conv")
        params["encoder"] = enc
    src.assert_consumed()
    return params


# ---------------------------------------------------------------- random init


def _rand_conv(key, kh, kw, cin, cout):
    kw_, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw_, (kh, kw, cin, cout), jnp.bfloat16) * 0.05,
        "b": jax.random.normal(kb, (cout,), jnp.float32) * 0.01,
    }


def _rand_norm(c):
    return {"gamma": jnp.ones((c,), jnp.float32), "beta": jnp.zeros((c,), jnp.float32)}


def _rand_resnet(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _rand_norm(cin), "conv1": _rand_conv(k1, 3, 3, cin, cout),
        "norm2": _rand_norm(cout), "conv2": _rand_conv(k2, 3, 3, cout, cout),
    }
    if cin != cout:
        p["shortcut"] = _rand_conv(k3, 1, 1, cin, cout)
    return p


def vae_decoder_random(key, cfg: VAEConfig) -> Dict:
    """Random decoder params (bench/profiling without checkpoints)."""
    chans = list(reversed(cfg.block_out_channels))  # decoder goes high->low
    ks = list(jax.random.split(key, 64))
    top = chans[0]
    params: Dict = {
        "conv_in": _rand_conv(ks.pop(), 3, 3, cfg.latent_channels, top),
        "mid": {
            "resnet0": _rand_resnet(ks.pop(), top, top),
            "attn": {
                "norm": _rand_norm(top),
                "q": {"w": jax.random.normal(ks.pop(), (top, top), jnp.bfloat16) * 0.02, "b": jnp.zeros((top,), jnp.float32)},
                "k": {"w": jax.random.normal(ks.pop(), (top, top), jnp.bfloat16) * 0.02, "b": jnp.zeros((top,), jnp.float32)},
                "v": {"w": jax.random.normal(ks.pop(), (top, top), jnp.bfloat16) * 0.02, "b": jnp.zeros((top,), jnp.float32)},
                "out": {"w": jax.random.normal(ks.pop(), (top, top), jnp.bfloat16) * 0.02, "b": jnp.zeros((top,), jnp.float32)},
            },
            "resnet1": _rand_resnet(ks.pop(), top, top),
        },
        "norm_out": _rand_norm(chans[-1]),
        "conv_out": _rand_conv(ks.pop(), 3, 3, chans[-1], cfg.out_channels),
        "post_quant_conv": _rand_conv(ks.pop(), 1, 1, cfg.latent_channels, cfg.latent_channels),
        "up": [],
    }
    prev = top
    for i in range(len(chans)):
        c = chans[i]
        blk = {}
        for r in range(cfg.layers_per_block + 1):
            blk[f"resnet{r}"] = _rand_resnet(ks.pop(), prev if r == 0 else c, c)
        if i < len(chans) - 1:
            blk["upsample"] = _rand_conv(ks.pop(), 3, 3, c, c)
        params["up"].append(blk)
        prev = c
    return params
