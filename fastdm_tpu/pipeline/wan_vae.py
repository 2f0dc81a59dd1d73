"""Wan 3D causal VAE (AutoencoderKLWan) in JAX.

The reference rides diffusers' torch implementation (SURVEY.md §1: the VAE is
not reimplemented there); this is a from-scratch JAX port of the public
Wan2.1 VAE architecture as shipped in diffusers' AutoencoderKLWan:

  * causal 3D convolutions (temporal zero-padding in front only),
  * channel RMS norms (F.normalize * sqrt(dim) * gamma),
  * per-frame spatial attention in the mid blocks,
  * encoder: 3 spatial 2x downsamples (the last two also temporal 2x),
  * decoder: upsamplers that HALVE channels spatially and run a 2x-channel
    temporal conv whose output interleaves into doubled frames,
  * the first frame bypasses every temporal up/down conv (the "Rep"/skip
    cache semantics of the chunked torch decoder), giving the causal
    1 + 4k frame layout.

The torch implementation decodes frame-chunked with feat caches; on TPU the
whole sequence is one jitted program, written as the exact vectorized
equivalent of those cache semantics:
  * temporal downsample == stride-2 VALID conv over the full sequence plus a
    passthrough of frame 0,
  * temporal upsample == causal conv (2-frame zero history) over frames 1..T
    producing 2C channels that interleave to 2(T-1) frames, with frame 0
    passed through untouched.

Numerical parity against real checkpoints is pending (no checkpoints in this
environment); the loader targets the diffusers AutoencoderKLWan key layout
and the exhaustive-consumption assert surfaces any drift immediately.

Memory: `wan_vae_decode` runs the full sequence in one program (fine for
<= ~33 latent frames at 480p on 16GB); `wan_vae_decode_chunked` (below)
streams frame-by-frame with lax.scan conv caches — peak activations of one
latent frame — which is what the engine uses for 81-frame 720p
(engine._wan_decode switches at > 8 latent frames).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.models.loader import TensorSource

Array = jax.Array

# Compute dtype for the conv/attention path. bf16 in production (MXU rate +
# halved HBM); tests monkeypatch to f32 so the numpy frame-cache oracle can
# assert window alignment at 1e-4 instead of bf16-accumulation tolerances.
_DTYPE = jnp.bfloat16


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    latents_mean: Optional[Tuple[float, ...]] = None
    latents_std: Optional[Tuple[float, ...]] = None
    # Wan2.2-TI2V (5B) VAE: pixels are 2x2-patchified before the encoder and
    # unpatchified after the decoder, making the effective spatial stride
    # 8*patch_size = 16 (diffusers AutoencoderKLWan `patch_size`; z_dim 48).
    patch_size: int = 1
    # Wan2.2 VAE structure (AutoencoderKLWan is_residual=True): down/up
    # blocks carry a parameter-free pooled/duplicated shortcut around the
    # whole stage (AvgDown3D / DupUp3D pixel-shuffle semantics), and the
    # residual decoder's spatial upsample conv KEEPS its channel count (the
    # resnets do the channel change) instead of halving it. Checkpoint-key
    # layout for this variant follows the diffusers module structure as
    # understood (resnets.{j} / downsampler / upsampler nesting) — real
    # Wan2.2-VAE checkpoint parity is unvalidated in this environment (no
    # checkpoints; exhaustive-consumption assert will surface any drift).
    is_residual: bool = False

    @property
    def encoder_dims(self) -> Tuple[int, ...]:
        # [96, 96, 192, 384, 384] for the defaults
        return tuple(self.base_dim * m for m in (1,) + tuple(self.dim_mult))

    @property
    def decoder_dims(self) -> Tuple[int, ...]:
        # [384, 384, 384, 192, 96]
        m = tuple(self.dim_mult)
        return tuple(self.base_dim * u for u in (m[-1],) + m[::-1])


def _causal_conv3d(params, x: Array, stride=(1, 1, 1)) -> Array:
    """NDHWC conv with causal temporal padding (front only) and SAME spatial.

    params: {"w": (kt, kh, kw, cin, cout), "b": (cout,)}."""
    kt, kh, kw = params["w"].shape[:3]
    pads = [(kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)]
    out = jax.lax.conv_general_dilated(
        x.astype(_DTYPE),
        params["w"].astype(_DTYPE),
        window_strides=stride,
        padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + params["b"].astype(jnp.float32)).astype(_DTYPE)


def _conv3d_valid_t(params, x: Array, t_stride: int) -> Array:
    """Temporal conv with NO temporal padding (VALID over time, SAME space)."""
    kt, kh, kw = params["w"].shape[:3]
    pads = [(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)]
    out = jax.lax.conv_general_dilated(
        x.astype(_DTYPE),
        params["w"].astype(_DTYPE),
        window_strides=(t_stride, 1, 1),
        padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + params["b"].astype(jnp.float32)).astype(_DTYPE)


def _conv2d_frames(params, x: Array, stride: int = 1, zero_pad_rb: bool = False) -> Array:
    """Per-frame 2D conv on NDHWC (vmapped over time via reshape).

    zero_pad_rb: diffusers' downsample pads (0,1,0,1) (right/bottom) then
    runs a stride-2 VALID conv."""
    b, t, h, w, c = x.shape
    y = x.reshape(b * t, h, w, c).astype(_DTYPE)
    if zero_pad_rb:
        y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
        padding = "VALID"
    else:
        kh, kw_ = params["w"].shape[:2]
        padding = [(kh // 2, kh // 2), (kw_ // 2, kw_ // 2)]
    out = jax.lax.conv_general_dilated(
        y, params["w"].astype(_DTYPE),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = (out + params["b"].astype(jnp.float32)).astype(_DTYPE)
    return out.reshape(b, t, out.shape[1], out.shape[2], out.shape[3])


def _rms_norm_channel(params, x: Array) -> Array:
    """Wan RMS norm: F.normalize over channels * sqrt(dim) * gamma
    (== x * rsqrt(mean(x^2)) * gamma)."""
    x32 = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + 1e-12)
    y = x32 * scale * params["gamma"].astype(jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _res_block(params, x: Array) -> Array:
    """WanResidualBlock: RMS+SiLU+CausalConv x2 with (1x1x1) conv shortcut."""
    h = _rms_norm_channel(params["norm1"], x)
    h = _causal_conv3d(params["conv1"], jax.nn.silu(h))
    h = _rms_norm_channel(params["norm2"], h)
    h = _causal_conv3d(params["conv2"], jax.nn.silu(h))
    if "shortcut" in params:
        x = _causal_conv3d(params["shortcut"], x)
    return x + h


def _attn_block(params, x: Array) -> Array:
    """WanAttentionBlock: per-frame spatial self-attention (single head),
    1x1-conv qkv/proj."""
    b, t, hh, ww, c = x.shape
    y = _rms_norm_channel(params["norm"], x).reshape(b * t, hh * ww, c)
    qkv = (
        jnp.einsum("bsc,cd->bsd", y.astype(_DTYPE),
                   params["qkv"]["w"].astype(_DTYPE),
                   preferred_element_type=jnp.float32)
        + params["qkv"]["b"].astype(jnp.float32)
    ).astype(_DTYPE)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits * (c**-0.5), axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", p, v, preferred_element_type=jnp.float32)
    o = (
        jnp.einsum("bsc,cd->bsd", o.astype(_DTYPE),
                   params["proj"]["w"].astype(_DTYPE),
                   preferred_element_type=jnp.float32)
        + params["proj"]["b"].astype(jnp.float32)
    ).astype(x.dtype)
    return x + o.reshape(b, t, hh, ww, c)


def _upsample_nearest2x_frames(x: Array) -> Array:
    b, t, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :], (b, t, h, 2, w, 2, c))
    return x.reshape(b, t, 2 * h, 2 * w, c)


def _temporal_upsample(params, x: Array) -> Array:
    """WanResample upsample3d temporal step, vectorized cache semantics:
    frame 0 passes through; frames 1..T-1 run the causal (3,1,1) conv to 2C
    channels whose halves interleave into two output frames each
    (the torch "Rep" first-chunk skip + per-chunk doubling)."""
    head = x[:, :1]
    tail = x[:, 1:]
    if tail.shape[1] == 0:
        return head
    y = _causal_conv3d(params, tail)        # (B, T-1, H, W, 2C)
    b, tm1, h, w, c2 = y.shape
    c = c2 // 2
    # torch: reshape(b, 2, c, t) then stack((x[:,0], x[:,1]), dim=3) — the
    # channel tensor is (2, C) blocked, frame 2j = first block of frame j
    y = y.reshape(b, tm1, h, w, 2, c)
    y = jnp.moveaxis(y, 4, 2)               # (B, T-1, 2, H, W, C)
    y = y.reshape(b, 2 * tm1, h, w, c)
    return jnp.concatenate([head, y], axis=1)


def _temporal_downsample(params, x: Array) -> Array:
    """WanResample downsample3d temporal step, vectorized cache semantics:
    frame 0 passes through; a stride-2 VALID (3,1,1) conv covers the full
    sequence (windows starting at frame 0)."""
    head = x[:, :1]
    if x.shape[1] < 3:
        return head
    tail = _conv3d_valid_t(params, x, t_stride=2)
    return jnp.concatenate([head, tail], axis=1)


def _avg_down3d(x: Array, out_c: int, ft: int, fs: int) -> Array:
    """Wan2.2 AvgDown3D (parameter-free): front-zero-pad T to a multiple of
    ft, pixel-unshuffle (ft, fs, fs) into channels (torch flat order
    (C, ft, fs_h, fs_w)), then group-average channels down to out_c
    (torch view(B, out_c, group).mean)."""
    b, t, h, w, c = x.shape
    pad_t = (ft - t % ft) % ft
    if pad_t:
        x = jnp.concatenate(
            [jnp.zeros((b, pad_t, h, w, c), x.dtype), x], axis=1)
        t += pad_t
    factor = ft * fs * fs
    x = x.reshape(b, t // ft, ft, h // fs, fs, w // fs, fs, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6))  # (..., C, ft, fsh, fsw)
    x = x.reshape(b, t // ft, h // fs, w // fs, c * factor)
    group = c * factor // out_c
    return jnp.mean(
        x.reshape(b, t // ft, h // fs, w // fs, out_c, group), axis=-1)


def _dup_up3d(x: Array, out_c: int, ft: int, fs: int,
              drop_first: bool) -> Array:
    """Wan2.2 DupUp3D (parameter-free): channel-replicate then pixel-shuffle
    into (t*ft, h*fs, w*fs); drop_first drops the leading ft-1 duplicated
    frames (the torch first_chunk causal layout — vectorized over the full
    sequence this is exactly the global leading frames)."""
    b, t, h, w, c = x.shape
    factor = ft * fs * fs
    reps = out_c * factor // c
    x = jnp.repeat(x, reps, axis=-1)
    # torch channel-flat order (out_c, ft, fs_h, fs_w)
    x = x.reshape(b, t, h, w, out_c, ft, fs, fs)
    x = jnp.transpose(x, (0, 1, 5, 2, 6, 3, 7, 4))  # b,t,ft,h,fsh,w,fsw,C
    x = x.reshape(b, t * ft, h * fs, w * fs, out_c)
    if drop_first and ft > 1:
        x = x[:, ft - 1 :]
    return x


def _patchify_frames(x: Array, p: int) -> Array:
    """(B, F, H, W, C) -> (B, F, H/p, W/p, C*p*p) with diffusers'
    AutoencoderKLWan channel order `(c r q)` where q indexes the h-subpixel
    and r the w-subpixel (patchify: "b c f (h q) (w r) -> b (c r q) f h w")."""
    if p == 1:
        return x
    b, f, hh, ww, c = x.shape
    x = x.reshape(b, f, hh // p, p, ww // p, p, c)      # (b,f,h,q,w,r,c)
    x = jnp.transpose(x, (0, 1, 2, 4, 6, 5, 3))          # (b,f,h,w,c,r,q)
    return x.reshape(b, f, hh // p, ww // p, c * p * p)


def _unpatchify_frames(x: Array, p: int) -> Array:
    """Inverse of _patchify_frames: (B,F,h,w,C*p*p) -> (B,F,h*p,w*p,C)."""
    if p == 1:
        return x
    b, f, hh, ww, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, f, hh, ww, c, p, p)                 # (b,f,h,w,c,r,q)
    x = jnp.transpose(x, (0, 1, 2, 6, 3, 5, 4))          # (b,f,h,q,w,r,c)
    return x.reshape(b, f, hh * p, ww * p, c)


def wan_vae_decode(params, cfg: WanVAEConfig, latents: Array) -> Array:
    """(B, C_z, F, H, W) latents -> (B, 1+4(F-1), H*8p, W*8p, 3) in [-1, 1]."""
    z = latents.astype(jnp.float32)
    if cfg.latents_mean is not None:
        mean = jnp.asarray(cfg.latents_mean, jnp.float32)[None, :, None, None, None]
        std = jnp.asarray(cfg.latents_std, jnp.float32)[None, :, None, None, None]
        z = z * std + mean
    x = jnp.transpose(z, (0, 2, 3, 4, 1)).astype(_DTYPE)  # NCDHW -> NDHWC

    if "post_quant_conv" in params:
        x = _causal_conv3d(params["post_quant_conv"], x)
    dec = params["decoder"]
    x = _causal_conv3d(dec["conv_in"], x)
    x = _res_block(dec["mid"]["res0"], x)
    x = _attn_block(dec["mid"]["attn"], x)
    x = _res_block(dec["mid"]["res1"], x)

    for blk in dec["up"]:
        xin = x
        for r in blk["resnets"]:
            x = _res_block(r, x)
        if "time_conv" in blk:
            x = _temporal_upsample(blk["time_conv"], x)
        if "upsample" in blk:
            # nearest-exact 2x then conv (WanResample upsample; channels
            # halve in the Wan2.1 layout, stay put in the residual one)
            x = _conv2d_frames(blk["upsample"], _upsample_nearest2x_frames(x))
            if cfg.is_residual:
                # Wan2.2 DupUp3D shortcut around the whole stage; frame 0's
                # leading duplicate drops (causal 1 + ft(F-1) layout)
                ft = 2 if "time_conv" in blk else 1
                x = x + _dup_up3d(xin, x.shape[-1], ft, 2,
                                  drop_first=True).astype(x.dtype)

    x = _rms_norm_channel(dec["norm_out"], x)
    x = _causal_conv3d(dec["conv_out"], jax.nn.silu(x))
    return _unpatchify_frames(x, cfg.patch_size).astype(jnp.float32)


def wan_vae_encode(params, cfg: WanVAEConfig, video: Array) -> Array:
    """(B, F, H, W, 3) video in [-1,1] -> (B, C_z, 1+(F-1)/4, H/8p, W/8p)."""
    enc = params["encoder"]
    video = _patchify_frames(video, cfg.patch_size)
    x = _causal_conv3d(enc["conv_in"], video.astype(_DTYPE))
    for blk in enc["down"]:
        xin = x
        for r in blk["resnets"]:
            x = _res_block(r, x)
        if "downsample" in blk:
            # ZeroPad2d((0,1,0,1)) + stride-2 conv (WanResample downsample)
            x = _conv2d_frames(blk["downsample"], x, stride=2, zero_pad_rb=True)
        if "time_conv" in blk:
            x = _temporal_downsample(blk["time_conv"], x)
        if cfg.is_residual:
            # Wan2.2 AvgDown3D shortcut (every down stage; identity-average
            # on the last, factor-1 stage)
            ft = 2 if "time_conv" in blk else 1
            fs = 2 if "downsample" in blk else 1
            x = x + _avg_down3d(xin, x.shape[-1], ft, fs).astype(x.dtype)
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


# ------------------------------------------------- chunked (streaming) decode
#
# The torch decoder walks latent frames one at a time with per-conv feature
# caches; that is the memory story for 81-frame 720p (full-sequence decode
# holds every intermediate activation at 8x spatial scale). This is the same
# walk as one jitted lax.scan: the carry is the cache pytree (last 2 input
# frames of every kt=3 causal conv; 2-frame history of every temporal
# upsample conv), the body decodes ONE latent frame into 4 output frames.
# Numerically identical to wan_vae_decode (same conv windows), peak memory
# O(1 latent frame).


def _dec_frame(params, cfg: WanVAEConfig, x: Array, caches, first: bool):
    """Decoder body on one latent chunk. first=True is the torch decoder's
    chunk-0 semantics: zero conv history, temporal upsamplers skipped
    (frame 0 passthrough). Returns (frames, new_caches)."""
    new_c: Dict[str, Array] = {}

    def cc(name, p, x):
        kt = p["w"].shape[0]
        if kt == 1:
            return _conv3d_valid_t(p, x, 1)
        if first:
            hist = jnp.concatenate([jnp.zeros_like(x[:, :1]), x], axis=1)[:, -(kt - 1):]
            new_c[name] = hist
            return _causal_conv3d(p, x)
        inp = jnp.concatenate([caches[name], x], axis=1)
        new_c[name] = inp[:, -(kt - 1):]
        return _conv3d_valid_t(p, inp, 1)

    def res(name, p, x):
        h = _rms_norm_channel(p["norm1"], x)
        h = cc(f"{name}.c1", p["conv1"], jax.nn.silu(h))
        h = _rms_norm_channel(p["norm2"], h)
        h = cc(f"{name}.c2", p["conv2"], jax.nn.silu(h))
        if "shortcut" in p:
            x = _causal_conv3d(p["shortcut"], x)  # 1x1x1, cache-free
        return x + h

    def t_up(name, p, x):
        if first:
            # frame 0 bypasses the temporal conv entirely; seed zero history
            new_c[name] = jnp.zeros(
                (x.shape[0], p["w"].shape[0] - 1) + x.shape[2:], x.dtype
            )
            return x
        y = cc(name, p, x)                      # (B, T, H, W, 2C)
        b, t, h, w, c2 = y.shape
        c = c2 // 2
        y = y.reshape(b, t, h, w, 2, c)
        y = jnp.moveaxis(y, 4, 2).reshape(b, 2 * t, h, w, c)
        return y

    if "post_quant_conv" in params:
        x = _causal_conv3d(params["post_quant_conv"], x)  # 1x1x1
    dec = params["decoder"]
    x = cc("conv_in", dec["conv_in"], x)
    x = res("mid.r0", dec["mid"]["res0"], x)
    x = _attn_block(dec["mid"]["attn"], x)
    x = res("mid.r1", dec["mid"]["res1"], x)
    for i, blk in enumerate(dec["up"]):
        xin = x
        for j, r in enumerate(blk["resnets"]):
            x = res(f"up{i}.r{j}", r, x)
        if "time_conv" in blk:
            x = t_up(f"up{i}.t", blk["time_conv"], x)
        if "upsample" in blk:
            x = _conv2d_frames(blk["upsample"], _upsample_nearest2x_frames(x))
            if cfg.is_residual:
                ft = 2 if "time_conv" in blk else 1
                x = x + _dup_up3d(xin, x.shape[-1], ft, 2,
                                  drop_first=first).astype(x.dtype)
    x = _rms_norm_channel(dec["norm_out"], x)
    x = cc("conv_out", dec["conv_out"], jax.nn.silu(x))
    return x.astype(jnp.float32), new_c


def wan_vae_decode_chunked(params, cfg: WanVAEConfig, latents: Array) -> Array:
    """Streaming decode: (B, C_z, F, H, W) -> (B, 1+4(F-1), 8H, 8W, 3) with
    peak activation memory of ONE latent frame (lax.scan over frames,
    conv caches in the carry). Matches wan_vae_decode numerically."""
    z = latents.astype(jnp.float32)
    if cfg.latents_mean is not None:
        mean = jnp.asarray(cfg.latents_mean, jnp.float32)[None, :, None, None, None]
        std = jnp.asarray(cfg.latents_std, jnp.float32)[None, :, None, None, None]
        z = z * std + mean
    x = jnp.transpose(z, (0, 2, 3, 4, 1)).astype(_DTYPE)  # NDHWC

    first, caches = _dec_frame(params, cfg, x[:, :1], None, first=True)
    if x.shape[1] == 1:
        return _unpatchify_frames(first, cfg.patch_size)

    xs = jnp.moveaxis(x[:, 1:], 1, 0)[:, :, None]  # (F-1, B, 1, H, W, C)

    def body(carry, xt):
        out, carry = _dec_frame(params, cfg, xt, carry, first=False)
        return carry, out

    _, ys = jax.lax.scan(body, caches, xs)          # (F-1, B, 4, 8H, 8W, 3p²)
    f1, b, k, hh, ww, c = ys.shape
    rest = jnp.moveaxis(ys, 0, 1).reshape(b, f1 * k, hh, ww, c)
    return _unpatchify_frames(
        jnp.concatenate([first, rest], axis=1), cfg.patch_size)


# ---------------------------------------------------------------- loading


def _conv3d_p(src: TensorSource, prefix: str) -> Dict[str, Array]:
    w = np.asarray(src.tensor(f"{prefix}.weight", jnp.float32))  # (out,in,kt,kh,kw)
    b = src.tensor(f"{prefix}.bias", jnp.float32)
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0)), _DTYPE),  # DHWIO
        "b": b,
    }


def _conv2d_p(src: TensorSource, prefix: str) -> Dict[str, Array]:
    w = np.asarray(src.tensor(f"{prefix}.weight", jnp.float32))  # (out,in,kh,kw)
    b = src.tensor(f"{prefix}.bias", jnp.float32)
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), _DTYPE),  # HWIO
        "b": b,
    }


def _lin_from_conv1x1(src: TensorSource, prefix: str) -> Dict[str, Array]:
    """Wan attention qkv/proj are 1x1 Conv2d; fold to (cin, cout) matmuls."""
    w = np.asarray(src.tensor(f"{prefix}.weight", jnp.float32))  # (out,in,1,1)
    b = src.tensor(f"{prefix}.bias", jnp.float32)
    return {"w": jnp.asarray(w[:, :, 0, 0].T, _DTYPE), "b": b}


def _norm_p(src: TensorSource, prefix: str) -> Dict[str, Array]:
    p = {"gamma": src.tensor(f"{prefix}.gamma", jnp.float32).reshape(-1)}
    if f"{prefix}.bias" in src:
        p["bias"] = src.tensor(f"{prefix}.bias", jnp.float32).reshape(-1)
    return p


def _res_p(src: TensorSource, prefix: str) -> Dict[str, Array]:
    p = {
        "norm1": _norm_p(src, f"{prefix}.norm1"),
        "conv1": _conv3d_p(src, f"{prefix}.conv1"),
        "norm2": _norm_p(src, f"{prefix}.norm2"),
        "conv2": _conv3d_p(src, f"{prefix}.conv2"),
    }
    if f"{prefix}.conv_shortcut.weight" in src:
        p["shortcut"] = _conv3d_p(src, f"{prefix}.conv_shortcut")
    return p


def _attn_p(src: TensorSource, prefix: str) -> Dict[str, Array]:
    return {
        "norm": _norm_p(src, f"{prefix}.norm"),
        "qkv": _lin_from_conv1x1(src, f"{prefix}.to_qkv"),
        "proj": _lin_from_conv1x1(src, f"{prefix}.proj"),
    }


def _mid_p(src: TensorSource, prefix: str) -> Dict[str, Array]:
    return {
        "res0": _res_p(src, f"{prefix}.resnets.0"),
        "attn": _attn_p(src, f"{prefix}.attentions.0"),
        "res1": _res_p(src, f"{prefix}.resnets.1"),
    }


def wan_vae_load(src: TensorSource, cfg: WanVAEConfig) -> Dict:
    """Load a diffusers AutoencoderKLWan checkpoint.

    The diffusers module keeps the original Wan layout: FLAT
    encoder.down_blocks / decoder.up_blocks ModuleLists where residual
    blocks and WanResample entries share one index space, resample convs at
    '<block>.resample.1' (Sequential [pad/upsample, conv]) and temporal
    convs at '<block>.time_conv'. Exhaustive consumption asserts on exit."""
    n_stages = len(cfg.dim_mult)

    if cfg.is_residual:
        # ---- Wan2.2 residual layout: NESTED down_blocks.{i}.resnets.{j} /
        # .downsampler / up_blocks.{i}.resnets.{j} / .upsampler modules
        # (AvgDown3D/DupUp3D shortcuts are parameter-free)
        enc: Dict = {"conv_in": _conv3d_p(src, "encoder.conv_in"), "down": []}
        for i in range(n_stages):
            b = f"encoder.down_blocks.{i}"
            blk: Dict = {"resnets": [
                _res_p(src, f"{b}.resnets.{j}")
                for j in range(cfg.num_res_blocks)]}
            if i != n_stages - 1:
                blk["downsample"] = _conv2d_p(src, f"{b}.downsampler.resample.1")
                if f"{b}.downsampler.time_conv.weight" in src:
                    blk["time_conv"] = _conv3d_p(src, f"{b}.downsampler.time_conv")
            enc["down"].append(blk)
    else:
        # ---- encoder: walk the flat index space the way the module was built
        enc = {"conv_in": _conv3d_p(src, "encoder.conv_in"), "down": []}
        idx = 0
        for i in range(n_stages):
            blk = {"resnets": []}
            for _ in range(cfg.num_res_blocks):
                blk["resnets"].append(_res_p(src, f"encoder.down_blocks.{idx}"))
                idx += 1
            if i != n_stages - 1:
                p = f"encoder.down_blocks.{idx}"
                blk["downsample"] = _conv2d_p(src, f"{p}.resample.1")
                if f"{p}.time_conv.weight" in src:  # downsample3d
                    blk["time_conv"] = _conv3d_p(src, f"{p}.time_conv")
                idx += 1
            enc["down"].append(blk)
    enc["mid"] = _mid_p(src, "encoder.mid_block")
    enc["norm_out"] = _norm_p(src, "encoder.norm_out")
    enc["conv_out"] = _conv3d_p(src, "encoder.conv_out")

    # ---- decoder
    dec: Dict = {"conv_in": _conv3d_p(src, "decoder.conv_in"), "up": []}
    dec["mid"] = _mid_p(src, "decoder.mid_block")
    if cfg.is_residual:
        for i in range(n_stages):
            b = f"decoder.up_blocks.{i}"
            blk = {"resnets": [
                _res_p(src, f"{b}.resnets.{j}")
                for j in range(cfg.num_res_blocks + 1)]}
            if i != n_stages - 1:
                if f"{b}.upsampler.time_conv.weight" in src:
                    blk["time_conv"] = _conv3d_p(src, f"{b}.upsampler.time_conv")
                blk["upsample"] = _conv2d_p(src, f"{b}.upsampler.resample.1")
            dec["up"].append(blk)
    else:
        idx = 0
        for i in range(n_stages):
            blk = {"resnets": []}
            for _ in range(cfg.num_res_blocks + 1):
                blk["resnets"].append(_res_p(src, f"decoder.up_blocks.{idx}"))
                idx += 1
            if i != n_stages - 1:
                p = f"decoder.up_blocks.{idx}"
                if f"{p}.time_conv.weight" in src:  # upsample3d
                    blk["time_conv"] = _conv3d_p(src, f"{p}.time_conv")
                blk["upsample"] = _conv2d_p(src, f"{p}.resample.1")
                idx += 1
            dec["up"].append(blk)
    dec["norm_out"] = _norm_p(src, "decoder.norm_out")
    dec["conv_out"] = _conv3d_p(src, "decoder.conv_out")

    params: Dict = {"encoder": enc, "decoder": dec}
    if "quant_conv.weight" in src:
        params["quant_conv"] = _conv3d_p(src, "quant_conv")
    if "post_quant_conv.weight" in src:
        params["post_quant_conv"] = _conv3d_p(src, "post_quant_conv")
    src.assert_consumed()
    return params


# ---------------------------------------------------------------- random init


def _rand_conv3d(key, kt, kh, kw, cin, cout, std=0.05):
    kw_, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw_, (kt, kh, kw, cin, cout), _DTYPE) * std,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _rand_conv2d(key, kh, kw, cin, cout, std=0.05):
    kw_, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw_, (kh, kw, cin, cout), _DTYPE) * std,
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
    """Random-weight Wan VAE (decoder + encoder), faithful channel flow
    (tests/profiling without checkpoints)."""
    ks = list(jax.random.split(key, 128))

    def attn(c):
        return {
            "norm": _rand_norm(c),
            "qkv": {
                "w": jax.random.normal(ks.pop(), (c, 3 * c), _DTYPE) * 0.02,
                "b": jnp.zeros((3 * c,), jnp.float32),
            },
            "proj": {
                "w": jax.random.normal(ks.pop(), (c, c), _DTYPE) * 0.02,
                "b": jnp.zeros((c,), jnp.float32),
            },
        }

    n_stages = len(cfg.dim_mult)

    # encoder: dims [96, 96, 192, 384, 384]
    e_dims = cfg.encoder_dims
    pix_ch = 3 * cfg.patch_size * cfg.patch_size
    enc: Dict = {"conv_in": _rand_conv3d(ks.pop(), 3, 3, 3, pix_ch, e_dims[0]),
                 "down": []}
    for i in range(n_stages):
        cin, cout = e_dims[i], e_dims[i + 1]
        blk: Dict = {"resnets": []}
        for r in range(cfg.num_res_blocks):
            blk["resnets"].append(_rand_res(ks.pop(), cin if r == 0 else cout, cout))
        if i != n_stages - 1:
            blk["downsample"] = _rand_conv2d(ks.pop(), 3, 3, cout, cout)
            if cfg.temporal_downsample[i]:
                blk["time_conv"] = _rand_conv3d(ks.pop(), 3, 1, 1, cout, cout)
        enc["down"].append(blk)
    top = e_dims[-1]
    enc["mid"] = {"res0": _rand_res(ks.pop(), top, top), "attn": attn(top),
                  "res1": _rand_res(ks.pop(), top, top)}
    enc["norm_out"] = _rand_norm(top)
    enc["conv_out"] = _rand_conv3d(ks.pop(), 3, 3, 3, top, 2 * cfg.z_dim)

    # decoder: dims [384, 384, 384, 192, 96]; in_dim halves after an upsample
    d_dims = cfg.decoder_dims
    t_up = tuple(reversed(cfg.temporal_downsample))
    dec: Dict = {
        "conv_in": _rand_conv3d(ks.pop(), 3, 3, 3, cfg.z_dim, d_dims[0]),
        "mid": {"res0": _rand_res(ks.pop(), d_dims[0], d_dims[0]),
                "attn": attn(d_dims[0]),
                "res1": _rand_res(ks.pop(), d_dims[0], d_dims[0])},
        "up": [],
    }
    for i in range(n_stages):
        cin, cout = d_dims[i], d_dims[i + 1]
        if i > 0 and not cfg.is_residual:
            cin //= 2  # previous stage's upsample conv halved the channels
        blk = {"resnets": []}
        for r in range(cfg.num_res_blocks + 1):
            blk["resnets"].append(_rand_res(ks.pop(), cin if r == 0 else cout, cout))
        if i != n_stages - 1:
            if t_up[i]:
                blk["time_conv"] = _rand_conv3d(ks.pop(), 3, 1, 1, cout, 2 * cout)
            # residual (Wan2.2) upsample conv keeps channels; Wan2.1 halves
            up_out = cout if cfg.is_residual else cout // 2
            blk["upsample"] = _rand_conv2d(ks.pop(), 3, 3, cout, up_out)
        dec["up"].append(blk)
    dec["norm_out"] = _rand_norm(d_dims[-1])
    dec["conv_out"] = _rand_conv3d(ks.pop(), 3, 3, 3, d_dims[-1], pix_ch)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _rand_conv3d(ks.pop(), 1, 1, 1, 2 * cfg.z_dim, 2 * cfg.z_dim),
        "post_quant_conv": _rand_conv3d(ks.pop(), 1, 1, 1, cfg.z_dim, cfg.z_dim),
    }
