"""Numpy oracle for the Wan 3D causal VAE decoder.

Implements the LITERAL frame-chunked feat-cache algorithm of diffusers'
AutoencoderKLWan torch decoder (the one the reference rides — SURVEY.md §1:
the VAE is not reimplemented there) in NCDHW numpy: one latent frame per
chunk, per-conv CACHE_T=2 input caches, the "Rep" first-chunk marker on
temporal upsamplers, explicit F.pad-style causal padding. Same technique as
tests/unipc_oracle.py — a from-torch-semantics port that shares NO code with
fastdm_tpu/pipeline/wan_vae.py, so the vectorized full-sequence decode and
the lax.scan streaming decode are both checked against an independent
derivation of the window/cache math.

Operates on the SAME params pytree the JAX decoder uses (numpy-cast leaves);
the checkpoint-key-to-tree mapping is contract-tested separately
(tests/test_wan_vae.py::test_loader_consumes_diffusers_layout).
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

CACHE_T = 2


def _np(x):
    return np.asarray(x, np.float32)


def _conv3d(x, w, b, t_pad_front, t_stride=1):
    """NCDHW conv, SAME spatial, explicit front-only temporal zero pad."""
    kt, kh, kw = w.shape[2:]
    x = np.pad(x, ((0, 0), (0, 0), (t_pad_front, 0),
                   (kh // 2, kh // 2), (kw // 2, kw // 2)))
    win = sliding_window_view(x, (kt, kh, kw), axis=(2, 3, 4))
    win = win[:, :, ::t_stride]
    out = np.einsum("bcthwxyz,ocxyz->bothw", win, w, optimize=True)
    return out + b.reshape(1, -1, 1, 1, 1)


def _conv2d_frames(x, w, b):
    """Per-frame SAME 2D conv on NCDHW."""
    kh, kw = w.shape[2:]
    x = np.pad(x, ((0, 0), (0, 0), (0, 0),
                   (kh // 2, kh // 2), (kw // 2, kw // 2)))
    win = sliding_window_view(x, (kh, kw), axis=(3, 4))
    out = np.einsum("bcthwyz,ocyz->bothw", win, w, optimize=True)
    return out + b.reshape(1, -1, 1, 1, 1)


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _rms_norm(p, x):
    """Wan RMS norm over channels, NCDHW; gamma stored (C,) in the tree."""
    scale = 1.0 / np.sqrt(np.mean(np.square(x), axis=1, keepdims=True) + 1e-12)
    y = x * scale * _np(p["gamma"]).reshape(1, -1, 1, 1, 1)
    if "bias" in p:
        y = y + _np(p["bias"]).reshape(1, -1, 1, 1, 1)
    return y


def _w3(p):
    """JAX tree stores conv3d weight (kt,kh,kw,cin,cout) -> torch (O,I,kt,kh,kw)."""
    return _np(p["w"]).transpose(4, 3, 0, 1, 2), _np(p["b"])


def _w2(p):
    return _np(p["w"]).transpose(3, 2, 0, 1), _np(p["b"])


class _Cache(dict):
    """feat_cache: conv-name -> cached input frames | "Rep" | absent(None)."""


def _cached_causal_conv(name, p, x, feat, t_stride=1):
    """WanCausalConv3d under the diffusers cache walk: consume the cached
    last-2 input frames, update the cache from this chunk's input."""
    w, b = _w3(p)
    kt = w.shape[2]
    t_pad = kt // 2 * 2
    if kt == 1:
        return _conv3d(x, w, b, 0)
    old = feat.get(name)
    cache_x = x[:, :, -CACHE_T:].copy()
    if cache_x.shape[2] < 2 and old is not None:
        cache_x = np.concatenate([old[:, :, -1:], cache_x], axis=2)
    if old is not None:
        inp = np.concatenate([old, x], axis=2)
        out = _conv3d(inp, w, b, t_pad - old.shape[2], t_stride)
    else:
        out = _conv3d(x, w, b, t_pad, t_stride)
    feat[name] = cache_x
    return out


def _res_block(name, p, x, feat):
    if "shortcut" in p:
        w, b = _w3(p["shortcut"])
        h = _conv3d(x, w, b, 0)
    else:
        h = x
    x = _cached_causal_conv(f"{name}.c1", p["conv1"], _silu(_rms_norm(p["norm1"], x)), feat)
    x = _cached_causal_conv(f"{name}.c2", p["conv2"], _silu(_rms_norm(p["norm2"], x)), feat)
    return x + h


def _attn_block(p, x):
    """Per-frame single-head spatial attention; qkv/proj stored as (C, 3C)
    and (C, C) linear weights in the tree."""
    b, c, t, hh, ww = x.shape
    y = _rms_norm(p["norm"], x)
    y = y.transpose(0, 2, 3, 4, 1).reshape(b * t, hh * ww, c)
    qkv = y @ _np(p["qkv"]["w"]) + _np(p["qkv"]["b"])
    q, k, v = np.split(qkv, 3, axis=-1)
    logits = (q @ k.transpose(0, 2, 1)) * (c ** -0.5)
    logits = logits - logits.max(axis=-1, keepdims=True)
    pr = np.exp(logits)
    pr = pr / pr.sum(axis=-1, keepdims=True)
    o = pr @ v
    o = o @ _np(p["proj"]["w"]) + _np(p["proj"]["b"])
    o = o.reshape(b, t, hh, ww, c).transpose(0, 4, 1, 2, 3)
    return x + o


def _upsample_spatial(p, x):
    """nearest-exact 2x then conv2d (WanResample spatial resample)."""
    x = np.repeat(np.repeat(x, 2, axis=3), 2, axis=4)
    w, b = _w2(p)
    return _conv2d_frames(x, w, b)


def _temporal_upsample(name, p, x, feat):
    """WanResample upsample3d temporal step under the cache walk, including
    the "Rep" first-chunk marker (chunk 0 bypasses the time conv)."""
    old = feat.get(name)
    if old is None:
        feat[name] = "Rep"
        return x
    w, b = _w3(p)
    cache_x = x[:, :, -CACHE_T:].copy()
    if cache_x.shape[2] < 2:
        if isinstance(old, str):  # "Rep": zero history, not replication
            cache_x = np.concatenate([np.zeros_like(cache_x), cache_x], axis=2)
        else:
            cache_x = np.concatenate([old[:, :, -1:], cache_x], axis=2)
    if isinstance(old, str):
        y = _conv3d(x, w, b, 2)
    else:
        inp = np.concatenate([old, x], axis=2)
        y = _conv3d(inp, w, b, 2 - old.shape[2])
    feat[name] = cache_x
    bb, c2, t = y.shape[:3]
    c = c2 // 2
    # torch: reshape(b, 2, c, t, h, w); stack((x[:,0], x[:,1]), 3) ->
    # (b, c, t, 2, h, w) -> (b, c, 2t, h, w)
    y = y.reshape(bb, 2, c, t, *y.shape[3:])
    y = np.stack((y[:, 0], y[:, 1]), axis=3)
    return y.reshape(bb, c, 2 * t, *y.shape[4:])


def _dec_chunk(params, cfg, x, feat):
    """Decoder forward on one chunk (NCDHW), caches threaded via `feat`."""
    dec = params["decoder"]
    x = _cached_causal_conv("conv_in", dec["conv_in"], x, feat)
    x = _res_block("mid.r0", dec["mid"]["res0"], x, feat)
    x = _attn_block(dec["mid"]["attn"], x)
    x = _res_block("mid.r1", dec["mid"]["res1"], x, feat)
    for i, blk in enumerate(dec["up"]):
        xc = x
        for j, r in enumerate(blk["resnets"]):
            x = _res_block(f"up{i}.r{j}", r, x, feat)
        if "time_conv" in blk:
            x = _temporal_upsample(f"up{i}.t", blk["time_conv"], x, feat)
        if "upsample" in blk:
            x = _upsample_spatial(blk["upsample"], x)
            if getattr(cfg, "is_residual", False):
                ft = 2 if "time_conv" in blk else 1
                x = x + _dup_up3d(xc, x.shape[1], ft, 2,
                                  first=feat.get("__first__"))
    x = _rms_norm(dec["norm_out"], x)
    x = _cached_causal_conv("conv_out", dec["conv_out"], _silu(x), feat)
    return x


def _dup_up3d(x, out_c, ft, fs, first):
    """Wan2.2 residual-decoder DupUp3D shortcut: channel-replicate then
    pixel-shuffle to (t*ft, h*fs, w*fs); first chunk drops the leading
    ft-1 duplicated frames (causal layout). NCDHW, torch op order."""
    b, c, t, h, w = x.shape
    repeats = out_c * ft * fs * fs // c
    x = np.repeat(x, repeats, axis=1)
    x = x.reshape(b, out_c, ft, fs, fs, t, h, w)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # b, C, t, ft, h, fs, w, fs
    x = x.reshape(b, out_c, t * ft, h * fs, w * fs)
    if first and ft > 1:
        x = x[:, :, ft - 1 :]
    return x


def decode_oracle(params, cfg, z):
    """Frame-chunked decode: z (B, Cz, F, H, W) numpy -> (B, C, Fout, 8H, 8W)
    NCDHW, matching the torch AutoencoderKLWan chunk walk frame by frame."""
    z = _np(z)
    if cfg.latents_mean is not None:
        mean = _np(cfg.latents_mean).reshape(1, -1, 1, 1, 1)
        std = _np(cfg.latents_std).reshape(1, -1, 1, 1, 1)
        z = z * std + mean
    if "post_quant_conv" in params:
        w, b = _w3(params["post_quant_conv"])
        z = _conv3d(z, w, b, 0)
    feat = _Cache()
    outs = []
    for i in range(z.shape[2]):
        feat["__first__"] = i == 0
        outs.append(_dec_chunk(params, cfg, z[:, :, i : i + 1], feat))
    out = np.concatenate(outs, axis=2)
    p = cfg.patch_size
    if p > 1:
        # un-patchify: "b (c r q) f h w -> b c f (h q) (w r)"
        b, cpp, f, hh, ww = out.shape
        c = cpp // (p * p)
        out = out.reshape(b, c, p, p, f, hh, ww)  # b, c, r, q, f, h, w
        out = out.transpose(0, 1, 4, 5, 3, 6, 2)  # b, c, f, h, q, w, r
        out = out.reshape(b, c, f, hh * p, ww * p)
    return out
