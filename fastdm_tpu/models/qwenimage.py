"""Qwen-Image / Qwen-Image-Edit transformer core (ref: fastdm/model/qwenimage.py).

TPU design notes:
  * 60 homogeneous dual-stream blocks -> one stacked pytree + lax.scan.
  * The complex-valued QwenEmbedRope (ref: embeddings.py:762-857) becomes a
    host-side float64 numpy (cos, sin) cache: per-axis angles with the
    scale_rope centering (negative positions for the first half of H/W) and
    text positions offset by max(H/2, W/2).
  * mod projections are optionally quantized (cfg.quant_mods), mirroring the
    reference's <24GB behavior (ref: qwenimage.py:166-167,220-221).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.kernels import rms_norm
from fastdm_tpu.layers.attention import qwen_attention_apply
from fastdm_tpu.layers.embeddings import get_timestep_embedding, timestep_embedding_apply
from fastdm_tpu.layers.feedforward import feedforward_apply
from fastdm_tpu.layers.normalization import ada_layer_norm_continuous, layer_norm
from fastdm_tpu.layers.qlinear import qlinear_apply, qlinear_random
from fastdm_tpu.models.loader import TensorSource, stack_blocks

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class QwenImageConfig:
    patch_size: int = 2
    in_channels: int = 64
    out_channels: int = 16  # packed: patch^2 * out == in == 64 (diffusers cfg)
    num_layers: int = 60
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 3584
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    scale_rope: bool = True
    quant: Optional[str] = "int8"
    quant_mods: bool = False

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


# ---------------------------------------------------------------- params


def _block_random(key: Array, cfg: QwenImageConfig) -> Dict:
    d, q = cfg.inner_dim, cfg.quant
    qm = q if cfg.quant_mods else None
    ks = jax.random.split(key, 12)
    hd = cfg.attention_head_dim
    ones = jnp.ones((hd,), jnp.bfloat16)
    return {
        "img_mod": qlinear_random(ks[0], d, 6 * d, quant=qm),
        "txt_mod": qlinear_random(ks[1], d, 6 * d, quant=qm),
        "attn": {
            "qkv": qlinear_random(ks[2], d, 3 * d, quant=q),
            "add_qkv": qlinear_random(ks[3], d, 3 * d, quant=q),
            "norm_q": ones, "norm_k": ones,
            "norm_added_q": ones, "norm_added_k": ones,
            "to_out": qlinear_random(ks[4], d, d, quant=q),
            "to_add_out": qlinear_random(ks[5], d, d, quant=q),
        },
        "img_mlp": {
            "proj": qlinear_random(ks[6], d, 4 * d, quant=q),
            "out": qlinear_random(ks[7], 4 * d, d, quant=q),
        },
        "txt_mlp": {
            "proj": qlinear_random(ks[8], d, 4 * d, quant=q),
            "out": qlinear_random(ks[9], 4 * d, d, quant=q),
        },
    }


def qwen_init_random(key: Array, cfg: QwenImageConfig) -> Dict:
    d = cfg.inner_dim
    keys = jax.random.split(key, 8 + cfg.num_layers)
    return {
        "img_in": qlinear_random(keys[0], cfg.in_channels, d, quant=None),
        "txt_in": qlinear_random(keys[1], cfg.joint_attention_dim, d, quant=None),
        "txt_norm": jnp.ones((cfg.joint_attention_dim,), jnp.bfloat16),
        "time_text_embed": {
            "timestep_embedder": {
                "linear1": qlinear_random(keys[2], 256, d, quant=None),
                "linear2": qlinear_random(keys[3], d, d, quant=None),
            }
        },
        "blocks": stack_blocks([_block_random(keys[8 + i], cfg) for i in range(cfg.num_layers)]),
        "norm_out": {"linear": qlinear_random(keys[4], d, 2 * d, quant=None)},
        "proj_out": qlinear_random(keys[5], d, cfg.patch_size**2 * cfg.out_channels, quant=None),
    }


def qwen_load(src: TensorSource, cfg: QwenImageConfig) -> Dict:
    """Load a diffusers Qwen-Image checkpoint (name map ref: qwenimage.py:200-239)."""
    q = cfg.quant
    qm = q if cfg.quant_mods else None
    blocks = []
    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}"
        blocks.append({
            "img_mod": src.linear(f"{p}.img_mod.1", qm),
            "txt_mod": src.linear(f"{p}.txt_mod.1", qm),
            "attn": {
                "qkv": src.fused_linear([f"{p}.attn.to_q", f"{p}.attn.to_k", f"{p}.attn.to_v"], q),
                "add_qkv": src.fused_linear(
                    [f"{p}.attn.add_q_proj", f"{p}.attn.add_k_proj", f"{p}.attn.add_v_proj"], q
                ),
                "norm_q": src.tensor(f"{p}.attn.norm_q.weight"),
                "norm_k": src.tensor(f"{p}.attn.norm_k.weight"),
                "norm_added_q": src.tensor(f"{p}.attn.norm_added_q.weight"),
                "norm_added_k": src.tensor(f"{p}.attn.norm_added_k.weight"),
                "to_out": src.linear(f"{p}.attn.to_out.0", q),
                "to_add_out": src.linear(f"{p}.attn.to_add_out", q),
            },
            "img_mlp": {
                "proj": src.linear(f"{p}.img_mlp.net.0.proj", q),
                "out": src.linear(f"{p}.img_mlp.net.2", q),
            },
            "txt_mlp": {
                "proj": src.linear(f"{p}.txt_mlp.net.0.proj", q),
                "out": src.linear(f"{p}.txt_mlp.net.2", q),
            },
        })
    params = {
        "img_in": src.linear("img_in", None),
        "txt_in": src.linear("txt_in", None),
        "txt_norm": src.tensor("txt_norm.weight"),
        "time_text_embed": {
            "timestep_embedder": {
                "linear1": src.linear("time_text_embed.timestep_embedder.linear_1", None),
                "linear2": src.linear("time_text_embed.timestep_embedder.linear_2", None),
            }
        },
        "blocks": stack_blocks(blocks),
        "norm_out": {"linear": src.linear("norm_out.linear", None)},
        "proj_out": src.linear("proj_out", None),
    }
    src.assert_consumed()
    return params


# ---------------------------------------------------------------- forward


def _modulate(x: Array, mod: Array, eps: float = 1e-6) -> Tuple[Array, Array]:
    """layer_norm (no affine) + 3-way (shift, scale, gate) modulation
    (ref: QwenImageTransformerBlock._modulate, qwenimage.py:53-56)."""
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    y = layer_norm(x, eps=eps) * (1 + scale[:, None]) + shift[:, None]
    return y, gate[:, None]


def qwen_block(block, hidden: Array, encoder: Array, temb: Array, cos: Array,
               sin: Array, cfg: QwenImageConfig) -> Tuple[Array, Array]:
    """(ref: QwenImageTransformerBlock.forward, qwenimage.py:58-124)"""
    img_mod = qlinear_apply(block["img_mod"], jax.nn.silu(temb))
    txt_mod = qlinear_apply(block["txt_mod"], jax.nn.silu(temb))
    img_mod1, img_mod2 = jnp.split(img_mod, 2, axis=-1)
    txt_mod1, txt_mod2 = jnp.split(txt_mod, 2, axis=-1)

    img_m, img_gate1 = _modulate(hidden, img_mod1)
    txt_m, txt_gate1 = _modulate(encoder, txt_mod1)

    img_attn, txt_attn = qwen_attention_apply(
        block["attn"], img_m, txt_m,
        heads=cfg.num_attention_heads, head_dim=cfg.attention_head_dim,
        rope_cos=cos, rope_sin=sin,
    )
    hidden = hidden + img_gate1 * img_attn
    encoder = encoder + txt_gate1 * txt_attn

    img_m2, img_gate2 = _modulate(hidden, img_mod2)
    hidden = hidden + img_gate2 * feedforward_apply(block["img_mlp"], img_m2, "gelu-approximate")
    txt_m2, txt_gate2 = _modulate(encoder, txt_mod2)
    encoder = encoder + txt_gate2 * feedforward_apply(block["txt_mlp"], txt_m2, "gelu-approximate")
    return hidden, encoder


def qwen_run_blocks(params, cfg: QwenImageConfig, hidden, encoder, temb, cos, sin,
                    start_block: int = 0):
    """Homogeneous 60-block stack. With an active pipeline-parallel mesh
    (parallel/pp_state) the scan becomes the GPipe schedule over the pp
    axis — Qwen-Image is the weights-don't-fit case PP exists for (13.6 GB
    int8 > one 16 GB chip). Cache probes (start_block > 0) stay sequential
    (they consume a leading prefix, which stages can't hold evenly)."""
    from fastdm_tpu.parallel import pp_state

    blocks = params["blocks"]
    ppm = pp_state.get_pp_mesh()
    if ppm is not None and start_block == 0:
        pp = ppm.shape[pp_state.get_pp_axis()]
        n = jax.tree_util.tree_leaves(blocks)[0].shape[0]
        if pp > 1 and n % pp == 0:
            return _qwen_run_blocks_pp(blocks, cfg, hidden, encoder, temb,
                                       cos, sin, ppm)
    from fastdm_tpu.models.stack import scan_suffix

    def body(carry, block):
        h, e = carry
        h, e = qwen_block(block, h, e, temb, cos, sin, cfg)
        return (h, e), None

    (hidden, encoder), _ = scan_suffix(body, (hidden, encoder), blocks,
                                       start_block)
    return hidden


def _qwen_run_blocks_pp(blocks, cfg: QwenImageConfig, hidden, encoder, temb,
                        cos, sin, mesh):
    """GPipe over the qwen dual-stream stack: batch dim -> microbatch
    stream; temb is per-sample and rides in the microbatch state."""
    from fastdm_tpu.parallel import pp_state
    from fastdm_tpu.parallel.pipeline import gpipe_run_blocks

    axis = pp_state.get_pp_axis()
    mb = (hidden[:, None], encoder[:, None], temb[:, None])

    def block_fn(block, state):
        h, e, t = state
        h, e = qwen_block(block, h, e, t, cos, sin, cfg)
        return (h, e, t)

    h_mb, _, _ = gpipe_run_blocks(block_fn, blocks, mb, mesh, axis)
    return h_mb[:, 0]


def qwen_forward(
    params,
    cfg: QwenImageConfig,
    hidden_states: Array,          # (B, S_img, in_channels) packed latents
    encoder_hidden_states: Array,  # (B, S_txt, joint_attention_dim)
    timestep: Array,               # (B,) in [0, 1] (sigma)
    rope_cos: Array,               # (S_txt + S_img, head_dim/2)
    rope_sin: Array,
) -> Array:
    """(ref: QwenImageTransformer2DModelCore.forward, qwenimage.py:241-343)"""
    hidden = qlinear_apply(params["img_in"], hidden_states)
    encoder = rms_norm(encoder_hidden_states, params["txt_norm"], 1e-6)
    encoder = qlinear_apply(params["txt_in"], encoder)
    # Qwen sinusoid uses scale=1000 on the raw [0,1] timestep
    t_proj = get_timestep_embedding(
        timestep.astype(jnp.float32), 256, flip_sin_to_cos=True,
        downscale_freq_shift=0.0, scale=1000.0,
    )
    temb = timestep_embedding_apply(
        params["time_text_embed"]["timestep_embedder"], t_proj.astype(hidden.dtype)
    )

    hidden = qwen_run_blocks(params, cfg, hidden, encoder, temb, rope_cos, rope_sin)

    hidden = ada_layer_norm_continuous(params["norm_out"], hidden, temb)
    return qlinear_apply(params["proj_out"], hidden)


def qwen_forward_cached(
    params, cfg: QwenImageConfig, cache_cfg, cache_state, step: Array,
    total_steps: int, hidden_states: Array, encoder_hidden_states: Array,
    timestep: Array, rope_cos: Array, rope_sin: Array,
) -> Tuple[Array, dict]:
    """qwen_forward with a step-skipping cache. TeaCache probes the block-0
    TEXT-stream modulated input (ref: xcaching.py:171-181 qwenimage path)."""
    from fastdm_tpu.caching.config import DiCacheConfig, FBCacheConfig, TeaCacheConfig
    from fastdm_tpu.caching.xcaching import cached_run

    hidden = qlinear_apply(params["img_in"], hidden_states)
    encoder = rms_norm(encoder_hidden_states, params["txt_norm"], 1e-6)
    encoder = qlinear_apply(params["txt_in"], encoder)
    t_proj = get_timestep_embedding(
        timestep.astype(jnp.float32), 256, flip_sin_to_cos=True,
        downscale_freq_shift=0.0, scale=1000.0,
    )
    temb = timestep_embedding_apply(
        params["time_text_embed"]["timestep_embedder"], t_proj.astype(hidden.dtype)
    )
    blk0 = jax.tree.map(lambda x: x[0], params["blocks"])

    if isinstance(cache_cfg, TeaCacheConfig):

        def probe_fn(hh, ee):
            txt_mod = qlinear_apply(blk0["txt_mod"], jax.nn.silu(temb))
            txt_mod1, _ = jnp.split(txt_mod, 2, axis=-1)
            probe, _ = _modulate(ee, txt_mod1)
            return probe, (hh, ee)

        def rest_fn(hh, ee):
            return qwen_run_blocks(params, cfg, hh, ee, temb, rope_cos, rope_sin)

    elif isinstance(cache_cfg, (FBCacheConfig, DiCacheConfig)):
        depth = 1 if isinstance(cache_cfg, FBCacheConfig) else cache_cfg.probe_depth

        def probe_fn(hh, ee):
            for i in range(depth):
                blk = jax.tree.map(lambda x: x[i], params["blocks"])
                hh, ee = qwen_block(blk, hh, ee, temb, rope_cos, rope_sin, cfg)
            return hh, (hh, ee)

        def rest_fn(hh, ee):
            return qwen_run_blocks(params, cfg, hh, ee, temb, rope_cos, rope_sin,
                                   start_block=depth)

    else:
        raise ValueError(f"unsupported cache config {type(cache_cfg)}")

    hidden, new_state = cached_run(
        cache_cfg, cache_state, step, total_steps, hidden, encoder, probe_fn, rest_fn
    )
    hidden = ada_layer_norm_continuous(params["norm_out"], hidden, temb)
    return qlinear_apply(params["proj_out"], hidden), new_state


# ---------------------------------------------------------------- rope


def qwen_rope_cos_sin(
    cfg: QwenImageConfig, frame: int, height: int, width: int, txt_len: int,
    extra_shapes: Tuple[Tuple[int, int, int], ...] = (),
) -> Tuple[Array, Array]:
    """Host-side (cos, sin) for the joint [txt, img] sequence
    (ref: QwenEmbedRope.forward/_compute_video_freqs, embeddings.py:800-857).

    scale_rope centers H/W positions around zero: rows get positions
    [-(h - h//2), ..., -1, 0, ..., h//2 - 1]; text starts at max(h//2, w//2).

    extra_shapes: additional (frame, h, w) image entries appended after the
    main one (qwen-image-edit source images); entry i's frame axis starts at
    position i (ref: freqs_pos[0][idx : idx + frame], embeddings.py:847).
    """
    theta = 10000.0
    a0, a1, a2 = cfg.axes_dims_rope

    def angles(dim, pos):
        inv = 1.0 / theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
        return np.outer(np.asarray(pos, np.float64), inv)

    imgs, max_vid = [], 0
    for idx, (f, h, w) in enumerate([(frame, height, width), *extra_shapes]):
        f_pos = np.arange(idx, idx + f)
        if cfg.scale_rope:
            h_pos = np.concatenate([np.arange(-(h - h // 2), 0), np.arange(h // 2)])
            w_pos = np.concatenate([np.arange(-(w - w // 2), 0), np.arange(w // 2)])
            max_vid = max(h // 2, w // 2, max_vid)
        else:
            h_pos, w_pos = np.arange(h), np.arange(w)
            max_vid = max(h, w, max_vid)
        af = angles(a0, f_pos)[:, None, None, :] * np.ones((1, h, w, 1))
        ah = angles(a1, h_pos)[None, :, None, :] * np.ones((f, 1, w, 1))
        aw = angles(a2, w_pos)[None, None, :, :] * np.ones((f, h, 1, 1))
        imgs.append(np.concatenate([af, ah, aw], axis=-1).reshape(f * h * w, -1))
    img = np.concatenate(imgs, axis=0)

    txt_pos = np.arange(max_vid, max_vid + txt_len)
    txt = np.concatenate([angles(a0, txt_pos), angles(a1, txt_pos), angles(a2, txt_pos)], axis=-1)

    a = np.concatenate([txt, img], axis=0)  # text first (ref: qwenimage.py:314)
    return jnp.asarray(np.cos(a), jnp.float32), jnp.asarray(np.sin(a), jnp.float32)
