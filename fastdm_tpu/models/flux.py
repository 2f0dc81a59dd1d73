"""FLUX.1 (dev/Krea/Kontext) transformer core (ref: fastdm/model/flux.py).

TPU-native design notes:
  * The 19 dual-stream (MMDiT) and 38 single-stream blocks are each stored as
    ONE stacked pytree (leading layer axis) and executed with `lax.scan` —
    one compiled block body per stack instead of 57 inlined copies (compile
    time, HBM-friendly weight streaming, and a natural pipeline-parallel cut).
  * RoPE cos/sin are computed host-side once per resolution (float64, ref
    flux.py:426-428 precision) and passed into the jitted forward.
  * ControlNet residuals arrive as a stacked (L, B, S, D) tensor (zeros when
    unused) so the scan body is branch-free.
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
    flux_rope_cos_sin,
)
from fastdm_tpu.layers.feedforward import feedforward_apply
from fastdm_tpu.layers.normalization import (
    ada_layer_norm_continuous,
    ada_layer_norm_zero,
    ada_layer_norm_zero_single,
    layer_norm,
)
from fastdm_tpu.layers.qlinear import qlinear_apply, qlinear_random
from fastdm_tpu.models.loader import TensorSource, stack_blocks

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    patch_size: int = 1
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = True
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    mlp_ratio: float = 4.0
    quant: Optional[str] = "int8"  # None/"bf16" | "int8" | "fp8"
    # Also quantize the AdaLN modulation projections (2.2B extra params in
    # bf16 otherwise). Reference precedent: Qwen quantizes mod projections on
    # <24GB GPUs (ref: fastdm/model/qwenimage.py:166-167); required to fit
    # FLUX on a 16GB v5e chip.
    quant_mods: bool = False

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def mlp_hidden_dim(self) -> int:
        return int(self.inner_dim * self.mlp_ratio)


# ---------------------------------------------------------------- params


def _dual_block_random(key: Array, cfg: FluxConfig) -> Dict:
    d, q = cfg.inner_dim, cfg.quant
    qm = q if cfg.quant_mods else None
    ks = jax.random.split(key, 12)
    hd = cfg.attention_head_dim
    ones = jnp.ones((hd,), jnp.bfloat16)
    return {
        "norm1": {"linear": qlinear_random(ks[0], d, 6 * d, quant=qm)},
        "norm1_context": {"linear": qlinear_random(ks[1], d, 6 * d, quant=qm)},
        "attn": {
            "qkv": qlinear_random(ks[2], d, 3 * d, quant=q),
            "add_qkv": qlinear_random(ks[3], d, 3 * d, quant=q),
            "norm_q": ones, "norm_k": ones,
            "norm_added_q": ones, "norm_added_k": ones,
            "to_out": qlinear_random(ks[4], d, d, quant=q),
            "to_add_out": qlinear_random(ks[5], d, d, quant=q),
        },
        "ff": {
            "proj": qlinear_random(ks[6], d, cfg.mlp_hidden_dim, quant=q),
            "out": qlinear_random(ks[7], cfg.mlp_hidden_dim, d, quant=q),
        },
        "ff_context": {
            "proj": qlinear_random(ks[8], d, cfg.mlp_hidden_dim, quant=q),
            "out": qlinear_random(ks[9], cfg.mlp_hidden_dim, d, quant=q),
        },
    }


def _single_block_random(key: Array, cfg: FluxConfig) -> Dict:
    d, q = cfg.inner_dim, cfg.quant
    qm = q if cfg.quant_mods else None
    ks = jax.random.split(key, 4)
    hd = cfg.attention_head_dim
    ones = jnp.ones((hd,), jnp.bfloat16)
    return {
        "norm": {"linear": qlinear_random(ks[0], d, 3 * d, quant=qm)},
        # qkv and mlp_in share the SAME normalized input (ref: flux.py:59-61
        # computes them as two separate GEMMs) — fused into one wider
        # column-parallel matmul so the activation is quantized once and the
        # A tile is read once per step (quantize-into-matmul fusion, the TPU
        # form: share the quantized operand instead of a CUTLASS prologue).
        "qkv_mlp": qlinear_random(ks[1], d, 3 * d + cfg.mlp_hidden_dim, quant=q),
        "proj_out": qlinear_random(ks[2], d + cfg.mlp_hidden_dim, d, quant=q),
        "attn": {
            "norm_q": ones, "norm_k": ones,
        },
    }


def flux_init_random(key: Array, cfg: FluxConfig) -> Dict:
    """Random-weight param tree (profiling / benchmarking without checkpoints,
    ref role: examples/profiling/flux_profiling.py)."""
    d, q = cfg.inner_dim, cfg.quant
    keys = jax.random.split(key, 10 + cfg.num_layers + cfg.num_single_layers)
    tte = {
        "timestep_embedder": {
            "linear1": qlinear_random(keys[0], 256, d, quant=None),
            "linear2": qlinear_random(keys[1], d, d, quant=None),
        },
        "text_embedder": {
            "linear1": qlinear_random(keys[2], cfg.pooled_projection_dim, d, quant=None),
            "linear2": qlinear_random(keys[3], d, d, quant=None),
        },
    }
    if cfg.guidance_embeds:
        tte["guidance_embedder"] = {
            "linear1": qlinear_random(keys[4], 256, d, quant=None),
            "linear2": qlinear_random(keys[5], d, d, quant=None),
        }
    dual = [_dual_block_random(keys[10 + i], cfg) for i in range(cfg.num_layers)]
    single = [
        _single_block_random(keys[10 + cfg.num_layers + i], cfg)
        for i in range(cfg.num_single_layers)
    ]
    return {
        "x_embedder": qlinear_random(keys[6], cfg.in_channels, d, quant=None),
        "context_embedder": qlinear_random(keys[7], cfg.joint_attention_dim, d, quant=None),
        "time_text_embed": tte,
        "dual_blocks": stack_blocks(dual) if dual else None,
        "single_blocks": stack_blocks(single) if single else None,
        "norm_out": {"linear": qlinear_random(keys[8], d, 2 * d, quant=None)},
        "proj_out": qlinear_random(
            keys[9], d, cfg.patch_size**2 * cfg.out_channels, quant=None
        ),
    }


def flux_load(src: TensorSource, cfg: FluxConfig) -> Dict:
    """Load a diffusers FLUX transformer checkpoint
    (name map mirrors ref: fastdm/model/flux.py:274-332)."""
    q = cfg.quant
    qm = q if cfg.quant_mods else None
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
    if cfg.guidance_embeds:
        tte["guidance_embedder"] = {
            "linear1": src.linear("time_text_embed.guidance_embedder.linear_1", None),
            "linear2": src.linear("time_text_embed.guidance_embedder.linear_2", None),
        }

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
                    [f"{p}.attn.add_q_proj", f"{p}.attn.add_k_proj", f"{p}.attn.add_v_proj"], q
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

    single = []
    for i in range(cfg.num_single_layers):
        p = f"single_transformer_blocks.{i}"
        single.append({
            "norm": {"linear": src.linear(f"{p}.norm.linear", qm)},
            # q|k|v|mlp_in concatenated along N (see _single_block_random)
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

    params = {
        "x_embedder": src.linear("x_embedder", None),
        "context_embedder": src.linear("context_embedder", None),
        "time_text_embed": tte,
        "dual_blocks": stack_blocks(dual) if dual else None,
        "single_blocks": stack_blocks(single) if single else None,
        "norm_out": {"linear": src.linear("norm_out.linear", None)},
        "proj_out": src.linear("proj_out", None),
    }
    src.assert_consumed()
    return params


# ---------------------------------------------------------------- forward


def flux_dual_block(
    block, hidden: Array, encoder: Array, temb: Array, cos: Array, sin: Array,
    cfg: FluxConfig,
) -> Tuple[Array, Array]:
    """(ref: FluxTransformerBlock.forward, flux.py:130-178)"""
    h_norm, gate_msa, shift_mlp, scale_mlp, gate_mlp = ada_layer_norm_zero(
        block["norm1"], hidden, temb
    )
    e_norm, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = ada_layer_norm_zero(
        block["norm1_context"], encoder, temb
    )
    attn_out, ctx_attn_out = attention_apply(
        block["attn"], h_norm, e_norm,
        heads=cfg.num_attention_heads, head_dim=cfg.attention_head_dim,
        rope_cos=cos, rope_sin=sin, context_pre_only=False,
    )
    hidden = hidden + gate_msa[:, None] * attn_out
    h2 = layer_norm(hidden) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    hidden = hidden + gate_mlp[:, None] * feedforward_apply(
        block["ff"], h2, "gelu-approximate"
    )
    encoder = encoder + c_gate_msa[:, None] * ctx_attn_out
    e2 = layer_norm(encoder) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
    encoder = encoder + c_gate_mlp[:, None] * feedforward_apply(
        block["ff_context"], e2, "gelu-approximate"
    )
    return hidden, encoder


def flux_single_block(
    block, hidden: Array, temb: Array, cos: Array, sin: Array, cfg: FluxConfig
) -> Array:
    """(ref: FluxSingleTransformerBlock.forward, flux.py:52-76).
    Note: the MLP gate is exact (erf) GELU, matching the reference (flux.py:61)."""
    residual = hidden
    h_norm, gate = ada_layer_norm_zero_single(block["norm"], hidden, temb)
    # One fused matmul for q|k|v|mlp_in: h_norm is quantized once and its
    # tiles stream through the MXU once for all four projections.
    fused = qlinear_apply(block["qkv_mlp"], h_norm)
    qkv = fused[..., : 3 * cfg.inner_dim]
    mlp = jax.nn.gelu(fused[..., 3 * cfg.inner_dim :], approximate=False)
    attn_out = attention_apply(
        block["attn"], h_norm, None,
        heads=cfg.num_attention_heads, head_dim=cfg.attention_head_dim,
        rope_cos=cos, rope_sin=sin, pre_only=True, qkv_override=qkv,
    )
    h = jnp.concatenate([attn_out, mlp], axis=-1)
    return residual + gate[:, None] * qlinear_apply(block["proj_out"], h)


def _scan_dual(
    blocks, cfg: FluxConfig, hidden: Array, encoder: Array, temb: Array,
    cos: Array, sin: Array, controlnet_block_samples: Optional[Array],
    start: int = 0, stop: int = None,
) -> Tuple[Array, Array]:
    from fastdm_tpu.models.stack import scan_suffix

    def body(carry, xs):
        h, e = carry
        if controlnet_block_samples is not None:
            block, res = xs
        else:
            block, res = xs, None
        h, e = flux_dual_block(block, h, e, temb, cos, sin, cfg)
        if res is not None:
            h = h + res
        return (h, e), None

    xs = (blocks, controlnet_block_samples) if controlnet_block_samples is not None else blocks
    (hidden, encoder), _ = scan_suffix(body, (hidden, encoder), xs, start,
                                       stop)
    return hidden, encoder


def _scan_single(
    blocks, cfg: FluxConfig, joint: Array, ctx_len: int, temb: Array,
    cos: Array, sin: Array, controlnet_single_block_samples: Optional[Array],
) -> Array:
    def body(carry, xs):
        if controlnet_single_block_samples is not None:
            block, res = xs
        else:
            block, res = xs, None
        h = flux_single_block(block, carry, temb, cos, sin, cfg)
        if res is not None:
            h = h.at[:, ctx_len:].add(res)
        return h, None

    xs = (
        (blocks, controlnet_single_block_samples)
        if controlnet_single_block_samples is not None
        else blocks
    )
    joint, _ = jax.lax.scan(body, joint, xs)
    return joint


def _tree_slice(tree, sl):
    return jax.tree.map(lambda x: x[sl], tree)


def flux_run_blocks(
    params, cfg: FluxConfig, hidden: Array, encoder: Array, temb: Array,
    cos: Array, sin: Array,
    controlnet_block_samples: Optional[Array] = None,
    controlnet_single_block_samples: Optional[Array] = None,
    start_dual: int = 0,
) -> Array:
    """Scan the dual then single block stacks; returns final img-stream hidden.

    controlnet_*: stacked (num_layers, B, S_img, D) residuals or None
    (ref residual injection: flux.py:455-483). start_dual skips the first N
    dual blocks (cache probes already ran them).

    When a pipeline-parallel mesh is active (parallel/pp_state), the full
    uncached stack runs through the GPipe schedule instead — see
    _flux_run_blocks_pp for the engagement conditions.
    """
    from fastdm_tpu.parallel import pp_state

    ppm = pp_state.get_pp_mesh()
    if ppm is not None and _pp_applicable(
        ppm, params, start_dual, controlnet_block_samples,
        controlnet_single_block_samples,
    ):
        return _flux_run_blocks_pp(params, cfg, hidden, encoder, temb, cos, sin, ppm)

    dual = params["dual_blocks"]
    cn = controlnet_block_samples
    hidden, encoder = _scan_dual(dual, cfg, hidden, encoder, temb, cos, sin,
                                 cn, start=start_dual)
    ctx_len = encoder.shape[1]
    joint = jnp.concatenate([encoder, hidden], axis=1)
    joint = _scan_single(
        params["single_blocks"], cfg, joint, ctx_len, temb, cos, sin,
        controlnet_single_block_samples,
    )
    return joint[:, ctx_len:]


def _pp_applicable(mesh, params, start_dual, cn, cns) -> bool:
    """GPipe engages only on the FULL uncached stack run (TeaCache's rest_fn
    qualifies; FBCache/DiCache probes consume leading blocks -> start_dual>0),
    without per-layer ControlNet residuals (their batch dim is per-microbatch,
    which the layer-stacked param feed can't carry), and when pp divides both
    stack depths (stages hold equal consecutive slices)."""
    from fastdm_tpu.parallel import pp_state

    pp = mesh.shape[pp_state.get_pp_axis()]
    if params.get("dual_blocks") is None or params.get("single_blocks") is None:
        return False  # zero-depth stacks (tiny/ablation configs) stay sequential
    n_dual = jax.tree_util.tree_leaves(params["dual_blocks"])[0].shape[0]
    n_single = jax.tree_util.tree_leaves(params["single_blocks"])[0].shape[0]
    return (
        start_dual == 0 and cn is None and cns is None
        and pp > 1 and n_dual % pp == 0 and n_single % pp == 0
    )


def _flux_run_blocks_pp(
    params, cfg: FluxConfig, hidden: Array, encoder: Array, temb: Array,
    cos: Array, sin: Array, mesh,
) -> Array:
    """Pipeline-parallel block run: the batch dim becomes the GPipe
    microbatch stream (CFG pairs / server batches), dual then single stacks
    each pipeline over the pp axis with stage hops on ICI (SURVEY.md §7
    step 9; schedule: parallel/pipeline.py). temb is per-sample, so it rides
    in the microbatch state (unchanged through every stage)."""
    from fastdm_tpu.parallel import pp_state
    from fastdm_tpu.parallel.pipeline import gpipe_run_blocks

    axis = pp_state.get_pp_axis()
    # (B, ...) -> (M=B, 1, ...) microbatches
    mb = (hidden[:, None], encoder[:, None], temb[:, None])

    def dual_fn(block, state):
        h, e, t = state
        h, e = flux_dual_block(block, h, e, t, cos, sin, cfg)
        return (h, e, t)

    h_mb, e_mb, t_mb = gpipe_run_blocks(
        dual_fn, params["dual_blocks"], mb, mesh, axis
    )
    ctx_len = encoder.shape[1]
    joint_mb = jnp.concatenate([e_mb, h_mb], axis=2)

    def single_fn(block, state):
        j, t = state
        return flux_single_block(block, j, t, cos, sin, cfg), t

    j_mb, _ = gpipe_run_blocks(
        single_fn, params["single_blocks"], (joint_mb, t_mb), mesh, axis
    )
    return j_mb[:, 0, ctx_len:]


def _flux_embed(params, cfg, hidden_states, encoder_hidden_states,
                pooled_projections, timestep, guidance):
    """Shared forward preamble: x/context embedders + combined time-text-
    guidance embedding (one implementation for cached and uncached)."""
    if cfg.guidance_embeds and guidance is None:
        # a guidance-distilled model run without guidance is silently wrong
        # conditioning (the loaded guidance_embedder would be skipped)
        raise ValueError(
            "cfg.guidance_embeds=True (FLUX-dev style) requires guidance=")
    hidden = qlinear_apply(params["x_embedder"], hidden_states)
    temb = combined_timestep_text_proj_apply(
        params["time_text_embed"],
        timestep.astype(jnp.float32) * 1000.0,
        pooled_projections,
        (guidance.astype(jnp.float32) * 1000.0
         if (cfg.guidance_embeds and guidance is not None) else None),
    )
    encoder = qlinear_apply(params["context_embedder"], encoder_hidden_states)
    return hidden, temb, encoder


def flux_forward(
    params,
    cfg: FluxConfig,
    hidden_states: Array,          # (B, S_img, in_channels) packed latents
    encoder_hidden_states: Array,  # (B, S_txt, joint_attention_dim)
    pooled_projections: Array,     # (B, pooled_projection_dim)
    timestep: Array,               # (B,) in [0, 1]
    rope_cos: Array,               # (S_txt+S_img, head_dim/2)
    rope_sin: Array,
    guidance: Optional[Array] = None,  # (B,) guidance scale (guidance-distilled)
    controlnet_block_samples: Optional[Array] = None,
    controlnet_single_block_samples: Optional[Array] = None,
) -> Array:
    """Denoiser forward (ref: FluxTransformer2DModelCore.forward, flux.py:334-494).
    Pure function of (params, inputs); jit over it with cfg static."""
    hidden, temb, encoder = _flux_embed(
        params, cfg, hidden_states, encoder_hidden_states,
        pooled_projections, timestep, guidance,
    )

    hidden = flux_run_blocks(
        params, cfg, hidden, encoder, temb, rope_cos, rope_sin,
        controlnet_block_samples, controlnet_single_block_samples,
    )

    hidden = ada_layer_norm_continuous(params["norm_out"], hidden, temb)
    return qlinear_apply(params["proj_out"], hidden)


def flux_forward_cached(
    params,
    cfg: FluxConfig,
    cache_cfg,
    cache_state,
    step: Array,
    total_steps: int,
    hidden_states: Array,
    encoder_hidden_states: Array,
    pooled_projections: Array,
    timestep: Array,
    rope_cos: Array,
    rope_sin: Array,
    guidance: Optional[Array] = None,
    controlnet_block_samples: Optional[Array] = None,
    controlnet_single_block_samples: Optional[Array] = None,
) -> Tuple[Array, dict]:
    """flux_forward with a step-skipping cache (TeaCache/FBCache/DiCache).

    Returns (output, new_cache_state); designed to sit inside the denoise
    loop's lax.scan with cache_state in the carry (the reference's host-side
    skip logic lives at fastdm/caching/xcaching.py; decision parity documented
    there and in fastdm_tpu/caching/xcaching.py).
    """
    from fastdm_tpu.caching.config import DiCacheConfig, FBCacheConfig, TeaCacheConfig
    from fastdm_tpu.caching.xcaching import cached_run

    hidden, temb, encoder = _flux_embed(
        params, cfg, hidden_states, encoder_hidden_states,
        pooled_projections, timestep, guidance,
    )

    dual = params["dual_blocks"]
    cn, cns = controlnet_block_samples, controlnet_single_block_samples

    if isinstance(cache_cfg, TeaCacheConfig):
        block0_norm1 = _tree_slice(dual, 0)["norm1"]

        def probe_fn(h, e):
            probe, *_ = ada_layer_norm_zero(block0_norm1, h, temb)
            return probe, (h, e)

        def rest_fn(h, e):
            return flux_run_blocks(params, cfg, h, e, temb, rope_cos, rope_sin, cn, cns)

    elif isinstance(cache_cfg, FBCacheConfig):
        block0 = _tree_slice(dual, 0)

        def probe_fn(h, e):
            h1, e1 = flux_dual_block(block0, h, e, temb, rope_cos, rope_sin, cfg)
            if cn is not None:
                h1 = h1 + cn[0]
            return h1, (h1, e1)

        def rest_fn(h, e):
            return flux_run_blocks(
                params, cfg, h, e, temb, rope_cos, rope_sin, cn, cns, start_dual=1
            )

    elif isinstance(cache_cfg, DiCacheConfig):
        depth = cache_cfg.probe_depth

        def probe_fn(h, e):
            h2, e2 = _scan_dual(
                dual, cfg, h, e, temb, rope_cos, rope_sin, cn, stop=depth)
            return h2, (h2, e2)

        def rest_fn(h, e):
            return flux_run_blocks(
                params, cfg, h, e, temb, rope_cos, rope_sin, cn, cns, start_dual=depth
            )

    else:
        raise ValueError(f"unsupported cache config {type(cache_cfg)}")

    hidden, new_state = cached_run(
        cache_cfg, cache_state, step, total_steps, hidden, encoder, probe_fn, rest_fn
    )

    hidden = ada_layer_norm_continuous(params["norm_out"], hidden, temb)
    return qlinear_apply(params["proj_out"], hidden), new_state


# ---------------------------------------------------------------- helpers


def flux_img_ids(height_tokens: int, width_tokens: int) -> np.ndarray:
    """Packed-latent position ids, (H*W, 3) — axis0=0, axis1=row, axis2=col."""
    ids = np.zeros((height_tokens, width_tokens, 3), np.float64)
    ids[..., 1] = np.arange(height_tokens)[:, None]
    ids[..., 2] = np.arange(width_tokens)[None, :]
    return ids.reshape(-1, 3)


def flux_rope_cache(
    cfg: FluxConfig, txt_len: int, height_tokens: int, width_tokens: int,
    ref_tokens_hw: Optional[Tuple[int, int]] = None,
) -> Tuple[Array, Array]:
    """Host-side (cos, sin) for the joint [txt, img(, refs)] sequence
    (ref: flux.py:425-428 — txt ids are all zeros). ref_tokens_hw adds
    Kontext reference-image id block(s): one (h, w) pair or a sequence of
    them; reference i lives on id-plane i+1 (the multi-reference Kontext
    convention)."""
    txt_ids = np.zeros((txt_len, 3), np.float64)
    blocks = [txt_ids, flux_img_ids(height_tokens, width_tokens)]
    if ref_tokens_hw is not None:
        refs = ref_tokens_hw
        if refs and not isinstance(refs[0], (tuple, list)):
            refs = (refs,)  # single (h, w) pair
        for i, (rh, rw) in enumerate(refs):
            ref_ids = flux_img_ids(rh, rw)
            ref_ids[:, 0] = float(i + 1)
            blocks.append(ref_ids)
    ids = np.concatenate(blocks, axis=0)
    return flux_rope_cos_sin(ids, cfg.axes_dims_rope)
