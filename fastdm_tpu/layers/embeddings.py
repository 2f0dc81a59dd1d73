"""Embeddings: timesteps, text projections, RoPE caches
(ref: fastdm/layer/embeddings.py).

RoPE caches are computed host-side in float64 numpy (positions are static per
resolution, so this runs once per generation, outside jit — the f64 precision
matches the reference's flux freqs_dtype=torch.float64).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.layers.qlinear import qlinear_apply

Array = jax.Array


def get_timestep_embedding(
    timesteps: Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> Array:
    """Sinusoidal timestep embedding (ref: embeddings.py:18-68). timesteps (N,)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def timestep_embedding_apply(params, sample: Array) -> Array:
    """Two-layer MLP on the sinusoidal projection (ref: TimestepEmbedding)."""
    x = qlinear_apply(params["linear1"], sample)
    x = jax.nn.silu(x)
    return qlinear_apply(params["linear2"], x)


def pixart_text_projection_apply(params, caption: Array, act_fn: str = "silu") -> Array:
    """(ref: PixArtAlphaTextProjection, embeddings.py:118-147)"""
    x = qlinear_apply(params["linear1"], caption)
    if act_fn == "gelu_tanh":
        x = jax.nn.gelu(x, approximate=True)
    elif act_fn == "silu":
        x = jax.nn.silu(x)
    elif act_fn == "silu_fp32":
        x = jax.nn.silu(x.astype(jnp.float32)).astype(caption.dtype)
    return qlinear_apply(params["linear2"], x)


def combined_timestep_text_proj_apply(
    params, timestep: Array, pooled_projection: Array, guidance: Optional[Array] = None
) -> Array:
    """Timestep (+ optional guidance) sinusoid -> MLP, plus pooled-text MLP
    (ref: CombinedTimestep[Guidance]TextProjEmbeddings, embeddings.py:551-591)."""
    dt = pooled_projection.dtype
    t_proj = get_timestep_embedding(timestep, 256, flip_sin_to_cos=True, downscale_freq_shift=0.0)
    emb = timestep_embedding_apply(params["timestep_embedder"], t_proj.astype(dt))
    if guidance is not None:
        g_proj = get_timestep_embedding(guidance, 256, flip_sin_to_cos=True, downscale_freq_shift=0.0)
        emb = emb + timestep_embedding_apply(params["guidance_embedder"], g_proj.astype(dt))
    pooled = pixart_text_projection_apply(params["text_embedder"], pooled_projection, "silu")
    return emb + pooled


def text_image_projection_apply(
    params, text_embeds: Array, image_embeds: Array,
    num_image_text_embeds: int = 10,
) -> Array:
    """Kandinsky-2.1-style text+image context projection
    (ref: TextImageProjection, embeddings.py:412-438): the image embedding
    expands to `num_image_text_embeds` context tokens which are prepended to
    the projected text tokens."""
    b = text_embeds.shape[0]
    img = qlinear_apply(params["image_embeds"], image_embeds)
    img = img.reshape(b, num_image_text_embeds, -1)
    txt = qlinear_apply(params["text_proj"], text_embeds)
    return jnp.concatenate([img, txt], axis=1)


def attention_pooling_apply(params, x: Array, num_heads: int) -> Array:
    """Single-query attention pooling over a token sequence
    (ref: AttentionPooling, embeddings.py:440-487 — deep-floyd's pooler):
    class token = mean(x) + learned positional embedding; one attention read
    over [cls, x]; returns (B, D)."""
    b, _, d = x.shape
    hd = d // num_heads
    cls = jnp.mean(x, axis=1, keepdims=True) + params["positional_embedding"].astype(x.dtype)
    xa = jnp.concatenate([cls, x], axis=1)

    def heads(t):
        return t.reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)

    q = heads(qlinear_apply(params["q_proj"], cls))
    k = heads(qlinear_apply(params["k_proj"], xa))
    v = heads(qlinear_apply(params["v_proj"], xa))
    # the reference scales q AND k by dim^-1/4 before the product for fp16
    # stability, then softmaxes in fp32 (embeddings.py:478-480)
    scale = 1.0 / math.sqrt(math.sqrt(hd))
    logits = jnp.einsum("bhqc,bhkc->bhqk", q * scale, k * scale)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    a = jnp.einsum("bhqk,bhkc->bhqc", w, v)  # (B, H, 1, hd)
    return a.transpose(0, 2, 1, 3).reshape(b, d)


def text_time_embedding_apply(params, hidden_states: Array, num_heads: int = 64) -> Array:
    """LN -> attention-pool -> proj -> LN (ref: TextTimeEmbedding,
    embeddings.py:489-505); the 'text' addition_embed_type of UNet/ControlNet."""
    from fastdm_tpu.layers.normalization import layer_norm

    h = layer_norm(hidden_states, params["norm1"]["gamma"], params["norm1"]["beta"], 1e-5)
    h = attention_pooling_apply(params["pool"], h, num_heads)
    h = qlinear_apply(params["proj"], h)
    return layer_norm(h, params["norm2"]["gamma"], params["norm2"]["beta"], 1e-5)


def text_image_time_embedding_apply(params, text_embeds: Array, image_embeds: Array) -> Array:
    """(ref: TextImageTimeEmbedding, embeddings.py:507-525); the 'text_image'
    addition_embed_type (Kandinsky 2.1)."""
    from fastdm_tpu.layers.normalization import layer_norm

    txt = qlinear_apply(params["text_proj"], text_embeds)
    txt = layer_norm(txt, params["text_norm"]["gamma"], params["text_norm"]["beta"], 1e-5)
    return txt + qlinear_apply(params["image_proj"], image_embeds)


def rope_1d_freqs(dim: int, pos: np.ndarray, theta: float = 10000.0) -> np.ndarray:
    """(S, dim/2) float64 angles (ref: get_1d_rotary_pos_embed, embeddings.py:160-214)."""
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    return np.outer(np.asarray(pos, np.float64), inv)


def flux_rope_cos_sin(
    ids, axes_dim: Sequence[int], theta: int = 10000
) -> Tuple[Array, Array]:
    """3-axis RoPE cache for FLUX (ref: FluxPosEmbed, embeddings.py:527-549).

    ids: (S, n_axes) position ids. Returns (cos, sin) each (S, sum(axes_dim)/2)
    float32, one entry per rotation pair (interleaved application).
    """
    ids_np = np.asarray(ids, np.float64)
    angles = [rope_1d_freqs(d, ids_np[:, i], theta) for i, d in enumerate(axes_dim)]
    a = np.concatenate(angles, axis=-1)
    return jnp.asarray(np.cos(a), jnp.float32), jnp.asarray(np.sin(a), jnp.float32)


def sincos_pos_embed_2d(embed_dim: int, grid_h: int, grid_w: int, *, base_size=None, interpolation_scale=1.0) -> np.ndarray:
    """2D sin-cos positional embedding (SD3.5 PatchEmbed, ref: embeddings.py:266+)."""
    gh = np.arange(grid_h, dtype=np.float64)
    gw = np.arange(grid_w, dtype=np.float64)
    if base_size is not None:
        gh = gh / (grid_h / base_size) / interpolation_scale
        gw = gw / (grid_w / base_size) / interpolation_scale
    elif interpolation_scale != 1.0:
        raise ValueError(
            "interpolation_scale requires base_size (diffusers applies them "
            "together); without it the scale would be silently dropped"
        )
    grid = np.meshgrid(gw, gh)  # w goes first (diffusers convention)
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_h, grid_w)

    def _1d(dim, positions):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", positions.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)  # (H*W, D)
