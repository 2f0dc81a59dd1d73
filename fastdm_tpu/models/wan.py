"""Wan2.1 / Wan2.2 T2V & I2V transformer core (ref: fastdm/model/wan.py).

TPU design notes:
  * conv3d patchify == reshape + matmul on (C*pt*ph*pw) patch vectors (MXU).
  * fp32 islands preserved: norm1/norm3 + scale_shift modulation and the
    residual adds run in f32 and cast back (ref: wan.py:95-112 float() calls).
  * The 3D RoPE cache (t/h/w split of head_dim, ref: embeddings.py:859-923)
    is computed host-side in float64 as per-pair (cos, sin).
  * Radial sparse attention is a STATIC layer split: the first `dense_layers`
    blocks are one scan (dense attention), the rest another scan whose
    self-attention consumes the radial block mask (ref gating:
    fastdm/layer/transformer.py:509-529). The dense-steps gate is handled by
    the denoise loop running a dense program for the warmup steps.
  * Wan2.2-A14B's two experts (high/low-noise) are two param trees; the
    pipeline switches by timestep (ref: model_entry.py:673-690).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.kernels import (
    gather_fine_attention,
    gather_super_attention,
    gather_sparse_attention,
    qk_norm_rope,
    qk_norm_rope2,
    rms_norm,
    scaled_dot_product_attention,
    sparse_scaled_dot_product_attention,
)
from fastdm_tpu.layers.embeddings import (
    get_timestep_embedding,
    pixart_text_projection_apply,
    rope_1d_freqs,
    timestep_embedding_apply,
)
from fastdm_tpu.layers.feedforward import feedforward_apply
from fastdm_tpu.layers.normalization import fp32_layer_norm
from fastdm_tpu.layers.qlinear import (
    qlinear_apply,
    qlinear_random,
    qlinear_slice_out,
)
from fastdm_tpu.models.loader import TensorSource, stack_blocks

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class WanConfig:
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_attention_heads: int = 40
    attention_head_dim: int = 128
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    ffn_dim: int = 13824
    num_layers: int = 40
    cross_attn_norm: bool = True
    eps: float = 1e-6
    image_dim: Optional[int] = None        # 1280 for I2V
    added_kv_proj_dim: Optional[int] = None  # inner_dim for I2V image-KV branch
    pos_embed_seq_len: Optional[int] = None
    text_len: int = 512                     # fixed text context length
    dense_layers: int = 0                   # first N layers always dense
    # FFN token-chunking (0 = off): lax.scan the FFN over chunks of this many
    # tokens when it divides the sequence — the A14B 75600-token capacity
    # lever (see feedforward_apply); engine enables it for long video
    ffn_chunk_tokens: int = 0
    # split the fused self-attn QKV projection into three column-sliced
    # chunked matmuls (no (S, 3D) buffer, two-operand norm+rope kernel) —
    # pairs with ffn_chunk_tokens for 70k+-token A14B HBM capacity
    split_qkv_proj: bool = False
    # gather-sparse tile size (must match SparseAttn.block_lists coarsening)
    sparse_gather_blocks: Tuple[int, int] = (512, 1024)
    # fine-gather (block_q, group, fine_tokens): compute tiles of group x
    # mask-native fine blocks assembled by manual DMA (sdpa_gather_fine);
    # fine_tokens must equal the sparse config's block_size (engine syncs it)
    sparse_gather_fine_blocks: Tuple[int, int, int] = (512, 32, 64)
    # superblock gather: 3-tuple sparse masks carry SUPERBLOCK tables when
    # this is > 1 (each entry = an aligned run of N fine blocks + validity
    # bitmask — the scattered-DMA bandwidth form, sdpa_gather_super); the
    # group count then comes from sparse_gather_fine_blocks[1] divided by it
    sparse_gather_superblock: int = 1
    per_token_timestep: bool = False        # wan2.2-ti2v (temb per token)
    quant: Optional[str] = "int8"

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


# ---------------------------------------------------------------- params


def _block_random(key: Array, cfg: WanConfig) -> Dict:
    d, q = cfg.inner_dim, cfg.quant
    ks = jax.random.split(key, 12)
    ones = jnp.ones((d,), jnp.bfloat16)  # rms_norm_across_heads: weight dim = H*Dh
    blk = {
        "scale_shift_table": jax.random.normal(ks[0], (6, d), jnp.float32) / d**0.5,
        "attn1": {
            "qkv": qlinear_random(ks[1], d, 3 * d, quant=q),
            "norm_q": ones, "norm_k": ones,
            "to_out": qlinear_random(ks[2], d, d, quant=q),
        },
        "attn2": {
            "q": qlinear_random(ks[3], d, d, quant=q),
            "kv": qlinear_random(ks[4], d, 2 * d, quant=q),
            "norm_q": ones, "norm_k": ones,
            "to_out": qlinear_random(ks[5], d, d, quant=q),
        },
        "ffn": {
            "proj": qlinear_random(ks[6], d, cfg.ffn_dim, quant=q),
            "out": qlinear_random(ks[7], cfg.ffn_dim, d, quant=q),
        },
    }
    if cfg.cross_attn_norm:
        blk["norm2"] = {"gamma": jnp.ones((d,), jnp.float32), "beta": jnp.zeros((d,), jnp.float32)}
    if cfg.added_kv_proj_dim is not None:
        blk["attn2"]["add_k"] = qlinear_random(ks[8], cfg.added_kv_proj_dim, d, quant=q)
        blk["attn2"]["add_v"] = qlinear_random(ks[9], cfg.added_kv_proj_dim, d, quant=q)
        blk["attn2"]["norm_added_k"] = ones
    return blk


def wan_init_random(key: Array, cfg: WanConfig) -> Dict:
    d = cfg.inner_dim
    p = cfg.patch_size
    keys = jax.random.split(key, 10 + cfg.num_layers)
    patch_in = cfg.in_channels * math.prod(p)
    params: Dict = {
        "patch_embedding": qlinear_random(keys[0], patch_in, d, quant=None),
        "condition_embedder": {
            "time_embedder": {
                "linear1": qlinear_random(keys[1], cfg.freq_dim, d, quant=None),
                "linear2": qlinear_random(keys[2], d, d, quant=None),
            },
            "time_proj": qlinear_random(keys[3], d, 6 * d, quant=None),
            "text_embedder": {
                "linear1": qlinear_random(keys[4], cfg.text_dim, d, quant=None),
                "linear2": qlinear_random(keys[5], d, d, quant=None),
            },
        },
        "scale_shift_table": jax.random.normal(keys[6], (2, d), jnp.float32) / d**0.5,
        "proj_out": qlinear_random(keys[7], d, cfg.out_channels * math.prod(p), quant=None),
    }
    if cfg.image_dim is not None:
        ik = jax.random.split(keys[8], 2)
        params["condition_embedder"]["image_embedder"] = {
            "norm1": {"gamma": jnp.ones((cfg.image_dim,), jnp.float32),
                      "beta": jnp.zeros((cfg.image_dim,), jnp.float32)},
            "ff": {"proj": qlinear_random(ik[0], cfg.image_dim, cfg.image_dim, quant=None),
                   "out": qlinear_random(ik[1], cfg.image_dim, d, quant=None)},
            "norm2": {"gamma": jnp.ones((d,), jnp.float32),
                      "beta": jnp.zeros((d,), jnp.float32)},
        }
    blocks = [_block_random(keys[10 + i], cfg) for i in range(cfg.num_layers)]
    nd = cfg.dense_layers
    params["dense_blocks"] = stack_blocks(blocks[:nd]) if nd else None
    params["blocks"] = stack_blocks(blocks[nd:]) if nd < cfg.num_layers else None
    return params


def wan_load(src: TensorSource, cfg: WanConfig) -> Dict:
    """Load a diffusers Wan checkpoint (name map ref: wan.py:224-281)."""
    q = cfg.quant
    conv_w = np.asarray(src.tensor("patch_embedding.weight", jnp.float32))  # (D,C,pt,ph,pw)
    d_out = conv_w.shape[0]
    # patch vector order (C, pt, ph, pw) must match the patchify reshape below
    patch_w = jnp.asarray(conv_w.reshape(d_out, -1).T, jnp.bfloat16)
    params: Dict = {
        "patch_embedding": {"w": patch_w, "bias": src.tensor("patch_embedding.bias")},
        "condition_embedder": {
            "time_embedder": {
                "linear1": src.linear("condition_embedder.time_embedder.linear_1", None),
                "linear2": src.linear("condition_embedder.time_embedder.linear_2", None),
            },
            "time_proj": src.linear("condition_embedder.time_proj", None),
            "text_embedder": {
                "linear1": src.linear("condition_embedder.text_embedder.linear_1", None),
                "linear2": src.linear("condition_embedder.text_embedder.linear_2", None),
            },
        },
        "scale_shift_table": src.tensor("scale_shift_table", jnp.float32).reshape(2, -1),
        "proj_out": src.linear("proj_out", None),
    }
    if "condition_embedder.image_embedder.norm1.weight" in src:
        ie = "condition_embedder.image_embedder"
        params["condition_embedder"]["image_embedder"] = {
            "norm1": {"gamma": src.tensor(f"{ie}.norm1.weight", jnp.float32),
                      "beta": src.tensor(f"{ie}.norm1.bias", jnp.float32)},
            "ff": {"proj": src.linear(f"{ie}.ff.net.0.proj", None),
                   "out": src.linear(f"{ie}.ff.net.2", None)},
            "norm2": {"gamma": src.tensor(f"{ie}.norm2.weight", jnp.float32),
                      "beta": src.tensor(f"{ie}.norm2.bias", jnp.float32)},
        }
        if f"{ie}.pos_embed" in src:
            params["condition_embedder"]["image_embedder"]["pos_embed"] = src.tensor(f"{ie}.pos_embed")

    blocks = []
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        blk = {
            "scale_shift_table": src.tensor(f"{p}.scale_shift_table", jnp.float32).reshape(6, -1),
            "attn1": {
                "qkv": src.fused_linear([f"{p}.attn1.to_q", f"{p}.attn1.to_k", f"{p}.attn1.to_v"], q),
                "norm_q": src.tensor(f"{p}.attn1.norm_q.weight"),
                "norm_k": src.tensor(f"{p}.attn1.norm_k.weight"),
                "to_out": src.linear(f"{p}.attn1.to_out.0", q),
            },
            "attn2": {
                "q": src.linear(f"{p}.attn2.to_q", q),
                "kv": src.fused_linear([f"{p}.attn2.to_k", f"{p}.attn2.to_v"], q),
                "norm_q": src.tensor(f"{p}.attn2.norm_q.weight"),
                "norm_k": src.tensor(f"{p}.attn2.norm_k.weight"),
                "to_out": src.linear(f"{p}.attn2.to_out.0", q),
            },
            "ffn": {
                "proj": src.linear(f"{p}.ffn.net.0.proj", q),
                "out": src.linear(f"{p}.ffn.net.2", q),
            },
        }
        if cfg.cross_attn_norm:
            blk["norm2"] = {"gamma": src.tensor(f"{p}.norm2.weight", jnp.float32),
                            "beta": src.tensor(f"{p}.norm2.bias", jnp.float32)}
        if f"{p}.attn2.add_k_proj.weight" in src:
            blk["attn2"]["add_k"] = src.linear(f"{p}.attn2.add_k_proj", q)
            blk["attn2"]["add_v"] = src.linear(f"{p}.attn2.add_v_proj", q)
            blk["attn2"]["norm_added_k"] = src.tensor(f"{p}.attn2.norm_added_k.weight")
        blocks.append(blk)
    nd = cfg.dense_layers
    params["dense_blocks"] = stack_blocks(blocks[:nd]) if nd else None
    params["blocks"] = stack_blocks(blocks[nd:]) if nd < cfg.num_layers else None
    src.assert_consumed()
    return params


# ---------------------------------------------------------------- forward


def _wan_self_attention(attn, x: Array, cos: Array, sin: Array, cfg: WanConfig,
                        sparse_mask: Optional[Array]) -> Array:
    """(ref: WanAttention.forward self-attn path, transformer.py:485-529)"""
    d = cfg.inner_dim
    if cfg.split_qkv_proj:
        # Memory mode for 70k+-token video: three column-sliced chunked
        # projections + the two-operand norm+rope kernel, so no (S, 3D)
        # buffer ever exists. The fused path's qkv output + its epilogue
        # temps (2.16 + 4.3 GiB at A14B 720p/81f) were the HBM high-water
        # of the cached branch program (doc/A14B_E2E_r4.log).
        ct = cfg.ffn_chunk_tokens
        qp = qlinear_slice_out(attn["qkv"], 0, d)
        kp = qlinear_slice_out(attn["qkv"], d, 2 * d)
        vp = qlinear_slice_out(attn["qkv"], 2 * d, 3 * d)
        s = x.shape[1]
        if ct and s > ct and s % ct == 0:
            # per-chunk projection + norm + rope, unrolled: raw q/k exist
            # only at chunk size; the concat writes final q/k/v directly
            qs, ks, vs = [], [], []
            for i in range(0, s, ct):
                xc = x[:, i : i + ct]
                qc = qlinear_apply(qp, xc)
                kc = qlinear_apply(kp, xc)
                vs.append(qlinear_apply(vp, xc))
                qc, kc = qk_norm_rope2(
                    qc, kc, attn["norm_q"], attn["norm_k"],
                    cfg.attention_head_dim, cos[i : i + ct], sin[i : i + ct],
                    is_neox=False, eps=cfg.eps)
                qs.append(qc)
                ks.append(kc)
            q = jnp.concatenate(qs, axis=1)
            k = jnp.concatenate(ks, axis=1)
            v = jnp.concatenate(vs, axis=1)
        else:
            q_raw = qlinear_apply(qp, x)
            k_raw = qlinear_apply(kp, x)
            v = qlinear_apply(vp, x)
            q, k = qk_norm_rope2(q_raw, k_raw, attn["norm_q"], attn["norm_k"],
                                 cfg.attention_head_dim, cos, sin,
                                 is_neox=False, eps=cfg.eps)
        return _wan_self_attention_core(attn, x, q, k, v, cfg, sparse_mask)
    qkv = qlinear_apply(attn["qkv"], x)
    # fused norm-q + norm-k + rope (one VMEM pass on TPU; the composed form
    # materializes f32 q/k at the rope fusion boundary — 2x 1.44 GiB at
    # 720p/81f, the 2026-08-20 A14B compile-OOM)
    q, k = qk_norm_rope(qkv, attn["norm_q"], attn["norm_k"],
                        cfg.attention_head_dim, cos, sin, is_neox=False,
                        eps=cfg.eps, inner_dim=d)
    v = qkv[..., 2 * d :]
    return _wan_self_attention_core(attn, x, q, k, v, cfg, sparse_mask)


def _wan_self_attention_core(attn, x: Array, q: Array, k: Array, v: Array,
                             cfg: WanConfig,
                             sparse_mask: Optional[Array]) -> Array:
    h, hd = cfg.num_attention_heads, cfg.attention_head_dim
    if sparse_mask is not None:
        if isinstance(sparse_mask, (tuple, list)) and len(sparse_mask) == 3:
            # fine-gather form: (indices, valid, counts) at the mask's native
            # fine granularity — compute tiles assembled from compacted
            # ACTIVE fine blocks, so MXU work ~= fine mask density. With
            # cfg.sparse_gather_superblock > 1 the same tuple carries
            # SUPERBLOCK tables (runs of consecutive fine blocks + validity
            # bitmask): 4x larger scattered DMAs, exact sub-block masking.
            idx, val, cnt = sparse_mask
            bq, grp, fine = cfg.sparse_gather_fine_blocks
            sb = cfg.sparse_gather_superblock
            if sb > 1:
                out = gather_super_attention(
                    q, k, v, idx, val, cnt, h, h, hd,
                    scale=hd**-0.5, block_q=bq, group=max(1, grp // sb),
                    fine=fine, superblock=sb,
                )
            else:
                out = gather_fine_attention(
                    q, k, v, idx, val, cnt, h, h, hd,
                    scale=hd**-0.5, block_q=bq, group=grp, fine=fine,
                )
        elif isinstance(sparse_mask, (tuple, list)):
            # gather form: (block_indices (nq, max_nb), counts (nq, 1)) —
            # masked KV blocks cost neither DMA nor compute (pallas); the
            # jnp backend reconstructs the dense mask as the oracle
            idx, cnt = sparse_mask
            bq, bk = cfg.sparse_gather_blocks
            out = gather_sparse_attention(
                q, k, v, idx, cnt, h, h, hd,
                scale=hd**-0.5, block_q=bq, block_k=bk,
            )
        else:
            out = sparse_scaled_dot_product_attention(
                q, k, v, h, h, hd, False, hd**-0.5,
                sparse_mask=sparse_mask, block_q=128, block_k=128,
            )
    else:
        out = scaled_dot_product_attention(q, k, v, h, h, hd, False, hd**-0.5)
    return qlinear_apply(attn["to_out"], out.astype(x.dtype),
                         chunk_tokens=cfg.ffn_chunk_tokens)


def _wan_cross_attention(attn, x: Array, encoder: Array, cfg: WanConfig) -> Array:
    """(ref: WanAttention.forward cross path + I2V image-KV branch,
    transformer.py:471-507,531-532). The first (S_enc - text_len) context
    tokens are image context when the add_k branch exists."""
    d = cfg.inner_dim
    h, hd = cfg.num_attention_heads, cfg.attention_head_dim
    if "add_k" in attn and encoder.shape[1] > cfg.text_len:
        # first (S_enc - text_len) tokens are image context; an I2V
        # checkpoint driven with text-only context must NOT take this
        # branch (a zero-length attention softmax is NaN)
        img_len = encoder.shape[1] - cfg.text_len
        ctx_img, ctx_txt = encoder[:, :img_len], encoder[:, img_len:]
    else:
        ctx_img, ctx_txt = None, encoder

    q = rms_norm(qlinear_apply(attn["q"], x, chunk_tokens=cfg.ffn_chunk_tokens),
                 attn["norm_q"], cfg.eps)
    kv = qlinear_apply(attn["kv"], ctx_txt)
    k = rms_norm(kv[..., :d], attn["norm_k"], cfg.eps)
    v = kv[..., d:]
    k_img = v_img = None
    if ctx_img is not None:
        k_img = rms_norm(qlinear_apply(attn["add_k"], ctx_img),
                         attn["norm_added_k"], cfg.eps)
        v_img = qlinear_apply(attn["add_v"], ctx_img)

    def xattn(qc):
        o = scaled_dot_product_attention(qc, k, v, h, h, hd, False, hd**-0.5)
        if k_img is not None:
            o = o + scaled_dot_product_attention(qc, k_img, v_img, h, h, hd,
                                                 False, hd**-0.5)
        return o

    s = q.shape[1]
    ct = cfg.ffn_chunk_tokens
    if ct and s > ct and s % ct == 0:
        # per-chunk cross-attention: rows are independent (kv is the fixed
        # text context), and the flash wrapper's padded q/out transposes at
        # full 75.6k-token width were 2 x 738 MB of the fused A14B step's
        # HBM peak (compile OOM by 46 MB, 2026-08-21)
        out = jnp.concatenate(
            [xattn(q[:, i : i + ct]) for i in range(0, s, ct)], axis=1)
    else:
        out = xattn(q)
    return qlinear_apply(attn["to_out"], out.astype(x.dtype),
                         chunk_tokens=cfg.ffn_chunk_tokens)


def wan_block(block, hidden: Array, encoder: Array, temb6: Array, cos: Array,
              sin: Array, cfg: WanConfig, sparse_mask: Optional[Array]) -> Array:
    """(ref: WanTransformerBlock.forward, wan.py:67-114). temb6:
    (B, 6, D) or (B, S, 6, D) for per-token timesteps; modulation in f32."""
    mod = block["scale_shift_table"][None] + temb6.astype(jnp.float32)
    if cfg.per_token_timestep:
        # (B, S, 6, D) -> six (B, S, D)
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = [
            mod[..., i, :] for i in range(6)
        ]
    else:
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = [
            mod[:, i, :][:, None, :] for i in range(6)
        ]

    h32 = fp32_layer_norm(hidden, eps=cfg.eps).astype(jnp.float32)
    norm_h = (h32 * (1 + scale_msa) + shift_msa).astype(hidden.dtype)
    attn_out = _wan_self_attention(block["attn1"], norm_h, cos, sin, cfg, sparse_mask)
    hidden = (hidden.astype(jnp.float32) + attn_out.astype(jnp.float32) * gate_msa).astype(hidden.dtype)

    if "norm2" in block:
        # the reference casts norm2's output back before cross-attention
        # (`.type_as(hidden_states)`, ref wan.py:101) — unlike norm1/norm3/
        # norm_out, whose f32 output feeds the f32 modulation directly
        norm_h = fp32_layer_norm(
            hidden, block["norm2"]["gamma"], block["norm2"]["beta"], cfg.eps
        ).astype(hidden.dtype)
    else:
        norm_h = hidden
    hidden = hidden + _wan_cross_attention(block["attn2"], norm_h, encoder, cfg)

    h32 = fp32_layer_norm(hidden, eps=cfg.eps).astype(jnp.float32)
    norm_h = (h32 * (1 + c_scale) + c_shift).astype(hidden.dtype)
    ff_out = feedforward_apply(block["ffn"], norm_h, "gelu-approximate",
                               chunk_tokens=cfg.ffn_chunk_tokens)
    hidden = (hidden.astype(jnp.float32) + ff_out.astype(jnp.float32) * c_gate).astype(hidden.dtype)
    return hidden


def wan_run_blocks(params, cfg: WanConfig, hidden, encoder, temb6, cos, sin,
                   sparse_mask: Optional[Array] = None, start_block: int = 0):
    """Dense-layer segment scans without the mask; the rest consumes it
    (ref layer gating: transformer.py:512). start_block supports FBCache.

    When a pipeline-parallel mesh is active (parallel/pp_state) and the stack
    is uniform (no dense-layer segment split, no cache-consumed prefix,
    depth % pp == 0), the scan is replaced by the GPipe schedule — the
    A14B/5B weights-don't-fit axis (SURVEY.md §7 step 9). The sparse mask is
    layer-invariant, so it rides as a closure constant; encoder/temb6 are
    per-sample and ride in the microbatch state."""
    from fastdm_tpu.parallel import pp_state

    ppm = pp_state.get_pp_mesh()
    if ppm is not None and params["dense_blocks"] is None and start_block == 0:
        import jax.tree_util as jtu

        pp = ppm.shape[pp_state.get_pp_axis()]
        n = jtu.tree_leaves(params["blocks"])[0].shape[0]
        if pp > 1 and n % pp == 0:
            return _wan_run_blocks_pp(
                params["blocks"], cfg, hidden, encoder, temb6, cos, sin,
                sparse_mask, ppm)

    def mk_body(mask):
        def body(carry, block):
            return wan_block(block, carry, encoder, temb6, cos, sin, cfg, mask), None
        return body

    from fastdm_tpu.models.stack import scan_suffix

    nd = cfg.dense_layers
    if params["dense_blocks"] is not None and start_block < nd:
        hidden, _ = scan_suffix(mk_body(None), hidden,
                                params["dense_blocks"], start_block)
        start_block = nd
    if params["blocks"] is not None:
        hidden, _ = scan_suffix(mk_body(sparse_mask), hidden,
                                params["blocks"], max(0, start_block - nd))
    return hidden


def _wan_run_blocks_pp(blocks, cfg: WanConfig, hidden, encoder, temb6, cos,
                       sin, sparse_mask, mesh):
    """GPipe over the wan block stack: batch dim -> microbatch stream."""
    from fastdm_tpu.parallel import pp_state
    from fastdm_tpu.parallel.pipeline import gpipe_run_blocks

    axis = pp_state.get_pp_axis()
    mb = (hidden[:, None], encoder[:, None], temb6[:, None])

    def block_fn(block, state):
        h, e, t6 = state
        h = wan_block(block, h, e, t6, cos, sin, cfg, sparse_mask)
        return (h, e, t6)

    h_mb, _, _ = gpipe_run_blocks(block_fn, blocks, mb, mesh, axis)
    return h_mb[:, 0]


def wan_patchify(params, cfg: WanConfig, video: Array) -> Array:
    """(B, C, F, H, W) -> (B, N, D) patch tokens; conv3d == per-patch matmul."""
    b, c, f, h, w = video.shape
    pt, ph, pw = cfg.patch_size
    x = video.reshape(b, c, f // pt, pt, h // ph, ph, w // pw, pw)
    # patch vector order (C, pt, ph, pw) to match the conv3d weight reshape
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    x = x.reshape(b, (f // pt) * (h // ph) * (w // pw), c * pt * ph * pw)
    return qlinear_apply(params["patch_embedding"], x.astype(jnp.bfloat16))


def wan_unpatchify(cfg: WanConfig, tokens: Array, f: int, h: int, w: int) -> Array:
    """(B, N, C*prod(p)) -> (B, C, F, H, W) (ref: wan.py:374-378)."""
    b = tokens.shape[0]
    pt, ph, pw = cfg.patch_size
    pf, phh, pww = f // pt, h // ph, w // pw
    x = tokens.reshape(b, pf, phh, pww, pt, ph, pw, cfg.out_channels)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    return x.reshape(b, cfg.out_channels, f, h, w)


def wan_condition(params, cfg: WanConfig, timestep: Array, encoder_text: Array,
                  encoder_image: Optional[Array] = None):
    """(ref: WanTimeTextImageEmbedding.forward, embeddings.py:971-992).
    Returns (temb, temb6, encoder). timestep: (B,) or (B*S,) flattened."""
    ce = params["condition_embedder"]
    t_proj = get_timestep_embedding(
        timestep.reshape(-1).astype(jnp.float32), cfg.freq_dim,
        flip_sin_to_cos=True, downscale_freq_shift=0.0,
    )
    temb = timestep_embedding_apply(ce["time_embedder"], t_proj.astype(jnp.float32))
    temb = temb.astype(encoder_text.dtype)
    t6 = qlinear_apply(ce["time_proj"], jax.nn.silu(temb))
    encoder = pixart_text_projection_apply(ce["text_embedder"], encoder_text, "gelu_tanh")
    if encoder_image is not None:
        ie = ce["image_embedder"]
        x = encoder_image
        if "pos_embed" in ie:
            bsz, sl, ed = x.shape
            x = x.reshape(-1, 2 * sl, ed) + ie["pos_embed"]
        x = fp32_layer_norm(x, ie["norm1"]["gamma"], ie["norm1"]["beta"], 1e-5)
        x = qlinear_apply(ie["ff"]["proj"], x)
        x = jax.nn.gelu(x, approximate=False)
        x = qlinear_apply(ie["ff"]["out"], x)
        x = fp32_layer_norm(x, ie["norm2"]["gamma"], ie["norm2"]["beta"], 1e-5)
        encoder = jnp.concatenate([x.astype(encoder.dtype), encoder], axis=1)
    return temb, t6, encoder


def _wan_embed(params, cfg, hidden_states, timestep, encoder_hidden_states,
               encoder_hidden_states_image, rope_cos, rope_sin):
    """Shared forward preamble: rope default, patchify, conditioning, temb
    reshapes (one implementation for the cached and uncached forwards)."""
    b, c, f, h, w = hidden_states.shape
    if rope_cos is None:
        rope_cos, rope_sin = wan_rope_cos_sin(cfg, f, h, w)
    hidden = wan_patchify(params, cfg, hidden_states)
    temb, t6, encoder = wan_condition(
        params, cfg, timestep, encoder_hidden_states, encoder_hidden_states_image
    )
    if cfg.per_token_timestep:
        t6 = t6.reshape(b, -1, 6, cfg.inner_dim)
        temb = temb.reshape(b, -1, cfg.inner_dim)
    else:
        t6 = t6.reshape(b, 6, cfg.inner_dim)
    return hidden, temb, t6, encoder, rope_cos, rope_sin, (f, h, w)


def _wan_output(params, cfg, hidden, temb, fhw):
    """Shared output modulation + projection + unpatchify
    (ref: wan.py:355-378; norm_out stays f32 through the modulation)."""
    f, h, w = fhw
    sst = params["scale_shift_table"]
    if cfg.per_token_timestep:
        mod = sst[None, None] + temb.astype(jnp.float32)[:, :, None, :]
        shift, scale = mod[:, :, 0, :], mod[:, :, 1, :]
    else:
        mod = sst[None] + temb.astype(jnp.float32)[:, None, :]
        shift, scale = mod[:, 0, :][:, None], mod[:, 1, :][:, None]
    h32 = fp32_layer_norm(hidden, eps=cfg.eps).astype(jnp.float32)
    hidden = (h32 * (1 + scale) + shift).astype(hidden.dtype)
    out = qlinear_apply(params["proj_out"], hidden)
    return wan_unpatchify(cfg, out, f, h, w)


def wan_forward(
    params,
    cfg: WanConfig,
    hidden_states: Array,            # (B, C, F, H, W) video latent
    timestep: Array,                 # (B,) or (B, S) train-timestep units
    encoder_hidden_states: Array,    # (B, text_len, text_dim)
    encoder_hidden_states_image: Optional[Array] = None,  # (B, S_img, image_dim)
    rope_cos: Optional[Array] = None,
    rope_sin: Optional[Array] = None,
    sparse_mask: Optional[Array] = None,
) -> Array:
    """(ref: WanTransformer3DModelCore.forward, wan.py:283-380)"""
    hidden, temb, t6, encoder, rope_cos, rope_sin, fhw = _wan_embed(
        params, cfg, hidden_states, timestep, encoder_hidden_states,
        encoder_hidden_states_image, rope_cos, rope_sin,
    )
    hidden = wan_run_blocks(params, cfg, hidden, encoder, t6, rope_cos, rope_sin, sparse_mask)
    return _wan_output(params, cfg, hidden, temb, fhw)


def wan_forward_cached(
    params, cfg: WanConfig, cache_cfg, cache_state, step: Array, total_steps: int,
    hidden_states: Array, timestep: Array, encoder_hidden_states: Array,
    encoder_hidden_states_image: Optional[Array] = None,
    rope_cos: Optional[Array] = None, rope_sin: Optional[Array] = None,
    sparse_mask: Optional[Array] = None,
) -> Tuple[Array, dict]:
    """wan_forward with FBCache/DiCache (the reference's wan best practice is
    FBCache, SURVEY.md §3.3; probe = first block(s) output, ref xcaching.py
    model_type='wan' paths)."""
    from fastdm_tpu.caching.config import DiCacheConfig, FBCacheConfig
    from fastdm_tpu.caching.xcaching import cached_run

    hidden, temb, t6, encoder, rope_cos, rope_sin, fhw = _wan_embed(
        params, cfg, hidden_states, timestep, encoder_hidden_states,
        encoder_hidden_states_image, rope_cos, rope_sin,
    )
    if not isinstance(cache_cfg, (FBCacheConfig, DiCacheConfig)):
        raise ValueError(f"wan caching supports fbcache/dicache, got {type(cache_cfg)}")
    depth = 1 if isinstance(cache_cfg, FBCacheConfig) else cache_cfg.probe_depth

    def probe_fn(hh, ee):
        for i in range(depth):
            src = params["dense_blocks"] if (params["dense_blocks"] is not None and i < cfg.dense_layers) else params["blocks"]
            idx = i if (params["dense_blocks"] is not None and i < cfg.dense_layers) else i - cfg.dense_layers
            blk = jax.tree.map(lambda x: x[idx], src)
            mask = None if i < cfg.dense_layers else sparse_mask
            hh = wan_block(blk, hh, ee, t6, rope_cos, rope_sin, cfg, mask)
        return hh, (hh, ee)

    def rest_fn(hh, ee):
        return wan_run_blocks(params, cfg, hh, ee, t6, rope_cos, rope_sin,
                              sparse_mask, start_block=depth)

    hidden, new_state = cached_run(
        cache_cfg, cache_state, step, total_steps, hidden, encoder, probe_fn, rest_fn
    )
    return _wan_output(params, cfg, hidden, temb, fhw), new_state


# ---------------------------------------------------------------- rope


def wan_rope_cos_sin(cfg: WanConfig, f: int, h: int, w: int) -> Tuple[Array, Array]:
    """Host-side 3D rope cache (ref: WanRotaryPosEmbed, embeddings.py:859-923).

    head_dim splits into h_dim = w_dim = 2*(d//6), t_dim = d - h - w (the
    reference's exact split, embeddings.py:873 — d//3 agrees at d=128 but
    goes ODD for d=64, breaking the per-pair angle count); per-pair angles
    concatenated (t, h, w); returns (cos, sin) each (N, d/2)."""
    d = cfg.attention_head_dim
    pt, ph, pw = cfg.patch_size
    pf, phh, pww = f // pt, h // ph, w // pw
    h_dim = w_dim = 2 * (d // 6)
    t_dim = d - h_dim - w_dim

    at = rope_1d_freqs(t_dim, np.arange(pf))        # (pf, t_dim/2)
    ah = rope_1d_freqs(h_dim, np.arange(phh))
    aw = rope_1d_freqs(w_dim, np.arange(pww))
    a = np.concatenate([
        np.broadcast_to(at[:, None, None, :], (pf, phh, pww, at.shape[-1])),
        np.broadcast_to(ah[None, :, None, :], (pf, phh, pww, ah.shape[-1])),
        np.broadcast_to(aw[None, None, :, :], (pf, phh, pww, aw.shape[-1])),
    ], axis=-1).reshape(pf * phh * pww, -1)
    return jnp.asarray(np.cos(a), jnp.float32), jnp.asarray(np.sin(a), jnp.float32)
