"""Unified kernel-op interface (9 dispatched ops).

Functional JAX re-design of the reference op contract
(ref: fastdm/kernel/operators_set.py:9-208). Differences are deliberate and
TPU-motivated:

  * no in-place mutation — RoPE returns new (q, k) instead of writing into the
    inputs (XLA is functional; donation/fusion recovers the memory),
  * cos/sin are passed as two (S, rot_dim/2) float32 arrays instead of the
    reference's single merged interleaved cache (the merge existed only to fit
    a CUDA kernel's layout),
  * activation-quantization scales are float32 (M, 1); weight scales (1, N).

All ops are traceable under jit; backend selection happens at trace time via
the registry (see registry.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from fastdm_tpu.kernels.registry import kernel_registry

Array = jax.Array


@kernel_registry.dispatch("rmsnorm")
def rms_norm(x: Array, weight: Optional[Array], eps: float) -> Array:
    """RMS-normalize ``x`` over its last dim, then multiply by ``weight``.

    ``weight`` may have trailing shape equal to the last dim of ``x`` (or be
    reshapeable onto it, e.g. per-head (heads*dim,) applied to (..., heads, dim)
    is handled by callers reshaping x). ``weight=None`` means no affine.
    Accumulation is float32 regardless of input dtype
    (ref: fastdm/kernel/torch/norm.py upcasts likewise).
    """
    return NotImplemented


@kernel_registry.dispatch("rotembd")
def rotary_pos_embedding(
    query: Array,
    key: Array,
    head_size: int,
    cos: Array,
    sin: Array,
    is_neox: bool = False,
) -> Tuple[Array, Array]:
    """Apply rotary embedding to query/key.

    query: (B, S, num_q_heads * head_size); key: (B, S, num_kv_heads * head_size).
    cos, sin: (S, head_size // 2) float32 — one entry per rotation pair.
    is_neox=False (interleaved): pairs are (x[..., 0::2], x[..., 1::2]);
    is_neox=True (half-split):   pairs are (x[..., :d/2], x[..., d/2:]).
    Returns rotated (query, key) in the input dtype.
    (ref contract: fastdm/kernel/operators_set.py:23-52)
    """
    return NotImplemented


@kernel_registry.dispatch("qk_norm_rope")
def qk_norm_rope(
    qk: Array,
    gamma_q: Optional[Array],
    gamma_k: Optional[Array],
    head_size: int,
    cos: Array,
    sin: Array,
    is_neox: bool = False,
    eps: float = 1e-6,
    inner_dim: Optional[int] = None,
) -> Tuple[Array, Array]:
    """Fused RMSNorm(q) + RMSNorm(k) + rotary embedding.

    qk: (B, S, 2D) — the contiguous [q|k] channels of a fused qkv
    projection — or the full (B, S, 3D) qkv with inner_dim=D (preferred on
    the pallas backend: no q|k slice copy is materialized);
    gamma_q/gamma_k: (D,) RMSNorm affine (None = no affine,
    both-or-neither); cos/sin as in rotary_pos_embedding. Returns
    (q, k), each (B, S, D), in qk's dtype.

    Semantics = rms_norm on each half then rotary_pos_embedding (the jnp
    oracle IS that composition). The pallas backend fuses all three in
    VMEM — composed XLA-side, the rope pair-interleave is a fusion boundary
    that materializes full-tensor f32 intermediates in HBM (2x 1.44 GiB at
    Wan-A14B 720p/81f; the 2026-08-20 compile-OOM allocations), and the
    q/k stream makes three HBM round-trips instead of one.
    (ref: the reference fuses the same chain in CUDA for the same reason —
    csrc/elmwise_ops.cu fused-QKV rmsnorm+RoPE :86-168.)"""
    return NotImplemented


@kernel_registry.dispatch("qk_norm_rope2")
def qk_norm_rope2(
    q: Array,
    k: Array,
    gamma_q: Optional[Array],
    gamma_k: Optional[Array],
    head_size: int,
    cos: Array,
    sin: Array,
    is_neox: bool = False,
    eps: float = 1e-6,
) -> Tuple[Array, Array]:
    """Two-operand form of qk_norm_rope: q, k each (B, S, D) already split.

    Same semantics (RMSNorm each, then rotary), for callers that project
    q/k/v separately — the split-QKV memory mode (models/wan.py
    split_qkv_proj), where a fused (B, S, 3D) buffer must never exist."""
    return NotImplemented


@kernel_registry.dispatch("gelu_and_mul")
def gelu_and_mul(x: Array) -> Array:
    """x[..., :d] * GELU(x[..., d:]) with d = x.shape[-1] // 2.

    Note the gate is the *second* half — opposite of the usual LLM layout
    (ref: fastdm/kernel/operators_set.py:54-67). Exact (erf) GELU.
    """
    return NotImplemented


@kernel_registry.dispatch("quantize_to_int8")
def quantize_to_int8(
    x: Array, symmetric: bool = True
) -> Tuple[Array, Array, Optional[Array]]:
    """Per-token (row) int8 quantization of a 2D array.

    symmetric: scale = rowmax(|x|)/127, zp None.
    asymmetric: scale = (rowmax-rowmin)/255, zp = -128 - round(rowmin/scale).
    Returns (q int8 (M,K), scale f32 (M,1), zp i32 (M,1) | None).
    (ref math: fastdm/utils/quantization.py:5-40)
    """
    return NotImplemented


@kernel_registry.dispatch("quantize_to_int4")
def quantize_to_int4(x: Array) -> Tuple[Array, Array]:
    """Per-token symmetric int4 quantization: scale = rowmax(|x|)/7.

    Returns (q int4 (M,K), scale f32 (M,1)). No reference counterpart —
    TPU extension (v5e MXU s4 rate > s8 rate; BENCH_NOTES 2026-08-19).
    """
    return NotImplemented


@kernel_registry.dispatch("int4_matmul")
def int4_matmul(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    out_dtype,
    bias: Optional[Array] = None,
) -> Array:
    """W4A4 int4 matmul: (M,K)s4 @ (K,N)s4 -> s32, dequantized by per-token
    (M,1) x per-channel (1,N) f32 scales (+ bias), cast to out_dtype.

    Symmetric on both sides (no zero-points): the int4 grid is too coarse
    for the azp formulation to pay, and the SVDQuant-style low-rank branch
    (layers/qlinear.py) absorbs the asymmetry instead.
    """
    return NotImplemented


@kernel_registry.dispatch("quantize_to_fp8")
def quantize_to_fp8(x: Array) -> Tuple[Array, Array]:
    """Per-token float8_e4m3fn quantization: scale = rowmax(|x|)/448.

    Returns (q fp8 (M,K), scale f32 (M,1)).
    (ref math: fastdm/utils/quantization.py:42-63)
    """
    return NotImplemented


@kernel_registry.dispatch("fp8_matmul")
def fp8_matmul(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    out_dtype,
    bias: Optional[Array] = None,
) -> Array:
    """(M,K)fp8 @ (K,N)fp8 with per-token (M,1) × per-channel (1,N) f32 scales.

    out = (a·b) * (scale_a ⊗ scale_b) + bias, cast to out_dtype.
    (ref contract: fastdm/kernel/operators_set.py:102-124)
    """
    return NotImplemented


@kernel_registry.dispatch("int8_matmul")
def int8_matmul(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    out_dtype,
    azp_adj: Array,
    azp: Optional[Array],
    bias: Optional[Array] = None,
) -> Array:
    """W8A8 int8 matmul with asymmetric activation zero-points.

    a: (M,K) int8 (per-token asym-quantized), b: (K,N) int8 (per-channel sym).
    azp_adj: (1,N) int32 column sums of b. azp: (M,1) int32 activation zps.
    out = (a·b - azp ⊗ azp_adj) * (scale_a ⊗ scale_b) + bias
    (ref math: doc/introduction.md:38-42, contract operators_set.py:126-152)
    """
    return NotImplemented


@kernel_registry.dispatch("sdpa")
def scaled_dot_product_attention(
    query: Array,
    key: Array,
    value: Array,
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    is_causal: bool = False,
    scale: Optional[float] = None,
) -> Array:
    """Attention over flattened-head layouts.

    query: (B, Sq, num_q_heads*head_dim); key/value: (B, Skv, num_kv_heads*head_dim).
    GQA when num_kv_heads < num_q_heads. Returns (B, Sq, num_q_heads*head_dim).
    (ref contract: fastdm/kernel/operators_set.py:154-179)
    """
    return NotImplemented


@kernel_registry.dispatch("sdpa_sparse")
def sparse_scaled_dot_product_attention(
    query: Array,
    key: Array,
    value: Array,
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    is_causal: bool = False,
    scale: Optional[float] = None,
    sparse_mask: Optional[Array] = None,
    block_q: int = 128,
    block_k: int = 128,
) -> Array:
    """Block-sparse attention.

    sparse_mask: (B, H, ceil(Sq/block_q), ceil(Skv/block_k)) bool/int — 1 compute,
    0 skip. Skipped KV blocks contribute nothing to the softmax.
    (ref contract: fastdm/kernel/operators_set.py:181-208)
    """
    return NotImplemented


@kernel_registry.dispatch("sdpa_gather")
def gather_sparse_attention(
    query: Array,
    key: Array,
    value: Array,
    block_indices: Array,   # (nq, max_nb) int32 active kv-block ids per q block
    block_counts: Array,    # (nq, 1) int32 valid entries per row
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
) -> Array:
    """Gather-form block-sparse attention: the sparsity pattern arrives as
    compacted per-q-block active-KV lists (SparseAttn.block_lists) shared
    across batch/heads, so masked blocks cost neither DMA nor compute on the
    pallas backend. The jnp backend reconstructs the dense block mask — the
    accuracy oracle. (TPU-native form of the reference's SpargeAttn path,
    fastdm/kernel/cuda/attention.py:218-260, which fetches then skips.)
    """
    return NotImplemented


@kernel_registry.dispatch("sdpa_gather_fine")
def gather_fine_attention(
    query: Array,
    key: Array,
    value: Array,
    block_indices: Array,   # (T,) int32 FINE kv-block ids, CSR-flat segments
    block_valid: Array,     # (T,) int32 valid tokens per fine block
    block_rows: Array,      # (nq, 2) int32 [segment start, active count]
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    scale: Optional[float] = None,
    block_q: int = 512,
    group: int = 8,
    fine: int = 64,
) -> Array:
    """Fine-granularity gather sparse attention: indices address the radial
    mask's NATIVE fine blocks (`fine` tokens, 64 in the reference config —
    ref: fastdm/sparse/xsparse.py block_size); the pallas backend assembles
    (group*fine)-token compute tiles from scattered fine blocks via manual
    double-buffered HBM->VMEM DMA, so the MXU work ratio vs dense equals the
    FINE mask density instead of an OR-coarsened one. Tables are CSR-flat
    (RadialAttn.block_lists_fine): row r's group-padded segment lives at
    block_indices[start_r : start_r + ceil(cnt_r/group)*group]; block_valid
    is `fine` for interior blocks, the tail remainder for the global last
    block, and 0 for padding slots."""
    return NotImplemented


@kernel_registry.dispatch("sdpa_gather_super")
def gather_super_attention(
    query: Array,
    key: Array,
    value: Array,
    block_indices: Array,   # (T,) int32 SUPERBLOCK ids, CSR-flat segments
    block_valbits: Array,   # (T,) int32 active-sub-block bitmask (0 = pad)
    block_rows: Array,      # (nq, 2) int32 [segment start, active count]
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    scale: Optional[float] = None,
    block_q: int = 512,
    group: int = 8,
    fine: int = 64,
    superblock: int = 4,
    slots: Optional[int] = None,
) -> Array:
    """Superblock gather sparse attention: entries address aligned runs of
    `superblock` consecutive fine blocks (radial masks are diagonal bands —
    85% of active fine blocks ride fully-active 4-runs at the A14B shape),
    making each scattered DMA 4x larger: the bandwidth fix for the fine
    kernel's 16KB-transfer bound (BENCH_NOTES slots-sweep null result).
    Inactive sub-blocks are masked exactly via the bitmask, so semantics
    stay bit-parity with the 64-token radial spec. Tables:
    RadialAttn.block_lists_super."""
    return NotImplemented
