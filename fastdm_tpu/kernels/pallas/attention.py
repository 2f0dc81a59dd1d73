"""Pallas TPU flash attention (dense + block-sparse).

TPU-native replacement for the reference's attention stack (SageAttention /
flash-attention-v3 fp8 / SpargeAttn block-sparse — SURVEY.md §2.2). Online-
softmax forward with the KV dimension as the innermost grid axis, so Pallas
double-buffers K/V block DMAs against MXU compute automatically.

Layout: (B, S, H*D) inputs are viewed as (B, H, S, D) so each grid step's
block is a (bq|bk, D) tile — the layout Mosaic requires (last two block dims
aligned to (8, 128) or spanning the array).

The block-sparse variant consumes the same (B, H, nq_blocks, nkv_blocks)
mask contract as the reference's radial attention (ref:
fastdm/sparse/xsparse.py:171-183) and skips masked KV blocks' compute.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastdm_tpu.kernels import contracts
from fastdm_tpu.kernels.registry import kernel_registry

# CPU tests run the kernels through the (fast) Pallas interpreter; on TPU this
# must be unset so Mosaic compiles them.
_INTERPRET = os.environ.get("FASTDM_PALLAS_INTERPRET", "0") == "1"


Array = jax.Array

_NEG_INF = -1e30
_LANES = 128
_LOG2E = 1.4426950408889634


def _attn_body(q, k, v, kv_mask, m_scr, l_scr, acc_scr, s_dtype=jnp.float32):
    """One online-softmax update for a (bq, D) query block against (bk, D) k/v.

    The softmax runs in base 2: the wrapper pre-folds `scale * log2(e)` into q
    (one (S, D) pass) so the kernel never multiplies the (bq, bk) logits tile
    by a scale, and `exp2` skips exp's internal base conversion. (Measured
    perf-neutral on v5e — Mosaic was already hiding both ops — kept for the
    smaller per-tile op count; see BENCH_NOTES.md.)

    Retired variants, measured losers on v5e (BENCH_NOTES.md round-2 A/B —
    do not re-add): (a) SageAttention-style int8-QK (the reference's >=Ampere
    dense default, fastdm/kernel/cuda/attention.py:19-23) — 16.2 ms vs 12.8
    bf16 at the FLUX shape; the kernel is softmax-VPU-bound, so the MXU's 2x
    int8 rate buys nothing even quantizing outside the kernel. (b) polynomial
    exp2 (round/fma/bitcast-constructed) — 1.5x SLOWER than the native
    transcendental at both FLUX and A14B shapes; the VPU's exp2 unit is
    already near 1 elem/cycle/lane."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(s_dtype)  # Mosaic requires 32-bit matmul acc; the downcast
    # happens at the accumulator store, before a VMEM round-trip
    if kv_mask is not None:
        s = jnp.where(kv_mask, s, _NEG_INF)
    _softmax_update(s, v, m_scr, l_scr, acc_scr)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, kv_len, block_q, block_k, causal, s_dtype=jnp.float32,
):
    i, j = pl.program_id(2), pl.program_id(3)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full(m_scr.shape, _NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    run = jnp.bool_(True)
    if causal:
        run = j * block_k <= (i + 1) * block_q - 1

    has_pad = kv_len % block_k != 0
    # (sub-block splits of the KV tile — both serial and dots-hoisted-
    # before-softmax forms — were tried and measured neutral-to-worse on
    # v5e; see BENCH_NOTES.md. One _attn_body per (bq, bk) tile is the form)

    def _mask_for(masked):
        kv_mask = None
        col = None
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            kv_mask = col + j * block_k < kv_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            if col is None:
                col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            cmask = col + j * block_k <= row + i * block_q
            kv_mask = cmask if kv_mask is None else (kv_mask & cmask)
        return kv_mask

    def body(masked):
        _attn_body(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], _mask_for(masked),
                   m_scr, l_scr, acc_scr, s_dtype)

    if has_pad:
        # only the LAST kv block contains padding; keep the hot path mask-free
        @pl.when(run & (j < nj - 1))
        def _():
            body(False)

        @pl.when(run & (j == nj - 1))
        def _():
            body(True)
    else:
        @pl.when(run)
        def _():
            body(False)

    @pl.when(j == nj - 1)
    def _():
        l = l_scr[:, :1]
        out = acc_scr[...] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = out.astype(o_ref.dtype)


def _softmax_update(s, v, m_scr, l_scr, acc_scr):
    """Online-softmax update + PV for an already-computed (bq, bk) logits tile
    (base-2 logits, see _attn_body).

    Works at s's own dtype: with FASTDM_SDPA_BF16_LOGITS the logits tile is
    bf16, halving its VMEM traffic for every pass (max/sub/exp2/sum) and
    making the PV astype a no-op. The running m/l/acc state stays f32; the
    sub uses m rounded to s's dtype, which shifts p and sum(p) by the same
    factor — softmax-consistent. bf16 logits are strictly more accurate than
    the reference's default int8-QK SageAttention logits."""
    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur.astype(jnp.float32),
                                                  m_prev.shape))
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next[:, :1].astype(s.dtype))
    l_scr[...] = alpha * l_prev + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32), l_prev.shape
    )
    m_scr[...] = m_next
    pv = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_scr[...] = alpha[:, :1] * acc_scr[...] + pv


def _sparse_flash_kernel(
    mask_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, kv_len, block_q, block_k,
):
    j = pl.program_id(3)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full(m_scr.shape, _NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    @pl.when(mask_ref[0, 0, 0, 0] != 0)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        kv_mask = None
        if kv_len % block_k != 0:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            kv_mask = col + j * block_k < kv_len
        _attn_body(q, k, v, kv_mask, m_scr, l_scr, acc_scr)

    @pl.when(j == nj - 1)
    def _():
        l = l_scr[:, :1]
        out = acc_scr[...] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = out.astype(o_ref.dtype)


def _pad_seq(x: Array, mult: int) -> Array:
    """Pad the sequence axis of a (B, H, S, D) array up to a multiple."""
    pad = (-x.shape[2]) % mult
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _flash_kernel_nq(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, kv_len, block_q, block_k, causal, s_dtype=jnp.float32,
):
    """Native-layout-q flash kernel: q/out blocks are (1, bq, head_dim)
    carved straight from the model's (b, s, h*d) tensors by the BlockSpec
    (same trick as the super-gather kernel), so the wrapper's padded q
    transpose AND the output transpose-back never exist. K/V keep the
    transposed+padded copy (their tiles are walked per q block; a native
    fetch would be a strided 256 B-chunk DMA). The softmax scale*log2e is
    folded into the K copy instead of q (that copy is made anyway)."""
    i, j = pl.program_id(2), pl.program_id(3)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full(m_scr.shape, _NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    run = True
    if causal:
        run = j * block_k <= (i + 1) * block_q - 1
    has_pad = kv_len % block_k != 0

    def _mask_for(masked):
        kv_mask = None
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            kv_mask = col + j * block_k < kv_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            if kv_mask is None:
                col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            cmask = col + j * block_k <= row + i * block_q
            kv_mask = cmask if kv_mask is None else (kv_mask & cmask)
        return kv_mask

    def body(masked):
        _attn_body(q_ref[0], k_ref[0, 0], v_ref[0, 0], _mask_for(masked),
                   m_scr, l_scr, acc_scr, s_dtype)

    if has_pad:
        @pl.when(run & (j < nj - 1))
        def _():
            body(False)

        @pl.when(run & (j == nj - 1))
        def _():
            body(True)
    else:
        @pl.when(run)
        def _():
            body(False)

    @pl.when(j == nj - 1)
    def _():
        l = l_scr[:, :1]
        out = acc_scr[...] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_q_heads", "num_kv_heads", "head_dim", "is_causal", "scale",
        "block_q", "block_k", "bf16_logits",
    ),
)
def _flash_attention_nq(
    query, key, value,
    *, num_q_heads, num_kv_heads, head_dim, is_causal, scale, block_q,
    block_k, bf16_logits=False,
):
    """Dense flash attention with native-layout q/out (see _flash_kernel_nq).
    query: (b, sq, h*d) -> out (b, sq, h*d), no q/out relayout copies."""
    b, sq, _ = query.shape
    skv = key.shape[1]
    scale = head_dim**-0.5 if scale is None else scale
    bq = min(block_q, _round_up(sq, 128))
    bk = min(block_k, _round_up(skv, 128))
    # scale*log2(e) folds into the K transpose+pad copy (made anyway)
    k = key.reshape(b, skv, num_kv_heads, head_dim).transpose(0, 2, 1, 3)
    k = _pad_seq((k.astype(jnp.float32) * (scale * _LOG2E)).astype(key.dtype),
                 bk)
    v = _pad_seq(value.reshape(b, skv, num_kv_heads, head_dim).transpose(0, 2, 1, 3), bk)
    ni = -(-sq // bq)  # partial tail q block: Mosaic OOB load/store masking
    nj = k.shape[2] // bk
    grid = (b, num_q_heads, ni, nj)
    kv_rep = num_q_heads // num_kv_heads

    q_spec = pl.BlockSpec((1, bq, head_dim),
                          lambda b_, h, i, j: (b_, i, h),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec(
        (1, 1, bk, head_dim),
        lambda b_, h, i, j: (b_, h // kv_rep, j, 0),
        memory_space=pltpu.VMEM,
    )
    o_spec = pl.BlockSpec((1, bq, head_dim),
                          lambda b_, h, i, j: (b_, i, h),
                          memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((bq, _LANES), jnp.float32),
        pltpu.VMEM((bq, _LANES), jnp.float32),
        pltpu.VMEM((bq, head_dim), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=4 * b * num_q_heads * ni * bq * nj * bk * head_dim,
        bytes_accessed=2 * (query.size + k.size + v.size),
        transcendentals=b * num_q_heads * ni * bq * nj * bk,
    )
    kernel = functools.partial(
        _flash_kernel_nq,
        kv_len=skv, block_q=bq, block_k=bk, causal=is_causal,
        s_dtype=jnp.bfloat16 if bf16_logits else jnp.float32,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct(query.shape, query.dtype),
        scratch_shapes=scratch,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(query, k, v)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_q_heads", "num_kv_heads", "head_dim", "is_causal", "scale",
        "block_q", "block_k", "has_mask", "bf16_logits",
    ),
)
def _flash_attention(
    query, key, value, sparse_mask,
    *, num_q_heads, num_kv_heads, head_dim, is_causal, scale, block_q, block_k,
    has_mask, bf16_logits=False,
):
    b, sq, _ = query.shape
    skv = key.shape[1]
    scale = head_dim**-0.5 if scale is None else scale
    bq = min(block_q, _round_up(sq, 128))
    bk = min(block_k, _round_up(skv, 128))

    q = query.reshape(b, sq, num_q_heads, head_dim).transpose(0, 2, 1, 3)
    # base-2 softmax: fold scale*log2(e) into q here (one (S, D) pass) so the
    # kernel's per-logits-tile work drops by two VPU passes (see _attn_body)
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(query.dtype)
    q = _pad_seq(q, bq)
    k = _pad_seq(key.reshape(b, skv, num_kv_heads, head_dim).transpose(0, 2, 1, 3), bk)
    v = _pad_seq(value.reshape(b, skv, num_kv_heads, head_dim).transpose(0, 2, 1, 3), bk)
    sq_p, skv_p = q.shape[2], k.shape[2]
    ni, nj = sq_p // bq, skv_p // bk
    grid = (b, num_q_heads, ni, nj)
    kv_rep = num_q_heads // num_kv_heads

    q_spec = pl.BlockSpec(
        (1, 1, bq, head_dim), lambda b_, h, i, j: (b_, h, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, 1, bk, head_dim),
        lambda b_, h, i, j: (b_, h // kv_rep, j, 0),
        memory_space=pltpu.VMEM,
    )
    o_spec = pl.BlockSpec(
        (1, 1, bq, head_dim), lambda b_, h, i, j: (b_, h, i, 0), memory_space=pltpu.VMEM
    )
    scratch = [
        pltpu.VMEM((bq, _LANES), jnp.float32),
        pltpu.VMEM((bq, _LANES), jnp.float32),
        pltpu.VMEM((bq, head_dim), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=4 * b * num_q_heads * sq_p * skv_p * head_dim,
        bytes_accessed=2 * (q.size + k.size + v.size),
        transcendentals=b * num_q_heads * sq_p * skv_p,
    )

    if has_mask:
        mask_spec = pl.BlockSpec(
            (1, 1, 1, 1), lambda b_, h, i, j: (b_, h, i, j), memory_space=pltpu.SMEM
        )
        kernel = functools.partial(
            _sparse_flash_kernel, kv_len=skv, block_q=bq, block_k=bk
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[mask_spec, q_spec, kv_spec, kv_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, query.dtype),
            scratch_shapes=scratch,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            interpret=_INTERPRET,
        )(sparse_mask.astype(jnp.int32), q, k, v)
    else:
        kernel = functools.partial(
            _flash_kernel,
            kv_len=skv, block_q=bq, block_k=bk, causal=is_causal,
            s_dtype=jnp.bfloat16 if bf16_logits else jnp.float32,
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, query.dtype),
            scratch_shapes=scratch,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            interpret=_INTERPRET,
        )(q, k, v)

    return (
        out[:, :, :sq].transpose(0, 2, 1, 3).reshape(b, sq, num_q_heads * head_dim)
    )


@kernel_registry.register("sdpa", "pallas")
def sdpa_pallas(
    query: Array,
    key: Array,
    value: Array,
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    is_causal: bool = False,
    scale: Optional[float] = None,
) -> Array:
    contracts.check_sdpa("sdpa_pallas", query, key, value,
                         num_q_heads, num_kv_heads, head_dim)
    # FASTDM_SDPA_BF16_LOGITS=1 runs the softmax over a bf16 logits tile
    # (equal speed on v5e, looser numerics — see _softmax_update). Read per
    # call and passed as a static arg, so flipping it after import works.
    bf16_logits = os.environ.get("FASTDM_SDPA_BF16_LOGITS", "0") == "1"
    # measured on v5e (same-session A/Bs, BENCH_NOTES.md): bq1024/bk1024 is
    # best at FLUX-class shapes (8704 tok: 10.4 ms vs 10.9 bk2048 / 11.4
    # bq2048); at long video shapes bk2048 wins ~5% (A14B 75.6k tok: 757 ms
    # vs 795) — KV-tile DMAs amortize better once the KV walk dominates.
    # Stock jax.experimental flash ties at FLUX (10.1) and LOSES at A14B
    # (~855 normalized): its sub-block structure buys nothing here, so the
    # single-level serial tile walk stays.
    block_k = 2048 if key.shape[1] >= 32768 else 1024
    if os.environ.get("FASTDM_SDPA_NATIVE_Q", "0") == "1":
        # native-layout q/out (opt-in): drops the padded q transpose AND the
        # output transpose-back. MEASURED NEUTRAL-to-NEGATIVE at the FLUX
        # bench shape (13.162 vs 13.022 s denoise, 2026-08-21) — the strided
        # (bq, head_dim) q-tile DMA costs what the transpose saved; kept for
        # HBM-peak-constrained programs (the A14B fused step)
        return _flash_attention_nq(
            query, key, value,
            num_q_heads=num_q_heads, num_kv_heads=num_kv_heads,
            head_dim=head_dim, is_causal=is_causal, scale=scale,
            block_q=1024, block_k=block_k, bf16_logits=bf16_logits,
        )
    return _flash_attention(
        query, key, value, None,
        num_q_heads=num_q_heads, num_kv_heads=num_kv_heads, head_dim=head_dim,
        is_causal=is_causal, scale=scale, block_q=1024, block_k=block_k,
        has_mask=False, bf16_logits=bf16_logits,
    )


def _gather_sparse_kernel(
    idx_ref, cnt_ref,  # scalar-prefetch: (ni, max_nb) int32, (ni, 1) int32
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, kv_len, block_q, block_k,
):
    """Gather-style block-sparse flash attention: the grid's inner axis walks
    the COMPACTED active-KV-block list per q block, so masked blocks cost
    neither DMA nor compute (the reference's SpargeAttn skips compute only
    after fetching; splash-attention-style prefetched indices skip both)."""
    i, j = pl.program_id(2), pl.program_id(3)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full(m_scr.shape, _NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    @pl.when(j < cnt_ref[i, 0])
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        kv_mask = None
        if kv_len % block_k != 0:
            # the gathered block may be the (padded) last one
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            kv_mask = col + idx_ref[i, j] * block_k < kv_len
        _attn_body(q, k, v, kv_mask, m_scr, l_scr, acc_scr)

    @pl.when(j == nj - 1)
    def _():
        l = l_scr[:, :1]
        out = acc_scr[...] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_q_heads", "num_kv_heads", "head_dim", "scale",
                     "block_q", "block_k", "max_blocks"),
)
def _gather_sparse_attention(
    query, key, value, block_indices, block_counts,
    *, num_q_heads, num_kv_heads, head_dim, scale, block_q, block_k, max_blocks,
):
    """block_indices: (ni, max_blocks) int32 active kv-block ids per q block
    (shared across batch/heads — the radial mask is head-independent);
    block_counts: (ni, 1) int32."""
    b, sq, _ = query.shape
    skv = key.shape[1]
    scale = head_dim**-0.5 if scale is None else scale
    bq, bk = block_q, block_k

    q = query.reshape(b, sq, num_q_heads, head_dim).transpose(0, 2, 1, 3)
    q = _pad_seq((q.astype(jnp.float32) * (scale * _LOG2E)).astype(query.dtype), bq)
    k = _pad_seq(key.reshape(b, skv, num_kv_heads, head_dim).transpose(0, 2, 1, 3), bk)
    v = _pad_seq(value.reshape(b, skv, num_kv_heads, head_dim).transpose(0, 2, 1, 3), bk)
    ni = q.shape[2] // bq
    grid = (b, num_q_heads, ni, max_blocks)
    kv_rep = num_q_heads // num_kv_heads

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, head_dim),
                         lambda b_, h, i, j, idx, cnt: (b_, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, head_dim),
                         lambda b_, h, i, j, idx, cnt: (b_, h // kv_rep, idx[i, j], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, head_dim),
                         lambda b_, h, i, j, idx, cnt: (b_, h // kv_rep, idx[i, j], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, head_dim),
                               lambda b_, h, i, j, idx, cnt: (b_, h, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, head_dim), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _gather_sparse_kernel, kv_len=skv, block_q=bq, block_k=bk
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, query.dtype),
        interpret=_INTERPRET,
    )(block_indices, block_counts, q, k, v)
    return out[:, :, :sq].transpose(0, 2, 1, 3).reshape(b, sq, num_q_heads * head_dim)


def _gather_fine_kernel(
    idx_ref, row_ref,  # scalar-prefetch (SMEM)
    q_ref, k_hbm, v_hbm, o_ref,
    k_buf, v_buf, m_scr, l_scr, acc_scr, sem,
    *, block_q, group, fine, kv_rep, tail_id, tail_valid, slots,
):
    """Fine-granularity gather-sparse flash attention.

    The compacted per-q-tile index list addresses FINE (64-token) KV blocks —
    the radial mask's native granularity (ref: fastdm/sparse/xsparse.py
    block_size) — and the kernel assembles each (group*fine)-token compute
    tile by manually DMA-ing `group` scattered fine blocks from HBM into a
    `slots`-deep ring of VMEM scratch buffers. Because the list is
    compacted, the MXU dot runs over fully-ACTIVE columns: the work ratio vs
    dense is the fine mask density itself (0.234 at the A14B shape) instead
    of the OR-coarsened density a BlockSpec-gathered 1024-token tile pays
    (0.603 — the round-1 1.33x ceiling). At iteration g the copies for group
    g+slots-1 are issued before waiting on group g, keeping slots-1 groups'
    scattered DMAs in flight behind the MXU (slots=2 = classic double
    buffering; deeper rings hide more of the scattered-issue latency,
    VERDICT r2 item 6).

    The index table is CSR-FLAT: idx_ref is ONE flat array of group-padded
    row segments and row_ref[i] = (start, count), so SMEM holds ~active
    blocks total instead of nq * max_row_width — at the A14B shape that is
    the difference between block_q=256 fitting (~380 KB) and OOMing (1.5 MB
    as a 2D table).

    Per-chunk validity is DERIVED (cnt + static tail_id/tail_valid), not
    table-driven: only padding slots (>= cnt) and the single global tail
    block can be partial, so the valid table never rides SMEM and
    fully-active groups skip the column mask entirely.
    """
    b_, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    hk = h // kv_rep
    bk = group * fine
    row_start = row_ref[i, 0]
    cnt = row_ref[i, 1]
    ng = jax.lax.div(cnt + group - 1, group)

    m_scr[...] = jnp.full(m_scr.shape, _NEG_INF, jnp.float32)
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def dma(g, slot, u, which):
        fid = idx_ref[row_start + g * group + u]
        src = k_hbm if which == 0 else v_hbm
        buf = k_buf if which == 0 else v_buf
        return pltpu.make_async_copy(
            src.at[b_, hk, pl.ds(fid * fine, fine), :],
            buf.at[slot, pl.ds(u * fine, fine), :],
            sem.at[slot, which, u],
        )

    def start_group(g, slot):
        for u in range(group):
            dma(g, slot, u, 0).start()
            dma(g, slot, u, 1).start()

    def wait_group(g, slot):
        for u in range(group):
            dma(g, slot, u, 0).wait()
            dma(g, slot, u, 1).wait()

    # prologue: fill slots 0..slots-2 (the steady-state loop issues the rest)
    for p in range(slots - 1):
        @pl.when(p < ng)
        def _(p=p):
            start_group(p, p)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
    chunk = col // fine
    within = col - chunk * fine

    def loop_body(g, carry):
        slot = jax.lax.rem(g, slots)

        @pl.when(g + slots - 1 < ng)
        def _():
            start_group(g + slots - 1, jax.lax.rem(g + slots - 1, slots))

        wait_group(g, slot)
        base = g * group
        full = base + group <= cnt
        if tail_valid == fine:
            clean = full
        else:
            any_tail = jnp.bool_(False)
            for u in range(group):
                any_tail = jnp.logical_or(
                    any_tail, idx_ref[row_start + base + u] == tail_id
                )
            clean = jnp.logical_and(full, jnp.logical_not(any_tail))

        @pl.when(clean)
        def _():
            _attn_body(q_ref[0, 0], k_buf[slot], v_buf[slot], None,
                       m_scr, l_scr, acc_scr)

        @pl.when(jnp.logical_not(clean))
        def _():
            # per-chunk validity (0 for padding slots >= cnt, tail_valid for
            # the global tail block) -> (1, bk) column mask vs the logits
            vfull = jnp.zeros((1, bk), jnp.int32)
            for u in range(group):
                p = base + u
                fid = idx_ref[row_start + p]
                vu = jnp.where(fid == tail_id, tail_valid, fine)
                vu = jnp.where(p < cnt, vu, 0)
                vfull = jnp.where(chunk == u, vu, vfull)
            _attn_body(q_ref[0, 0], k_buf[slot], v_buf[slot], within < vfull,
                       m_scr, l_scr, acc_scr)
        return carry

    jax.lax.fori_loop(0, ng, loop_body, 0)

    l = l_scr[:, :1]
    out = acc_scr[...] / jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_q_heads", "num_kv_heads", "head_dim", "scale",
                     "block_q", "group", "fine", "slots"),
)
def _gather_fine_attention(
    query, key, value, block_indices, block_rows,
    *, num_q_heads, num_kv_heads, head_dim, scale, block_q, group, fine,
    slots=2,
):
    b, sq, _ = query.shape
    skv = key.shape[1]
    scale = head_dim**-0.5 if scale is None else scale
    bq = block_q
    # static tail constants: the only partial fine block is the global last
    # one; the kernel derives per-chunk validity from these + cnt, so no
    # valid table is prefetched into SMEM
    nfine = -(-skv // fine)
    tail_id = nfine - 1
    tail_valid = skv - tail_id * fine

    q = query.reshape(b, sq, num_q_heads, head_dim).transpose(0, 2, 1, 3)
    q = _pad_seq((q.astype(jnp.float32) * (scale * _LOG2E)).astype(query.dtype), bq)
    k = _pad_seq(key.reshape(b, skv, num_kv_heads, head_dim).transpose(0, 2, 1, 3), fine)
    v = _pad_seq(value.reshape(b, skv, num_kv_heads, head_dim).transpose(0, 2, 1, 3), fine)
    ni = q.shape[2] // bq
    grid = (b, num_q_heads, ni)
    kv_rep = num_q_heads // num_kv_heads

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, head_dim),
                         lambda b_, h, i, *_: (b_, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # K stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, bq, head_dim),
                               lambda b_, h, i, *_: (b_, h, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots, group * fine, head_dim), key.dtype),
            pltpu.VMEM((slots, group * fine, head_dim), value.dtype),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, head_dim), jnp.float32),
            pltpu.SemaphoreType.DMA((slots, 2, group)),
        ],
    )
    kernel = functools.partial(
        _gather_fine_kernel, block_q=bq, group=group, fine=fine, kv_rep=kv_rep,
        tail_id=tail_id, tail_valid=tail_valid, slots=slots,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, query.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=_INTERPRET,
    )(block_indices, block_rows, q, k, v)
    return out[:, :, :sq].transpose(0, 2, 1, 3).reshape(b, sq, num_q_heads * head_dim)


@kernel_registry.register("sdpa_gather_fine", "pallas")
def sdpa_gather_fine_pallas(
    query: Array,
    key: Array,
    value: Array,
    block_indices: Array,
    block_valid: Array,
    block_rows: Array,
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    scale: Optional[float] = None,
    block_q: int = 512,
    group: int = 8,
    fine: int = 64,
    slots: Optional[int] = None,
) -> Array:
    contracts.check_sdpa("sdpa_gather_fine_pallas", query, key, value,
                         num_q_heads, num_kv_heads, head_dim)
    contracts.check_gather_fine("sdpa_gather_fine_pallas", block_indices,
                                block_valid, block_rows, query.shape[1],
                                key.shape[1], block_q, group, fine)
    # In-graph backstop for the value checks above (skipped on tracers — the
    # engine path jits the denoiser): clamp every dynamic index the kernel's
    # DMA consumes into its legal range, so a table bug yields wrong output
    # (caught by tests/goldens) instead of an OOB DMA chip crash.
    t_len = int(block_indices.shape[0])
    nfine = -(-key.shape[1] // fine)
    block_indices = jnp.clip(block_indices, 0, nfine - 1)
    starts = block_rows[:, 0]
    starts = jnp.clip(starts - starts % group, 0, max(t_len - group, 0))
    cnts = jnp.clip(block_rows[:, 1], 0, t_len - starts)
    block_rows = jnp.stack([starts, cnts], axis=1)
    # block_valid is consumed by the contract check + jnp oracle only; the
    # kernel derives validity from cnt + static tail constants (see
    # _gather_fine_kernel), so it never rides the scalar-prefetch SMEM.
    if slots is None:
        # ring depth default; sweepable without a code change
        slots = int(os.environ.get("FASTDM_GATHER_SLOTS", "2"))
    if slots < 2:
        raise ValueError(f"slots must be >= 2, got {slots}")
    return _gather_fine_attention(
        query, key, value, block_indices, block_rows,
        num_q_heads=num_q_heads, num_kv_heads=num_kv_heads, head_dim=head_dim,
        scale=scale, block_q=block_q, group=group, fine=fine, slots=slots,
    )


def _gather_super_kernel(
    idx_ref, val_ref, row_ref,  # scalar-prefetch (SMEM)
    q_ref, k_hbm, v_hbm, o_ref,
    k_buf, v_buf, m_scr, l_scr, acc_scr, sem,
    *, block_q, group, fine, superblock, kv_rep, tail_fid, tail_valid, slots,
    q_scale,
):
    """Superblock gather-sparse flash attention (the scattered-DMA bandwidth
    fix for _gather_fine_kernel, BENCH_NOTES "slots sweep" null result).

    Entries address aligned runs of `superblock` consecutive fine blocks, so
    each DMA moves superblock*fine tokens (4x the fine kernel's transfer
    size at the default 4) — radial masks are diagonal bands, so ~85% of
    active fine blocks ride fully-active runs and the extra fetched bytes
    are ~15% (table builder: RadialAttn.block_lists_super). Inactive fine
    sub-blocks are masked EXACTLY via the per-entry validity bitmask
    (val_ref), so the attention semantics match the 64-token radial spec
    bit-for-bit; the global tail fine block's partial tokens are derived
    from static tail_fid/tail_valid as in the fine kernel."""
    b_, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    hk = h // kv_rep
    sb = superblock
    sbt = sb * fine                   # tokens per superblock
    bk = group * sbt
    bits_all = (1 << sb) - 1
    row_start = row_ref[i, 0]
    cnt = row_ref[i, 1]
    ng = jax.lax.div(cnt + group - 1, group)

    # q arrives in the model's native (b, s, h*d) layout — the BlockSpec
    # carves the (bq, head_dim) tile, so no transposed/padded HBM copy of q
    # exists; the softmax scale (pre-folded with log2e) applies here in VMEM
    qt = (q_ref[0].astype(jnp.float32) * q_scale).astype(q_ref.dtype)

    m_scr[...] = jnp.full(m_scr.shape, _NEG_INF, jnp.float32)
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def dma(g, slot, u, which):
        sid = idx_ref[row_start + g * group + u]
        src = k_hbm if which == 0 else v_hbm
        buf = k_buf if which == 0 else v_buf
        return pltpu.make_async_copy(
            src.at[b_, hk, pl.ds(sid * sbt, sbt), :],
            buf.at[slot, pl.ds(u * sbt, sbt), :],
            sem.at[slot, which, u],
        )

    def start_group(g, slot):
        for u in range(group):
            dma(g, slot, u, 0).start()
            dma(g, slot, u, 1).start()

    def wait_group(g, slot):
        for u in range(group):
            dma(g, slot, u, 0).wait()
            dma(g, slot, u, 1).wait()

    for p in range(slots - 1):
        @pl.when(p < ng)
        def _(p=p):
            start_group(p, p)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
    entry = col // sbt
    subcol = (col // fine) - entry * sb   # fine sub-block within the entry
    within = col - (col // fine) * fine

    def loop_body(g, carry):
        slot = jax.lax.rem(g, slots)

        @pl.when(g + slots - 1 < ng)
        def _():
            start_group(g + slots - 1, jax.lax.rem(g + slots - 1, slots))

        wait_group(g, slot)
        base = g * group
        full = base + group <= cnt
        all_active = jnp.bool_(True)
        any_tail = jnp.bool_(False)
        for u in range(group):
            bits = val_ref[row_start + base + u]
            sid = idx_ref[row_start + base + u]
            all_active = jnp.logical_and(all_active, bits == bits_all)
            any_tail = jnp.logical_or(any_tail, sid == tail_fid // sb)
        clean = jnp.logical_and(full, all_active)
        if tail_valid != fine or (tail_fid + 1) % sb != 0:
            # a tail-bearing group needs token masking even when all its
            # sub-block bits are set
            clean = jnp.logical_and(clean, jnp.logical_not(any_tail))

        @pl.when(clean)
        def _():
            _attn_body(qt, k_buf[slot], v_buf[slot], None,
                       m_scr, l_scr, acc_scr)

        @pl.when(jnp.logical_not(clean))
        def _():
            vfull = jnp.zeros((1, bk), jnp.int32)
            for u in range(group):
                p = base + u
                sid = idx_ref[row_start + p]
                bits = val_ref[row_start + p]
                in_row = p < cnt
                for s in range(sb):
                    fid = sid * sb + s
                    active = jnp.logical_and((bits >> s) & 1 == 1, in_row)
                    vu = jnp.where(fid == tail_fid, tail_valid, fine)
                    vu = jnp.where(active, vu, 0)
                    vfull = jnp.where(
                        jnp.logical_and(entry == u, subcol == s), vu, vfull
                    )
            _attn_body(qt, k_buf[slot], v_buf[slot], within < vfull,
                       m_scr, l_scr, acc_scr)
        return carry

    jax.lax.fori_loop(0, ng, loop_body, 0)

    l = l_scr[:, :1]
    out = acc_scr[...] / jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_q_heads", "num_kv_heads", "head_dim", "scale",
                     "block_q", "group", "fine", "superblock", "slots"),
)
def _gather_super_attention(
    query, key, value, block_indices, block_valbits, block_rows,
    *, num_q_heads, num_kv_heads, head_dim, scale, block_q, group, fine,
    superblock, slots=2,
):
    b, sq, _ = query.shape
    skv = key.shape[1]
    scale = head_dim**-0.5 if scale is None else scale
    bq = block_q
    sb = superblock
    nfine = -(-skv // fine)
    tail_fid = nfine - 1
    tail_valid = skv - tail_fid * fine

    # q stays in the model's native (b, s, h*d) layout: the BlockSpec carves
    # (bq, head_dim) tiles directly (index maps below), the kernel applies
    # the softmax scale in VMEM, and the output writes back natively. This
    # removes THREE (b, h, s_pad, d)-sized HBM copies (padded q, padded out,
    # plus the fused f32 scale pass) — at A14B 720p/81f they were 2.2 GiB of
    # the cached forward's 16.7 GiB peak (> one v5e; a14b_mem_analysis.py).
    # K/V keep the transposed+padded copy: the gather DMAs need (h, s, d)
    # contiguity for their 64-KiB superblock transfers.
    k = _pad_seq(key.reshape(b, skv, num_kv_heads, head_dim).transpose(0, 2, 1, 3), sb * fine)
    v = _pad_seq(value.reshape(b, skv, num_kv_heads, head_dim).transpose(0, 2, 1, 3), sb * fine)
    ni = -(-sq // bq)  # partial tail q-block: Mosaic masks OOB loads/stores
    grid = (b, num_q_heads, ni)
    kv_rep = num_q_heads // num_kv_heads

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, head_dim),
                         lambda b_, h, i, *_: (b_, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # K stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V stays in HBM
        ],
        out_specs=pl.BlockSpec((1, bq, head_dim),
                               lambda b_, h, i, *_: (b_, i, h),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots, group * sb * fine, head_dim), key.dtype),
            pltpu.VMEM((slots, group * sb * fine, head_dim), value.dtype),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, head_dim), jnp.float32),
            pltpu.SemaphoreType.DMA((slots, 2, group)),
        ],
    )
    kernel = functools.partial(
        _gather_super_kernel, block_q=bq, group=group, fine=fine,
        superblock=sb, kv_rep=kv_rep, tail_fid=tail_fid,
        tail_valid=tail_valid, slots=slots, q_scale=scale * _LOG2E,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(query.shape, query.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=_INTERPRET,
    )(block_indices, block_valbits, block_rows, query, k, v)
    return out


@kernel_registry.register("sdpa_gather_super", "pallas")
def sdpa_gather_super_pallas(
    query: Array,
    key: Array,
    value: Array,
    block_indices: Array,
    block_valbits: Array,
    block_rows: Array,
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
    contracts.check_sdpa("sdpa_gather_super_pallas", query, key, value,
                         num_q_heads, num_kv_heads, head_dim)
    contracts.check_gather_super("sdpa_gather_super_pallas", block_indices,
                                 block_valbits, block_rows, query.shape[1],
                                 key.shape[1], block_q, group, fine,
                                 superblock)
    # in-graph OOB backstop, mirroring sdpa_gather_fine_pallas
    t_len = int(block_indices.shape[0])
    nsuper = -(-(-(-key.shape[1] // fine)) // superblock)
    block_indices = jnp.clip(block_indices, 0, nsuper - 1)
    starts = block_rows[:, 0]
    starts = jnp.clip(starts - starts % group, 0, max(t_len - group, 0))
    cnts = jnp.clip(block_rows[:, 1], 0, t_len - starts)
    block_rows = jnp.stack([starts, cnts], axis=1)
    if slots is None:
        # 4-deep ring default: 351.7 -> 346.3 ms/layer-attn measured at the
        # A14B 75600-token shape (2026-08-20 residual-split session). The
        # scatter premium is ~0, so the gain is pure issue-pipelining; the
        # fine kernel keeps 2 (its slots sweep was null, BENCH_NOTES).
        slots = int(os.environ.get("FASTDM_GATHER_SLOTS", "4"))
    if slots < 2:
        raise ValueError(f"slots must be >= 2, got {slots}")
    return _gather_super_attention(
        query, key, value, block_indices, block_valbits, block_rows,
        num_q_heads=num_q_heads, num_kv_heads=num_kv_heads, head_dim=head_dim,
        scale=scale, block_q=block_q, group=group, fine=fine,
        superblock=superblock, slots=slots,
    )


def coarsen_block_mask(mask_2d, q_factor: int = 1, k_factor: int = 1):
    """Host-side OR-coarsening of a 2D block mask: rows grouped by q_factor,
    cols by k_factor (zero-padded up to a multiple first, so padding rows/
    cols never turn a tile on). OR makes the coarse mask a SUPERSET of the
    fine one — attention is never dropped, only extra tiles computed. The
    single shared implementation for both the gather block lists and
    SparseAttn.block_mask's consumer-granularity retile."""
    import numpy as np

    m = np.asarray(mask_2d, bool)
    if q_factor > 1 or k_factor > 1:
        nq, nk = m.shape
        pq, pk = (-nq) % q_factor, (-nk) % k_factor
        m = np.pad(m, ((0, pq), (0, pk)))
        m = m.reshape(m.shape[0] // q_factor, q_factor,
                      m.shape[1] // k_factor, k_factor).any(axis=(1, 3))
    return m


@kernel_registry.register("sdpa_gather", "pallas")
def sdpa_gather_pallas(
    query: Array,
    key: Array,
    value: Array,
    block_indices: Array,
    block_counts: Array,
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
) -> Array:
    contracts.check_sdpa("sdpa_gather_pallas", query, key, value,
                         num_q_heads, num_kv_heads, head_dim)
    contracts.check_gather_lists("sdpa_gather_pallas", block_indices,
                                 block_counts, query.shape[1], key.shape[1],
                                 block_q, block_k)
    # in-graph backstop (value checks above skip tracers): clamp the DMA
    # indices/counts so a table bug cannot OOB-DMA on hardware
    nkv = -(-key.shape[1] // block_k)
    block_indices = jnp.clip(block_indices, 0, nkv - 1)
    block_counts = jnp.clip(block_counts, 0, block_indices.shape[1])
    return _gather_sparse_attention(
        query, key, value, block_indices, block_counts,
        num_q_heads=num_q_heads, num_kv_heads=num_kv_heads, head_dim=head_dim,
        scale=scale, block_q=block_q, block_k=block_k,
        max_blocks=int(block_indices.shape[1]),
    )


def mask_to_block_lists(mask_2d, q_factor: int = 1, k_factor: int = 1) -> tuple:
    """Host-side: (nq, nk) bool mask -> (indices (nq', max_nb) i32, counts
    (nq', 1) i32). Padded entries repeat index 0 (fetched but compute-skipped).

    q_factor/k_factor coarsen the mask by OR-ing blocks of rows/cols: tiny
    128-blocks make the gather grid overhead-dominated (measured 4x slower
    than dense at 20k tokens); coarsening to e.g. 512x512 tiles trades a
    little sparsity for dense-kernel per-step efficiency."""
    import numpy as np

    m = coarsen_block_mask(mask_2d, q_factor, k_factor)
    nq = m.shape[0]
    counts = m.sum(1).astype(np.int32)
    max_nb = max(1, int(counts.max()))
    idx = np.zeros((nq, max_nb), np.int32)
    for i in range(nq):
        active = np.nonzero(m[i])[0]
        idx[i, : len(active)] = active
    return idx, counts.reshape(nq, 1), max_nb


@kernel_registry.register("sdpa_sparse", "pallas")
def sdpa_sparse_pallas(
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
    if sparse_mask is None:
        return sdpa_pallas(
            query, key, value, num_q_heads, num_kv_heads, head_dim, is_causal, scale
        )
    assert not is_causal, "block-sparse path is non-causal (radial video attention)"
    contracts.check_sdpa("sdpa_sparse_pallas", query, key, value,
                         num_q_heads, num_kv_heads, head_dim)
    # _flash_attention shrinks tiles for short sequences; mirror that before
    # validating the mask grid against the effective tiling
    eff_bq = min(block_q, _round_up(query.shape[1], 128))
    eff_bk = min(block_k, _round_up(key.shape[1], 128))
    contracts.check_sparse_mask("sdpa_sparse_pallas", sparse_mask,
                                query.shape[0], num_q_heads,
                                query.shape[1], key.shape[1], eff_bq, eff_bk)
    return _flash_attention(
        query, key, value, sparse_mask,
        num_q_heads=num_q_heads, num_kv_heads=num_kv_heads, head_dim=head_dim,
        is_causal=False, scale=scale, block_q=block_q, block_k=block_k, has_mask=True,
    )
