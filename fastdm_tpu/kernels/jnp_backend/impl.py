"""jnp implementations of the 9 dispatched ops (numerical oracle backend)."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fastdm_tpu.kernels.registry import kernel_registry

Array = jax.Array

_FP8_MAX = 448.0  # float8_e4m3fn finfo.max
_EPS_SCALE = 1e-12


@kernel_registry.register("rmsnorm", "jnp")
def rms_norm_jnp(x: Array, weight: Optional[Array], eps: float) -> Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(x.dtype)


def _rotate(x: Array, cos: Array, sin: Array, is_neox: bool) -> Array:
    # x: (B, S, H, D); cos/sin: (S, D/2) f32
    #
    # dtype discipline (HBM-liveness, not style): slice FIRST in the input
    # dtype, upcast the halves inside the arithmetic, and cast each product
    # back BEFORE stack/concat. The interleaved slices block fusion with the
    # producer (strided minor-dim access), so whatever crosses that boundary
    # is materialized in HBM — upcasting the full tensor first made XLA
    # materialize f32 copies of post-norm q AND k (2 x 1.44 GiB at A14B
    # 720p/81f, the top HLO-temp allocations in the 2026-08-20 a14b_e2e
    # compile OOM). All casts commute with the slicing/stacking, so the
    # math (f32 multiply-accumulate, round-to-dtype once) is unchanged.
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    if is_neox:
        d2 = x.shape[-1] // 2
        x1, x2 = x[..., :d2], x[..., d2:]
    else:
        x1, x2 = x[..., 0::2], x[..., 1::2]
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    o1 = (x1 * cos - x2 * sin).astype(x.dtype)
    o2 = (x2 * cos + x1 * sin).astype(x.dtype)
    if is_neox:
        return jnp.concatenate([o1, o2], axis=-1)
    return jnp.stack([o1, o2], axis=-1).reshape(x.shape)


@kernel_registry.register("qk_norm_rope", "jnp")
def qk_norm_rope_jnp(
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
    # oracle = the sequential composition the fused pallas kernel replaces
    d = qk.shape[-1] // 2 if inner_dim is None else inner_dim
    q = rms_norm_jnp(qk[..., :d], gamma_q, eps)
    k = rms_norm_jnp(qk[..., d : 2 * d], gamma_k, eps)
    b, s, _ = qk.shape
    q = _rotate(q.reshape(b, s, -1, head_size), cos, sin, is_neox)
    k = _rotate(k.reshape(b, s, -1, head_size), cos, sin, is_neox)
    return q.reshape(b, s, d), k.reshape(b, s, d)


@kernel_registry.register("qk_norm_rope2", "jnp")
def qk_norm_rope2_jnp(
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
    # oracle = the sequential composition (split-operand qk_norm_rope)
    b, s, d = q.shape
    qn = rms_norm_jnp(q, gamma_q, eps)
    kn = rms_norm_jnp(k, gamma_k, eps)
    qn = _rotate(qn.reshape(b, s, -1, head_size), cos, sin, is_neox)
    kn = _rotate(kn.reshape(b, s, -1, head_size), cos, sin, is_neox)
    return qn.reshape(b, s, d), kn.reshape(b, s, d)


@kernel_registry.register("rotembd", "jnp")
def rotary_pos_embedding_jnp(
    query: Array,
    key: Array,
    head_size: int,
    cos: Array,
    sin: Array,
    is_neox: bool = False,
) -> Tuple[Array, Array]:
    qs, ks = query.shape, key.shape
    q4 = query.reshape(qs[0], qs[1], -1, head_size)
    k4 = key.reshape(ks[0], ks[1], -1, head_size)
    q4 = _rotate(q4, cos, sin, is_neox)
    k4 = _rotate(k4, cos, sin, is_neox)
    return q4.reshape(qs), k4.reshape(ks)


@kernel_registry.register("gelu_and_mul", "jnp")
def gelu_and_mul_jnp(x: Array) -> Array:
    d = x.shape[-1] // 2
    return x[..., :d] * jax.nn.gelu(x[..., d:], approximate=False)


@kernel_registry.register("quantize_to_int8", "jnp")
def quantize_to_int8_jnp(
    x: Array, symmetric: bool = True
) -> Tuple[Array, Array, Optional[Array]]:
    x32 = x.astype(jnp.float32)
    row_min = jnp.min(x32, axis=-1, keepdims=True)
    row_max = jnp.max(x32, axis=-1, keepdims=True)
    if symmetric:
        abs_max = jnp.maximum(jnp.abs(row_min), jnp.abs(row_max))
        scale = jnp.maximum(abs_max, _EPS_SCALE) / 127.0
        q = jnp.clip(jnp.round(x32 / scale), -128, 127).astype(jnp.int8)
        return q, scale, None
    scale = jnp.maximum(row_max - row_min, _EPS_SCALE) / 255.0
    zp = (-128.0 - jnp.round(row_min / scale)).astype(jnp.int32)
    q = jnp.clip(jnp.round(x32 / scale) + zp.astype(jnp.float32), -128, 127).astype(
        jnp.int8
    )
    return q, scale, zp


@kernel_registry.register("quantize_to_int4", "jnp")
def quantize_to_int4_jnp(x: Array) -> Tuple[Array, Array]:
    """Per-token symmetric int4: scale = rowmax(|x|)/7, q in [-8, 7].

    The W4A4 activation side (SVDQuant-style; the reference has no 4-bit
    path — this is a TPU-motivated extension: s4 x s4 runs the v5e MXU at
    1.15-1.35x the s8 rate at FLUX shapes, BENCH_NOTES 2026-08-19).

    q is returned as int4-range values in an INT8 CARRIER: jnp.int4 arrays
    cannot cross the jit boundary on the axon backend (device_put layout
    RecursionError, measured 2026-08-19); the s4 cast happens in-graph
    inside int4_matmul where XLA fuses it into the MXU dot at full rate."""
    x32 = x.astype(jnp.float32)
    abs_max = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), _EPS_SCALE)
    scale = abs_max / 7.0
    q = jnp.clip(jnp.round(x32 / scale), -8, 7).astype(jnp.int8)
    return q, scale


@kernel_registry.register("int4_matmul", "jnp")
@functools.partial(jax.jit, static_argnums=(4,))
def int4_matmul_jnp(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    out_dtype,
    bias: Optional[Array] = None,
) -> Array:
    # s4 x s4 -> s32 runs natively on the MXU (measured 378 TOPS at 8192^3
    # vs 252 s8); per-token x per-channel dequant in the f32 epilogue.
    # Inputs arrive as int4-range values in int8 carriers (see
    # quantize_to_int4_jnp); the in-graph astype keeps the measured rate.
    # XLA CPU cannot lower an s4 dot — the s8 dot is bit-identical there
    # (values are int4-range), so tests exercise the same math.
    if jax.default_backend() == "cpu":
        acc = jax.lax.dot(a, b, preferred_element_type=jnp.int32)
    else:
        acc = jax.lax.dot(a.astype(jnp.int4), b.astype(jnp.int4),
                          preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (
        scale_a.astype(jnp.float32) * scale_b.astype(jnp.float32).reshape(1, -1)
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


@kernel_registry.register("quantize_to_fp8", "jnp")
def quantize_to_fp8_jnp(x: Array) -> Tuple[Array, Array]:
    x32 = x.astype(jnp.float32)
    abs_max = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), _EPS_SCALE)
    scale = abs_max / _FP8_MAX
    q = jnp.clip(x32 / scale, -_FP8_MAX, _FP8_MAX).astype(jnp.float8_e4m3fn)
    return q, scale


@kernel_registry.register("fp8_matmul", "jnp")
def fp8_matmul_jnp(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    out_dtype,
    bias: Optional[Array] = None,
) -> Array:
    # e4m3 -> bf16 is lossless; MXU accumulates in f32 (CUTLASS-equivalent).
    acc = jnp.dot(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    out = acc * (scale_a.astype(jnp.float32) * scale_b.astype(jnp.float32).reshape(1, -1))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


@kernel_registry.register("int8_matmul", "jnp")
def int8_matmul_jnp(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    out_dtype,
    azp_adj: Array,
    azp: Optional[Array],
    bias: Optional[Array] = None,
) -> Array:
    acc = jax.lax.dot(a, b, preferred_element_type=jnp.int32)
    if azp is not None:
        acc = acc - azp.reshape(-1, 1) * azp_adj.reshape(1, -1)
    out = acc.astype(jnp.float32) * (
        scale_a.astype(jnp.float32) * scale_b.astype(jnp.float32).reshape(1, -1)
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def _split_heads(x: Array, num_heads: int, head_dim: int) -> Array:
    b, s, _ = x.shape
    return x.reshape(b, s, num_heads, head_dim)


@kernel_registry.register("sdpa", "jnp")
def sdpa_jnp(
    query: Array,
    key: Array,
    value: Array,
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    is_causal: bool = False,
    scale: Optional[float] = None,
) -> Array:
    b, sq, _ = query.shape
    skv = key.shape[1]
    q = _split_heads(query, num_q_heads, head_dim)
    k = _split_heads(key, num_kv_heads, head_dim)
    v = _split_heads(value, num_kv_heads, head_dim)
    if num_kv_heads != num_q_heads:
        rep = num_q_heads // num_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if scale is None:
        scale = head_dim**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if is_causal:
        mask = jnp.tril(jnp.ones((sq, skv), dtype=bool), k=skv - sq)
        logits = jnp.where(mask[None, None], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(b, sq, num_q_heads * head_dim).astype(query.dtype)


@kernel_registry.register("sdpa_gather", "jnp")
def sdpa_gather_jnp(
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
    """Oracle: reconstruct the dense block mask from the gather lists and run
    the masked reference attention at (block_q, block_k) granularity."""
    nq, max_nb = block_indices.shape
    nk = -(-key.shape[1] // block_k)
    valid = jnp.arange(max_nb)[None, :] < block_counts  # (nq, max_nb)
    rows = jnp.broadcast_to(jnp.arange(nq)[:, None], (nq, max_nb))
    mask = jnp.zeros((nq, nk), jnp.int32).at[
        rows.reshape(-1), jnp.clip(block_indices, 0, nk - 1).reshape(-1)
    ].max(valid.astype(jnp.int32).reshape(-1))
    mask = jnp.broadcast_to(mask[None, None], (query.shape[0], num_q_heads, nq, nk))
    return sdpa_sparse_jnp(
        query, key, value, num_q_heads, num_kv_heads, head_dim,
        is_causal=False, scale=scale, sparse_mask=mask,
        block_q=block_q, block_k=block_k,
    )


@kernel_registry.register("sdpa_gather_fine", "jnp")
def sdpa_gather_fine_jnp(
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
) -> Array:
    """Oracle: reconstruct the TOKEN-level column mask per q tile from the
    CSR-flat fine gather tables (allowed iff some slot covers the token with
    valid > offset) and run dense masked attention. Jittable: flat slots map
    to rows by searchsorted over the (packed, ascending) row starts; padding
    slots carry valid=0 so the scatter-max ignores them."""
    del group
    b, sq, _ = query.shape
    skv = key.shape[1]
    nq = block_rows.shape[0]
    nfine = -(-skv // fine)
    t_flat = block_indices.shape[0]
    slot = jnp.arange(t_flat)
    r_of_slot = jnp.searchsorted(block_rows[:, 0], slot, side="right") - 1
    valid_grid = jnp.zeros((nq, nfine), jnp.int32).at[
        r_of_slot, block_indices
    ].max(block_valid)
    tok = jnp.arange(skv)
    allowed = (tok % fine)[None, :] < valid_grid[:, tok // fine]  # (nq, skv)
    rowmask = jnp.repeat(allowed, block_q, axis=0)[:sq]  # (sq, skv)

    q = _split_heads(query, num_q_heads, head_dim)
    k = _split_heads(key, num_kv_heads, head_dim)
    v = _split_heads(value, num_kv_heads, head_dim)
    if num_kv_heads != num_q_heads:
        rep = num_q_heads // num_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if scale is None:
        scale = head_dim**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    logits = jnp.where(rowmask[None, None], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    # rows with no allowed column produce a uniform softmax over the min
    # logits; zero them to match the kernel's l==0 -> 0 convention
    probs = jnp.where(rowmask.any(-1)[None, None, :, None], probs, 0.0)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(b, sq, num_q_heads * head_dim).astype(query.dtype)


@kernel_registry.register("sdpa_gather_super", "jnp")
def sdpa_gather_super_jnp(
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
    """Oracle for the superblock gather tables: expand each entry's
    active-sub-block bitmask to fine-block token validity (tail fine block
    capped at the remainder), then reuse the fine oracle's dense masked
    attention. Jittable."""
    del group, slots
    b, sq, _ = query.shape
    skv = key.shape[1]
    nq = block_rows.shape[0]
    sb = superblock
    nfine = -(-skv // fine)
    tail_fid = nfine - 1
    tail_valid = skv - tail_fid * fine
    t_flat = block_indices.shape[0]
    slot = jnp.arange(t_flat)
    r_of_slot = jnp.searchsorted(block_rows[:, 0], slot, side="right") - 1
    sub = jnp.arange(sb)
    fids = block_indices[:, None] * sb + sub[None, :]           # (T, sb)
    active = (block_valbits[:, None] >> sub[None, :]) & 1 == 1  # (T, sb)
    vals = jnp.where(fids == tail_fid, tail_valid, fine)
    vals = jnp.where(active, vals, 0)
    nsup = -(-nfine // sb)
    valid_grid = jnp.zeros((nq, nsup * sb), jnp.int32).at[
        jnp.repeat(r_of_slot[:, None], sb, 1), fids
    ].max(vals)
    tok = jnp.arange(skv)
    allowed = (tok % fine)[None, :] < valid_grid[:, tok // fine]
    rowmask = jnp.repeat(allowed, block_q, axis=0)[:sq]

    q = _split_heads(query, num_q_heads, head_dim)
    k = _split_heads(key, num_kv_heads, head_dim)
    v = _split_heads(value, num_kv_heads, head_dim)
    if num_kv_heads != num_q_heads:
        rep = num_q_heads // num_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if scale is None:
        scale = head_dim**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    logits = jnp.where(rowmask[None, None], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(rowmask.any(-1)[None, None, :, None], probs, 0.0)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(b, sq, num_q_heads * head_dim).astype(query.dtype)


@kernel_registry.register("sdpa_sparse", "jnp")
def sdpa_sparse_jnp(
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
    b, sq, _ = query.shape
    skv = key.shape[1]
    q = _split_heads(query, num_q_heads, head_dim)
    k = _split_heads(key, num_kv_heads, head_dim)
    v = _split_heads(value, num_kv_heads, head_dim)
    if num_kv_heads != num_q_heads:
        rep = num_q_heads // num_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if scale is None:
        scale = head_dim**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    neg = jnp.finfo(jnp.float32).min
    if sparse_mask is not None:
        # expand (B, H, Sq/bq, Skv/bk) block mask to element granularity
        m = sparse_mask.astype(bool)
        m = jnp.repeat(jnp.repeat(m, block_q, axis=2), block_k, axis=3)
        m = m[:, :, :sq, :skv]
        logits = jnp.where(m, logits, neg)
    if is_causal:
        cmask = jnp.tril(jnp.ones((sq, skv), dtype=bool), k=skv - sq)
        logits = jnp.where(cmask[None, None], logits, neg)
    probs = jax.nn.softmax(logits, axis=-1)
    # fully-masked rows produce uniform probs over neg-inf logits -> NaN; zero them
    if sparse_mask is not None:
        row_any = jnp.max(logits, axis=-1, keepdims=True) > neg / 2
        probs = jnp.where(row_any, probs, 0.0)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(b, sq, num_q_heads * head_dim).astype(query.dtype)
