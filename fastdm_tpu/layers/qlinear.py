"""QLinear: THE quantized linear layer (ref: fastdm/layer/qlinear.py).

A QLinear is a param dict (pytree):
    {"w": (K, N) int8|float8_e4m3fn|bf16,
     "scale": (N,) float32 per-output-channel weight scale (quantized only),
     "colsum": (N,) int32 column sums of int8 weights (int8 only, azp_adj),
     "bias": (N,) bf16 | absent}

Weights are quantized once at load time (per-channel symmetric); activations
are quantized per-token at each call (int8 asymmetric / fp8 symmetric), then
the dispatched W8A8 matmul runs with the dequant epilogue fused
(ref math: doc/introduction.md:38-42).

The quantization mode is carried by the weight dtype, so the apply function
branches at trace time with no extra static config — mirroring the reference's
dtype-driven dispatch (fastdm/layer/qlinear.py:69-76).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from fastdm_tpu.kernels import (
    fp8_matmul,
    int4_matmul,
    int8_matmul,
    quantize_to_fp8,
    quantize_to_int4,
    quantize_to_int8,
)

Array = jax.Array
Params = Dict[str, Array]

_FP8_MAX = 448.0

# W4A4 low-rank branch rank (SVDQuant, arXiv:2411.05007: a rank-32 bf16
# side branch absorbs the weight outliers the 4-bit grid cannot represent).
INT4_LOWRANK_RANK = 32


def pack_int4(q: Array) -> Array:
    """Pack int4-range values (int8 carrier, (..., K, N)) into nibbles:
    (..., K//2, N) int8, low nibble = row k, high nibble = row k + K//2.

    HALVES layout, not even/odd interleave: unpacking is then a plain
    two-segment concat along K — the interleaved layout's unpack is a
    sublane relayout that XLA lowers ~4.5x over the bandwidth floor
    (measured ~520 ms/step through FLUX int4p, BENCH_NOTES 2026-08-19).
    Under tensor parallelism a tp-sharded packed-K dim no longer lines up
    with the contiguously-sharded activation K after the concat; GSPMD
    reshards automatically (correctness is sharding-independent), and the
    capacity use case — fitting Wan-A14B / Qwen-scale on ONE 16 GB v5e —
    runs on a single chip where no resharding exists.

    0.5 byte/param in HBM (jnp.int4 cannot cross the jit boundary on this
    backend — BENCH_NOTES 2026-08-19); packed weights are unpacked in-graph
    per scanned block, so the transient cost is ONE block's weights while
    residency halves. With the halves layout this is BOTH the capacity form
    (fits Wan-A14B on a single 16 GB v5e, BENCH_NOTES residency table) and
    the SPEED form: halving the weight HBM reads outruns the concat-unpack
    cost (full FLUX 25-step: int4p 24.89 s vs int4 26.23 s uncached,
    13.07 s vs 13.70 s TeaCache — BENCH_NOTES 2026-08-19)."""
    k = q.shape[-2]
    if k % 2:
        raise ValueError(f"pack_int4 needs even K, got {k}")
    lo = q[..., : k // 2, :] & 0x0F
    hi = jnp.left_shift(q[..., k // 2 :, :], 4)
    return (lo | hi).astype(jnp.int8)


def unpack_int4(p: Array) -> Array:
    """Inverse of pack_int4: (..., K//2, N) int8 -> (..., K, N) int4-range.

    Sign extension via arithmetic shifts (jnp.right_shift on signed ints is
    arithmetic; left shift wraps modularly — both XLA-defined). The two
    halves concatenate contiguously (see pack_int4 layout note)."""
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    return jnp.concatenate([lo, hi], axis=-2)


def _lowrank_approx(w32: Array, rank: int, *, iters: int = 2) -> tuple:
    """Rank-`rank` approximation of (K, N) w32 by randomized subspace
    iteration (Halko et al. 2011) — pure matmuls, runs on any backend.

    Returns (u (K, r) f32, v (r, N) f32) with w32 ≈ u @ v."""
    k_dim = w32.shape[0]
    oversample = min(rank + 8, min(w32.shape))
    omega = jax.random.normal(jax.random.key(0x5bd), (w32.shape[1], oversample),
                              jnp.float32)
    y = w32 @ omega  # (K, r+p)
    for _ in range(iters):
        q, _ = jnp.linalg.qr(y)
        y = w32 @ (w32.T @ q)
    q, _ = jnp.linalg.qr(y)  # (K, r+p) orthonormal
    b = q.T @ w32  # (r+p, N)
    # SVD of the small (r+p, N) factor picks the TOP-rank directions
    u_b, s_b, vt_b = jnp.linalg.svd(b, full_matrices=False)
    u = (q @ u_b[:, :rank]) * s_b[:rank][None, :]
    del k_dim
    return u, vt_b[:rank]


def quantize_weight(w: Array, quant: Optional[str], bias: Optional[Array] = None) -> Params:
    """Quantize a (K, N) weight at load time.

    quant: None/"bf16" (no quant), "int8" (per-channel symmetric + colsum),
    "fp8" (per-channel symmetric e4m3), "int4" (W4A4 residual + SVDQuant
    low-rank branch — TPU extension, no reference counterpart), "int4p"
    (same values as int4, packed two-per-byte in HBM: the 0.5 byte/param
    capacity form, unpacked in-graph before the dot).
    (ref: QLinear.weight_loading_and_quant, fastdm/layer/qlinear.py:18-54)
    """
    params: Params = {}
    if quant in (None, "bf16"):
        params["w"] = w.astype(jnp.bfloat16)
    elif quant == "int8":
        w32 = w.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(w32), axis=0), 1e-12)
        scale = amax / 127.0
        q = jnp.clip(jnp.round(w32 / scale[None, :]), -128, 127).astype(jnp.int8)
        params["w"] = q
        params["scale"] = scale
        params["colsum"] = jnp.sum(q.astype(jnp.int32), axis=0)
    elif quant == "fp8":
        w32 = w.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(w32), axis=0), 1e-12)
        scale = amax / _FP8_MAX
        q = jnp.clip(w32 / scale[None, :], -_FP8_MAX, _FP8_MAX).astype(jnp.float8_e4m3fn)
        params["w"] = q
        params["scale"] = scale
    elif quant in ("int4", "int4p"):
        # W4A4 (TPU extension; the reference stops at 8-bit): SVDQuant-style
        # split w = (u @ v) + residual, residual per-channel symmetric int4.
        # The bf16 low-rank branch carries the outliers; the s4 x s4 dot runs
        # the MXU above its s8 rate (BENCH_NOTES 2026-08-19). Values live in
        # an int8 carrier under the "w4" key — jnp.int4 arrays cannot cross
        # the jit boundary on the axon backend; the s4 cast happens in-graph.
        # "int4p" packs two values per byte ("w4p", capacity form — see
        # pack_int4).
        w32 = w.astype(jnp.float32)
        u, v = _lowrank_approx(w32, INT4_LOWRANK_RANK)
        resid = w32 - u @ v
        amax = jnp.maximum(jnp.max(jnp.abs(resid), axis=0), 1e-12)
        scale = amax / 7.0
        q4 = jnp.clip(jnp.round(resid / scale[None, :]), -8, 7).astype(jnp.int8)
        if quant == "int4p":
            params["w4p"] = pack_int4(q4)
        else:
            params["w4"] = q4
        params["scale"] = scale
        params["lora_u"] = u.astype(jnp.bfloat16)
        params["lora_v"] = v.astype(jnp.bfloat16)
    else:
        raise ValueError(f"unsupported quant type {quant!r}")
    if bias is not None:
        params["bias"] = bias.astype(jnp.bfloat16)
    return params


def fuse_and_quantize(
    weights: Sequence[Array], biases: Sequence[Optional[Array]], quant: Optional[str]
) -> Params:
    """Concatenate fused projections (qkv / kv) along N, then quantize.

    Each weight is (K, N_i) — already transposed from checkpoint (out,in) layout
    by the loader. (ref: fastdm/layer/qlinear.py:22-31)
    """
    w = weights[0] if len(weights) == 1 else jnp.concatenate(list(weights), axis=1)
    bias = None
    if biases and any(b is not None for b in biases):
        # a mixed set (some projections bias-free) still needs the full-width
        # concat — zero-fill the missing segments rather than silently
        # dropping every bias (or crashing) based on biases[0] alone
        segs = [
            b if b is not None else jnp.zeros((wi.shape[1],), jnp.float32)
            for b, wi in zip(biases, weights)
        ]
        bias = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=0)
    return quantize_weight(w, quant, bias)


def qlinear_random(
    key: Array, in_features: int, out_features: int, *, bias: bool = True,
    quant: Optional[str] = None, w_std: float = 0.02,
) -> Params:
    """Random-initialized QLinear (profiling / tests without checkpoints).

    Quantized variants are generated DIRECTLY in the target dtype — no f32
    master is ever materialized. A 12B-model random init through the
    f32->quantize path transiently holds gigabytes of masters, which the
    lazy-committing TPU allocator never reclaims in time (observed OOM)."""
    kw, kb = jax.random.split(key)
    b = jax.random.normal(kb, (out_features,), jnp.bfloat16) * 0.01 if bias else None
    params: Params = {}
    if quant == "int8":
        params["w"] = jax.random.randint(kw, (in_features, out_features), -127, 128, jnp.int8)
        params["scale"] = jnp.full((out_features,), w_std / 127.0, jnp.float32)
        params["colsum"] = jnp.sum(params["w"].astype(jnp.int32), axis=0)
    elif quant == "fp8":
        # e4m3fn has no inf — clip before the cast or tails become NaN
        params["w"] = jnp.clip(
            jax.random.normal(kw, (in_features, out_features), jnp.bfloat16) * 150.0,
            -448.0, 448.0,
        ).astype(jnp.float8_e4m3fn)
        params["scale"] = jnp.full((out_features,), w_std / 448.0, jnp.float32)
    elif quant in ("int4", "int4p"):
        ku, kv = jax.random.split(kw)
        q4 = jax.random.randint(
            kw, (in_features, out_features), -8, 8, jnp.int8)
        if quant == "int4p":
            params["w4p"] = pack_int4(q4)
        else:
            params["w4"] = q4
        params["scale"] = jnp.full((out_features,), w_std / 7.0, jnp.float32)
        r = min(INT4_LOWRANK_RANK, in_features, out_features)
        params["lora_u"] = jax.random.normal(ku, (in_features, r), jnp.bfloat16) * 0.01
        params["lora_v"] = jax.random.normal(kv, (r, out_features), jnp.bfloat16) * 0.01
    else:
        params["w"] = jax.random.normal(kw, (in_features, out_features), jnp.bfloat16) * w_std
    if b is not None:
        params["bias"] = b
    return params


def qlinear_slice_out(params: Params, start: int, stop: int) -> Params:
    """View of a QLinear restricted to output columns [start, stop).

    Every per-output-channel leaf (weight columns, scale, colsum, bias,
    lora_v) is sliced along N; per-input leaves (lora_u) pass through.
    Exact: qlinear_apply(slice) == qlinear_apply(full)[..., start:stop] for
    all quant modes (per-token activation quantization is column-
    independent). Used to split a fused QKV projection into three matmuls
    so no (S, 3D) intermediate is ever materialized (A14B HBM capacity)."""
    out = {}
    for key, leaf in params.items():
        if key in ("w", "w4", "w4p"):
            out[key] = leaf[..., :, start:stop]
        elif key in ("scale", "colsum", "bias", "zeros"):
            out[key] = leaf[..., start:stop]
        elif key == "lora_v":
            out[key] = leaf[..., :, start:stop]
        else:  # lora_u and any per-K leaf
            out[key] = leaf
    return out


def qlinear_apply(params: Params, x: Array, chunk_tokens: int = 0) -> Array:
    """y = x @ w (+ bias), with per-token activation quantization when the
    weight is int8/fp8. x: (..., K) -> (..., N). (ref: QLinear.forward)

    chunk_tokens > 0 (and dividing the flattened row count): lax.scan over
    row chunks. Exact — quantization and epilogue are per-row — and bounds
    the matmul's quant/accumulator/epilogue transients to O(chunk * N)
    instead of O(rows * N). At Wan-A14B 720p/81f the un-chunked QKV
    projection (75600 x 15360) materializes 4.3 GiB f32 epilogue temps —
    the residual OOM after FFN chunking (doc/A14B_E2E_r4.log)."""
    orig_shape = x.shape
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    if chunk_tokens and rows > chunk_tokens and rows % chunk_tokens == 0:
        # unrolled concat, NOT lax.scan: scan's stacked output gets a
        # while-loop layout that forces a full-size copy at the next
        # custom-call boundary (738 MB per projection at A14B 720p/81f);
        # concat lets each chunk's epilogue write straight into its slice
        x2 = x.reshape(rows, orig_shape[-1])
        ys = [
            qlinear_apply(params, x2[i : i + chunk_tokens])
            for i in range(0, rows, chunk_tokens)
        ]
        return jnp.concatenate(ys, axis=0).reshape(
            *orig_shape[:-1], ys[0].shape[-1])
    bias = params.get("bias")
    x2 = x.reshape(-1, orig_shape[-1])
    if "w4" in params or "w4p" in params:
        # int4 lives in an int8 carrier — key-driven dispatch; the packed
        # capacity form unpacks in-graph (one block's weights transient)
        w = params["w4"] if "w4" in params else unpack_int4(params["w4p"])
        xq, xs = quantize_to_int4(x2)
        out = int4_matmul(xq, w, xs, params["scale"], x.dtype, bias)
        # SVDQuant low-rank branch: the bf16 rank-32 side path carries the
        # outlier mass; its cost is ~r/K of the main dot (negligible)
        out = out + (
            (x2.astype(jnp.bfloat16) @ params["lora_u"]) @ params["lora_v"]
        ).astype(out.dtype)
        return out.reshape(*orig_shape[:-1], w.shape[-1])
    w = params["w"]
    if w.dtype == jnp.int8:
        xq, xs, xzp = quantize_to_int8(x2, symmetric=False)
        out = int8_matmul(
            xq, w, xs, params["scale"], x.dtype, params["colsum"], xzp, bias
        )
    elif w.dtype == jnp.float8_e4m3fn:
        xq, xs = quantize_to_fp8(x2)
        out = fp8_matmul(xq, w, xs, params["scale"], x.dtype, bias)
    else:
        out = jnp.dot(x2, w.astype(x.dtype), preferred_element_type=jnp.float32)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        out = out.astype(x.dtype)
    return out.reshape(*orig_shape[:-1], w.shape[-1])
