"""Pallas TPU elementwise kernels: fused rms_norm, rotary embedding,
gelu-and-mul, per-token int8/fp8 quantization.

TPU-native analogs of the reference's CUDA elementwise set (ref:
csrc/elmwise_ops.cu — rms_norm_kernel :57-85, fused-QKV RoPE :86-168,
per-token quant :251-388) and its triton twins (fastdm/kernel/triton/).

The registry's "auto" policy keeps these on the jnp backend — XLA fuses
them into producers/consumers, which a standalone pallas launch cannot
(measured in BENCH_NOTES.md). They exist as selectable backends
(FASTDM_KERNEL_BACKEND=pallas) so every reference kernel family has a
hand-written TPU twin, and as the basis for future fusion experiments.

Each kernel tiles rows over a 1D grid with the full feature dim resident in
VMEM (diffusion feature dims are 128..21504 — comfortably under the budget).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastdm_tpu.kernels.registry import kernel_registry

_INTERPRET = os.environ.get("FASTDM_PALLAS_INTERPRET", "0") == "1"

Array = jax.Array

_EPS_SCALE = 1e-8
_FP8_MAX = 448.0


def _row_grid(n_rows: int, width: int = 4096):
    # Mosaic stack-allocates the f32 intermediates of the kernel body, so the
    # effective per-row footprint is several f32 copies of the block — budget
    # ~1MB of input rows to stay far from the 16MB scoped-vmem cap
    budget_rows = (1024 * 1024) // (width * 4)
    br = max(8, min(256, budget_rows // 8 * 8, max(8, n_rows)))
    pad = (-n_rows) % br
    return br, pad, (n_rows + pad) // br


def _pad_rows(x, pad):
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


# ------------------------------------------------------------------ rms_norm


def _rms_kernel(x_ref, w_ref, o_ref, *, eps, has_w):
    x = x_ref[...].astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    if has_w:
        y = y * w_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@kernel_registry.register("rmsnorm", "pallas")
def rms_norm_pallas(x: Array, weight: Optional[Array], eps: float) -> Array:
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    br, pad, nb = _row_grid(x2.shape[0], shape[-1])
    x2 = _pad_rows(x2, pad)
    has_w = weight is not None
    in_specs = [pl.BlockSpec((br, shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    operands = [x2]
    if has_w:
        in_specs.append(
            pl.BlockSpec((1, shape[-1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(weight.reshape(1, -1))

    def kernel(*refs):
        if has_w:
            x_ref, w_ref, o_ref = refs
        else:
            (x_ref, o_ref), w_ref = refs, None
        _rms_kernel(x_ref, w_ref, o_ref, eps=eps, has_w=has_w)

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=_INTERPRET,
    )(*operands)
    return out[: x.reshape(-1, shape[-1]).shape[0]].reshape(shape)


# ------------------------------------------------------------ gelu_and_mul


def _erf(z):
    # Mosaic has no erf/erfc lowering; Abramowitz & Stegun 7.1.26 rational
    # approximation (|error| < 1.5e-7, far below bf16 resolution) using exp
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    s = jnp.sign(z)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * za)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-za * za))


def _gelu_mul_kernel(x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    d = x.shape[-1] // 2
    g = x[..., d:]
    gelu = 0.5 * g * (1.0 + _erf(g * 0.7071067811865476))
    o_ref[...] = (x[..., :d] * gelu).astype(o_ref.dtype)


@kernel_registry.register("gelu_and_mul", "pallas")
def gelu_and_mul_pallas(x: Array) -> Array:
    shape = x.shape
    d2 = shape[-1]
    x2 = x.reshape(-1, d2)
    br, pad, nb = _row_grid(x2.shape[0], shape[-1])
    x2 = _pad_rows(x2, pad)
    out = pl.pallas_call(
        _gelu_mul_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((br, d2), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, d2 // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], d2 // 2), x.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=_INTERPRET,
    )(x2)
    return out[: x.reshape(-1, d2).shape[0]].reshape(shape[:-1] + (d2 // 2,))


# ---------------------------------------------------------------- quantize


def _quant_int8_kernel(x_ref, q_ref, s_ref, zp_ref, *, symmetric):
    x = x_ref[...].astype(jnp.float32)
    row_min = jnp.min(x, axis=-1, keepdims=True)
    row_max = jnp.max(x, axis=-1, keepdims=True)
    if symmetric:
        amax = jnp.maximum(jnp.abs(row_min), jnp.abs(row_max))
        scale = jnp.maximum(amax, _EPS_SCALE) / 127.0
        q_ref[...] = jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)
        s_ref[...] = jnp.broadcast_to(scale, s_ref.shape)
    else:
        scale = jnp.maximum(row_max - row_min, _EPS_SCALE) / 255.0
        zp = -128.0 - jnp.round(row_min / scale)
        q_ref[...] = jnp.clip(jnp.round(x / scale) + zp, -128, 127).astype(jnp.int8)
        s_ref[...] = jnp.broadcast_to(scale, s_ref.shape)
        zp_ref[...] = jnp.broadcast_to(zp.astype(jnp.int32), zp_ref.shape)


@kernel_registry.register("quantize_to_int8", "pallas")
def quantize_to_int8_pallas(
    x: Array, symmetric: bool = True
) -> Tuple[Array, Array, Optional[Array]]:
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    n = x2.shape[0]
    br, pad, nb = _row_grid(x2.shape[0], shape[-1])
    x2 = _pad_rows(x2, pad)
    # scale/zp blocks keep a 128-lane minor dim (scalar-per-row outputs are
    # stored broadcast and sliced to column 0 afterwards)
    lanes = 128
    out_shapes = [
        jax.ShapeDtypeStruct(x2.shape, jnp.int8),
        jax.ShapeDtypeStruct((x2.shape[0], lanes), jnp.float32),
        jax.ShapeDtypeStruct((x2.shape[0], lanes), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((br, shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((br, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((br, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    q, s, zp = pl.pallas_call(
        functools.partial(_quant_int8_kernel, symmetric=symmetric),
        grid=(nb,),
        in_specs=[pl.BlockSpec((br, shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=_INTERPRET,
    )(x2)
    q = q[:n].reshape(shape)
    scale = s[:n, :1].reshape(shape[:-1] + (1,))
    if symmetric:
        return q, scale, None
    return q, scale, zp[:n, :1].reshape(shape[:-1] + (1,))


def _quant_fp8_kernel(x_ref, q_ref, s_ref):
    x = x_ref[...].astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), _EPS_SCALE)
    scale = amax / _FP8_MAX
    q_ref[...] = jnp.clip(x / scale, -_FP8_MAX, _FP8_MAX).astype(jnp.float8_e4m3fn)
    s_ref[...] = jnp.broadcast_to(scale, s_ref.shape)


@kernel_registry.register("quantize_to_fp8", "pallas")
def quantize_to_fp8_pallas(x: Array) -> Tuple[Array, Array]:
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    n = x2.shape[0]
    br, pad, nb = _row_grid(x2.shape[0], shape[-1])
    x2 = _pad_rows(x2, pad)
    lanes = 128
    q, s = pl.pallas_call(
        _quant_fp8_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((br, shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((br, shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x2.shape, jnp.float8_e4m3fn),
            jax.ShapeDtypeStruct((x2.shape[0], lanes), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=_INTERPRET,
    )(x2)
    return q[:n].reshape(shape), s[:n, :1].reshape(shape[:-1] + (1,))


# ------------------------------------------------------------------- rope


def _rope_kernel(x_ref, cosf_ref, sinf_ref, o_ref, *, is_neox, head_size):
    # pure 2D: rows = sequence positions, lanes = flattened H*D. cosf/sinf
    # are full-width tables (head-tiled outside the kernel; Mosaic has no
    # strided gather), and rotate() is expressed with lane rolls masked by
    # in-head position — pair/half rolls never cross a head boundary.
    x = x_ref[...].astype(jnp.float32)           # (bs, H*D)
    cosf = cosf_ref[...]
    sinf = sinf_ref[...]
    j = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % head_size
    if is_neox:
        h2 = head_size // 2
        rot = jnp.where(j < h2, -jnp.roll(x, -h2, axis=-1), jnp.roll(x, h2, axis=-1))
    else:
        even = (j % 2) == 0
        rot = jnp.where(even, -jnp.roll(x, -1, axis=-1), jnp.roll(x, 1, axis=-1))
    o_ref[...] = (x * cosf + rot * sinf).astype(o_ref.dtype)


def _rope_one(x3: Array, cosf: Array, sinf: Array, is_neox: bool, head_size: int) -> Array:
    b, s, hd = x3.shape
    x2 = x3.reshape(b * s, hd)
    cosf = jnp.broadcast_to(cosf[None], (b, s, hd)).reshape(b * s, hd)
    sinf = jnp.broadcast_to(sinf[None], (b, s, hd)).reshape(b * s, hd)
    br, pad, nb = _row_grid(x2.shape[0], hd)
    x2, cosf, sinf = _pad_rows(x2, pad), _pad_rows(cosf, pad), _pad_rows(sinf, pad)
    out = pl.pallas_call(
        functools.partial(_rope_kernel, is_neox=is_neox, head_size=head_size),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((br, hd), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, hd), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, hd), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, hd), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x3.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=_INTERPRET,
    )(x2, cosf, sinf)
    return out[: b * s].reshape(b, s, hd)


def _qk_norm_rope_kernel(x_ref, gq_ref, gk_ref, cosf_ref, sinf_ref,
                         q_ref, k_ref, *, eps, d, head_size, is_neox, has_g):
    """Fused RMSNorm(q) + RMSNorm(k) + RoPE in one VMEM pass.

    Why fused (not style — HBM liveness): composed XLA-side, the rope's
    interleaved pair access is a fusion boundary, and whatever crosses it is
    materialized in HBM at the dtype XLA picks — at the Wan-A14B 720p/81f
    shape that was 2x 1.44 GiB f32 (then, sliced-first, 4x 0.72 GiB f32),
    the allocations that OOM'd the full-denoiser compile (2026-08-20). In
    VMEM nothing is materialized and the q/k stream is read+written exactly
    once. rot() uses the same masked lane-roll trick as _rope_kernel
    (Mosaic has no strided gather); rolls of 1 never cross a pair, and the
    j-mask keeps head boundaries intact across the full fused width.
    Between norm and rope the value is rounded to the I/O dtype so the
    result tracks the sequential jnp composition (oracle parity)."""
    x = x_ref[...].astype(jnp.float32)
    q, k = x[:, :d], x[:, d:]
    _norm_rope_both(q, k, gq_ref, gk_ref, cosf_ref, sinf_ref, q_ref, k_ref,
                    eps=eps, d=d, head_size=head_size, is_neox=is_neox,
                    has_g=has_g)


def _qk_norm_rope2_kernel(q_in_ref, k_in_ref, gq_ref, gk_ref, cosf_ref,
                          sinf_ref, q_ref, k_ref, *, eps, d, head_size,
                          is_neox, has_g):
    """Two-operand form of _qk_norm_rope_kernel: q and k arrive as separate
    (br, d) blocks (the split-QKV projection path, models/wan.py)."""
    _norm_rope_both(q_in_ref[...].astype(jnp.float32),
                    k_in_ref[...].astype(jnp.float32),
                    gq_ref, gk_ref, cosf_ref, sinf_ref, q_ref, k_ref,
                    eps=eps, d=d, head_size=head_size, is_neox=is_neox,
                    has_g=has_g)


def _norm_rope_both(q, k, gq_ref, gk_ref, cosf_ref, sinf_ref, q_ref, k_ref,
                    *, eps, d, head_size, is_neox, has_g):
    def norm(v, g_ref):
        var = jnp.mean(jnp.square(v), axis=-1, keepdims=True)
        y = v * jax.lax.rsqrt(var + eps)
        if has_g:
            y = y * g_ref[...].astype(jnp.float32)
        return y.astype(q_ref.dtype).astype(jnp.float32)

    q = norm(q, gq_ref)
    k = norm(k, gk_ref)
    reps = d // head_size
    cosf = jnp.concatenate([cosf_ref[...]] * reps, axis=-1)
    sinf = jnp.concatenate([sinf_ref[...]] * reps, axis=-1)
    j = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1) % head_size

    def rot(v):
        if is_neox:
            h2 = head_size // 2
            return jnp.where(j < h2, -jnp.roll(v, -h2, axis=-1),
                             jnp.roll(v, h2, axis=-1))
        even = (j % 2) == 0
        return jnp.where(even, -jnp.roll(v, -1, axis=-1),
                         jnp.roll(v, 1, axis=-1))

    q_ref[...] = (q * cosf + rot(q) * sinf).astype(q_ref.dtype)
    k_ref[...] = (k * cosf + rot(k) * sinf).astype(k_ref.dtype)


@kernel_registry.register("qk_norm_rope", "pallas")
def qk_norm_rope_pallas(
    qk: Array, gamma_q: Optional[Array], gamma_k: Optional[Array],
    head_size: int, cos: Array, sin: Array, is_neox: bool = False,
    eps: float = 1e-6, inner_dim: Optional[int] = None,
) -> Tuple[Array, Array]:
    """qk: (B, S, 2D) — the [q|k] channels of a fused qkv projection — or
    the FULL (B, S, 3D) qkv with inner_dim=D (preferred: the q|k channels
    are carved by the BlockSpec, so no 2D-wide slice copy of the projection
    is ever materialized — 1.44 GiB at the A14B shape). cos/sin:
    (S, head_size//2) f32. Returns rope(norm(q)), rope(norm(k)), each
    (B, S, D), in qk's dtype. See _qk_norm_rope_kernel for why this
    exists; wired as the wan self-attention preamble (models/wan.py)."""
    b, s, w = qk.shape
    d = w // 2 if inner_dim is None else inner_dim
    dd = 2 * d
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)
    if is_neox:
        cosf = jnp.concatenate([cos, cos], axis=-1)
        sinf = jnp.concatenate([sin, sin], axis=-1)
    else:
        cosf = jnp.repeat(cos, 2, axis=-1)
        sinf = jnp.repeat(sin, 2, axis=-1)
    # per-row tables at (B*S, head_size) — 38 MiB f32 at the A14B shape,
    # NOT the (S, H*D) 1.44 GiB full-width tiling the standalone rope pays
    cosf = jnp.broadcast_to(cosf[None], (b, s, head_size)).reshape(-1, head_size)
    sinf = jnp.broadcast_to(sinf[None], (b, s, head_size)).reshape(-1, head_size)
    x2 = qk.reshape(b * s, w)  # full width; the BlockSpec reads cols [0:2D]
    br, pad, nb = _row_grid(x2.shape[0], dd)
    x2 = _pad_rows(x2, pad)
    cosf = _pad_rows(cosf, pad)
    sinf = _pad_rows(sinf, pad)
    has_g = gamma_q is not None
    in_specs = [
        pl.BlockSpec((br, dd), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    operands = [x2]
    if has_g:
        in_specs += [
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        operands += [gamma_q.reshape(1, -1), gamma_k.reshape(1, -1)]
    in_specs += [
        pl.BlockSpec((br, head_size), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((br, head_size), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    operands += [cosf, sinf]

    def kernel(*refs):
        if has_g:
            x_ref, gq_ref, gk_ref, cf_ref, sf_ref, q_ref, k_ref = refs
        else:
            (x_ref, cf_ref, sf_ref, q_ref, k_ref) = refs
            gq_ref = gk_ref = None
        _qk_norm_rope_kernel(x_ref, gq_ref, gk_ref, cf_ref, sf_ref,
                             q_ref, k_ref, eps=eps, d=d,
                             head_size=head_size, is_neox=is_neox,
                             has_g=has_g)

    q, k = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((x2.shape[0], d), qk.dtype),
            jax.ShapeDtypeStruct((x2.shape[0], d), qk.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_INTERPRET,
    )(*operands)
    return q[: b * s].reshape(b, s, d), k[: b * s].reshape(b, s, d)


@kernel_registry.register("qk_norm_rope2", "pallas")
def qk_norm_rope2_pallas(
    q: Array, k: Array, gamma_q: Optional[Array], gamma_k: Optional[Array],
    head_size: int, cos: Array, sin: Array, is_neox: bool = False,
    eps: float = 1e-6,
) -> Tuple[Array, Array]:
    """Two-operand qk_norm_rope: q, k each (B, S, D) from separate
    projections (split-QKV mode). Same fused VMEM pass, same semantics."""
    b, s, d = q.shape
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)
    if is_neox:
        cosf = jnp.concatenate([cos, cos], axis=-1)
        sinf = jnp.concatenate([sin, sin], axis=-1)
    else:
        cosf = jnp.repeat(cos, 2, axis=-1)
        sinf = jnp.repeat(sin, 2, axis=-1)
    cosf = jnp.broadcast_to(cosf[None], (b, s, head_size)).reshape(-1, head_size)
    sinf = jnp.broadcast_to(sinf[None], (b, s, head_size)).reshape(-1, head_size)
    q2 = q.reshape(b * s, d)
    k2 = k.reshape(b * s, d)
    br, pad, nb = _row_grid(q2.shape[0], d)
    q2, k2 = _pad_rows(q2, pad), _pad_rows(k2, pad)
    cosf, sinf = _pad_rows(cosf, pad), _pad_rows(sinf, pad)
    has_g = gamma_q is not None
    in_specs = [
        pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    operands = [q2, k2]
    if has_g:
        in_specs += [
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        operands += [gamma_q.reshape(1, -1), gamma_k.reshape(1, -1)]
    in_specs += [
        pl.BlockSpec((br, head_size), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((br, head_size), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    operands += [cosf, sinf]

    def kernel(*refs):
        if has_g:
            qi, ki, gq_ref, gk_ref, cf_ref, sf_ref, q_ref, k_ref = refs
        else:
            (qi, ki, cf_ref, sf_ref, q_ref, k_ref) = refs
            gq_ref = gk_ref = None
        _qk_norm_rope2_kernel(qi, ki, gq_ref, gk_ref, cf_ref, sf_ref,
                              q_ref, k_ref, eps=eps, d=d,
                              head_size=head_size, is_neox=is_neox,
                              has_g=has_g)

    qo, ko = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((q2.shape[0], d), q.dtype),
            jax.ShapeDtypeStruct((q2.shape[0], d), k.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_INTERPRET,
    )(*operands)
    return qo[: b * s].reshape(b, s, d), ko[: b * s].reshape(b, s, d)


@kernel_registry.register("rotembd", "pallas")
def rotary_pos_embedding_pallas(
    query: Array, key: Array, head_size: int, cos: Array, sin: Array,
    is_neox: bool = False,
) -> Tuple[Array, Array]:
    qs, ks = query.shape, key.shape
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)
    # full-width tables (XLA-side): neox tiles halves, interleaved repeats
    # each angle across its lane pair; the sign of the rotated term folds
    # into the kernel's rotate() so sinf stays positive
    if is_neox:
        cosf = jnp.concatenate([cos, cos], axis=-1)
        sinf = jnp.concatenate([sin, sin], axis=-1)
    else:
        cosf = jnp.repeat(cos, 2, axis=-1)
        sinf = jnp.repeat(sin, 2, axis=-1)
    # q and k may carry different head counts (GQA); tile per tensor
    q = _rope_one(query, jnp.tile(cosf, (1, qs[-1] // head_size)),
                  jnp.tile(sinf, (1, qs[-1] // head_size)), is_neox, head_size)
    k = _rope_one(key, jnp.tile(cosf, (1, ks[-1] // head_size)),
                  jnp.tile(sinf, (1, ks[-1] // head_size)), is_neox, head_size)
    return q, k
