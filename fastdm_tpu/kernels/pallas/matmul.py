"""Pallas TPU W8A8 matmul kernels (int8 + fp8).

TPU-native replacement for the reference's CUTLASS scaled-mm extensions
(ref: csrc/gemm/*_w8a8_int8.cu, *_w8a8_fp8.cu; epilogue math
doc/introduction.md:38-42). The MXU multiplies int8 natively with int32
accumulation; fp8 (e4m3) is upcast losslessly to bf16 and accumulated in f32
(matching the CUTLASS f32-accumulate semantics).

Design: 2D grid over (M/bm, N/bn) output tiles with the full K dimension
resident per tile — diffusion-transformer K ranges 128..21504, so an int8
(bm, K) activation block tops out around 2.8 MB at bm=128, well inside VMEM.
The asymmetric-zero-point adjustment, per-token x per-channel scaling, and
bias add run in the same kernel (fused epilogue, one HBM round-trip).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastdm_tpu.kernels.registry import kernel_registry

# CPU tests run the kernels through the (fast) Pallas interpreter; on TPU this
# must be unset so Mosaic compiles them.
_INTERPRET = os.environ.get("FASTDM_PALLAS_INTERPRET", "0") == "1"


Array = jax.Array


def _pad_dim(x: Array, axis: int, mult: int) -> Array:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _int8_mm_kernel(a_ref, b_ref, sa_ref, sb_ref, azp_ref, adj_ref, bias_ref, o_ref):
    acc = jax.lax.dot(a_ref[...], b_ref[...], preferred_element_type=jnp.int32)
    if azp_ref is not None:
        acc = acc - azp_ref[...] * adj_ref[...]
    out = acc.astype(jnp.float32) * (sa_ref[...] * sb_ref[...])
    if bias_ref is not None:
        out = out + bias_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _fp8_mm_kernel(a_ref, b_ref, sa_ref, sb_ref, bias_ref, o_ref):
    acc = jnp.dot(
        a_ref[...].astype(jnp.bfloat16),
        b_ref[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    out = acc * (sa_ref[...] * sb_ref[...])
    if bias_ref is not None:
        out = out + bias_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "has_azp", "has_bias")
)
def _int8_matmul_pallas(
    a, b, scale_a, scale_b, azp, azp_adj, bias, *, out_dtype, block_m, block_n, has_azp, has_bias
):
    m, k = a.shape
    n = b.shape[1]
    bm, bn = min(block_m, max(8, m)), min(block_n, n)
    a_p = _pad_dim(a, 0, bm)
    sa_p = _pad_dim(scale_a.astype(jnp.float32).reshape(m, 1), 0, bm)
    b_p = _pad_dim(b, 1, bn)
    sb_p = _pad_dim(scale_b.astype(jnp.float32).reshape(1, n), 1, bn)
    mp, np_ = a_p.shape[0], b_p.shape[1]
    grid = (mp // bm, np_ // bn)

    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [a_p, b_p, sa_p, sb_p]
    if has_azp:
        azp_p = _pad_dim(azp.astype(jnp.int32).reshape(m, 1), 0, bm)
        adj_p = _pad_dim(azp_adj.astype(jnp.int32).reshape(1, n), 1, bn)
        in_specs += [
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ]
        operands += [azp_p, adj_p]
    if has_bias:
        bias_p = _pad_dim(bias.reshape(1, n), 1, bn)
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM))
        operands.append(bias_p)

    def kernel(*refs):
        a_r, b_r, sa_r, sb_r = refs[:4]
        rest = list(refs[4:-1])
        o_r = refs[-1]
        azp_r = adj_r = bias_r = None
        if has_azp:
            azp_r, adj_r = rest[0], rest[1]
            rest = rest[2:]
        if has_bias:
            bias_r = rest[0]
        _int8_mm_kernel(a_r, b_r, sa_r, sb_r, azp_r, adj_r, bias_r, o_r)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k, bytes_accessed=mp * k + k * np_ + mp * np_ * 2, transcendentals=0
        ),
        interpret=_INTERPRET,
    )(*operands)
    return out[:m, :n]


@kernel_registry.register("int8_matmul", "pallas")
def int8_matmul_pallas(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    out_dtype,
    azp_adj: Array,
    azp: Optional[Array],
    bias: Optional[Array] = None,
) -> Array:
    return _int8_matmul_pallas(
        a,
        b,
        scale_a,
        scale_b,
        azp if azp is not None else jnp.zeros((a.shape[0], 1), jnp.int32),
        azp_adj,
        bias if bias is not None else jnp.zeros((b.shape[1],), jnp.float32),
        out_dtype=jnp.dtype(out_dtype),
        block_m=256,
        block_n=512,
        has_azp=azp is not None,
        has_bias=bias is not None,
    )


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "has_bias")
)
def _fp8_matmul_pallas(a, b, scale_a, scale_b, bias, *, out_dtype, block_m, block_n, has_bias):
    m, k = a.shape
    n = b.shape[1]
    bm, bn = min(block_m, max(8, m)), min(block_n, n)
    a_p = _pad_dim(a, 0, bm)
    sa_p = _pad_dim(scale_a.astype(jnp.float32).reshape(m, 1), 0, bm)
    b_p = _pad_dim(b, 1, bn)
    sb_p = _pad_dim(scale_b.astype(jnp.float32).reshape(1, n), 1, bn)
    mp, np_ = a_p.shape[0], b_p.shape[1]
    grid = (mp // bm, np_ // bn)

    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [a_p, b_p, sa_p, sb_p]
    if has_bias:
        bias_p = _pad_dim(bias.reshape(1, n), 1, bn)
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM))
        operands.append(bias_p)

    def kernel(*refs):
        a_r, b_r, sa_r, sb_r = refs[:4]
        bias_r = refs[4] if has_bias else None
        o_r = refs[-1]
        _fp8_mm_kernel(a_r, b_r, sa_r, sb_r, bias_r, o_r)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k, bytes_accessed=mp * k + k * np_ + mp * np_ * 2, transcendentals=0
        ),
        interpret=_INTERPRET,
    )(*operands)
    return out[:m, :n]


@kernel_registry.register("fp8_matmul", "pallas")
def fp8_matmul_pallas(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    out_dtype,
    bias: Optional[Array] = None,
) -> Array:
    return _fp8_matmul_pallas(
        a,
        b,
        scale_a,
        scale_b,
        bias if bias is not None else jnp.zeros((b.shape[1],), jnp.float32),
        out_dtype=jnp.dtype(out_dtype),
        block_m=256,
        block_n=512,
        has_bias=bias is not None,
    )
