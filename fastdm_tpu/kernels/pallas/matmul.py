"""Pallas TPU W8A8 matmul kernels (int8 + fp8).

TPU-native replacement for the reference's CUTLASS scaled-mm extensions
(ref: csrc/gemm/*_w8a8_int8.cu, *_w8a8_fp8.cu; epilogue math
doc/introduction.md:38-42). The MXU multiplies int8 natively with int32
accumulation; fp8 (e4m3) is upcast losslessly to bf16 and accumulated in f32
(matching the CUTLASS f32-accumulate semantics).

Design: 3D grid over (M/bm, N/bn, K/bk) with K innermost and an on-chip
accumulator scratch — K in diffusion transformers reaches 21504, so full-K
blocks would blow the ~16MB VMEM budget once Pallas double-buffers them
(observed at K=12288). The asymmetric-zero-point adjustment, per-token x
per-channel scaling, and bias add run in the epilogue on the last K step
(fused, one HBM round-trip).

Note: the kernel registry's "auto" policy currently routes matmuls to the jnp
backend (XLA's native int8 dot measured faster at model shapes); these kernels
stay correct and selectable via FASTDM_KERNEL_BACKEND=pallas.
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


def _pad_dim(x: Array, axis: int, mult: int) -> Array:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _mm_kernel(a_ref, b_ref, sa_ref, sb_ref, azp_ref, adj_ref, bias_ref, o_ref,
               acc_ref, *, int8: bool):
    """Accumulate a (bm,bk)@(bk,bn) tile; epilogue on the last K step."""
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    if int8:
        acc_ref[...] += jax.lax.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.int32
        )
    else:
        acc_ref[...] += jnp.dot(
            a_ref[...].astype(jnp.bfloat16),
            b_ref[...].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kk == nk - 1)
    def _():
        acc = acc_ref[...]
        if azp_ref is not None:
            acc = acc - azp_ref[...] * adj_ref[...]
        out = acc.astype(jnp.float32) * (sa_ref[...] * sb_ref[...])
        if bias_ref is not None:
            out = out + bias_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_n", "block_k", "has_azp",
                     "has_bias", "int8"),
)
def _w8a8_matmul_pallas(
    a, b, scale_a, scale_b, azp, azp_adj, bias, *,
    out_dtype, block_m, block_n, block_k, has_azp, has_bias, int8,
):
    m, k = a.shape
    n = b.shape[1]
    bm, bn, bk = min(block_m, max(8, m)), min(block_n, n), min(block_k, k)
    a_p = _pad_dim(_pad_dim(a, 0, bm), 1, bk)
    b_p = _pad_dim(_pad_dim(b, 0, bk), 1, bn)
    sa_p = _pad_dim(scale_a.astype(jnp.float32).reshape(m, 1), 0, bm)
    sb_p = _pad_dim(scale_b.astype(jnp.float32).reshape(1, n), 1, bn)
    mp, np_, kp = a_p.shape[0], b_p.shape[1], a_p.shape[1]
    grid = (mp // bm, np_ // bn, kp // bk)

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [a_p, b_p, sa_p, sb_p]
    if has_azp:
        operands += [
            _pad_dim(azp.astype(jnp.int32).reshape(m, 1), 0, bm),
            _pad_dim(azp_adj.astype(jnp.int32).reshape(1, n), 1, bn),
        ]
        in_specs += [
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ]
    if has_bias:
        operands.append(_pad_dim(bias.reshape(1, n), 1, bn))
        in_specs.append(
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM)
        )

    def kernel(*refs):
        a_r, b_r, sa_r, sb_r = refs[:4]
        rest = list(refs[4:-2])
        o_r, acc_r = refs[-2], refs[-1]
        azp_r = adj_r = bias_r = None
        if has_azp:
            azp_r, adj_r, rest = rest[0], rest[1], rest[2:]
        if has_bias:
            bias_r = rest[0]
        _mm_kernel(a_r, b_r, sa_r, sb_r, azp_r, adj_r, bias_r, o_r, acc_r, int8=int8)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32 if int8 else jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # M/N tiles are independent; only the K loop carries the acc
            dimension_semantics=("parallel", "parallel", "arbitrary"),
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
    contracts.check_scaled_mm("int8_matmul_pallas", a, b, scale_a, scale_b,
                              azp_adj=azp_adj, azp=azp, bias=bias, int8=True)
    return _w8a8_matmul_pallas(
        a, b, scale_a, scale_b,
        azp if azp is not None else jnp.zeros((a.shape[0], 1), jnp.int32),
        azp_adj,
        bias if bias is not None else jnp.zeros((b.shape[1],), jnp.float32),
        out_dtype=jnp.dtype(out_dtype),
        block_m=512, block_n=1024, block_k=1536,
        has_azp=azp is not None, has_bias=bias is not None, int8=True,
    )


@kernel_registry.register("fp8_matmul", "pallas")
def fp8_matmul_pallas(
    a: Array,
    b: Array,
    scale_a: Array,
    scale_b: Array,
    out_dtype,
    bias: Optional[Array] = None,
) -> Array:
    contracts.check_scaled_mm("fp8_matmul_pallas", a, b, scale_a, scale_b,
                              bias=bias, int8=False)
    return _w8a8_matmul_pallas(
        a, b, scale_a, scale_b,
        None, None,
        bias if bias is not None else jnp.zeros((b.shape[1],), jnp.float32),
        out_dtype=jnp.dtype(out_dtype),
        block_m=512, block_n=1024, block_k=1536,
        has_azp=False, has_bias=bias is not None, int8=False,
    )
