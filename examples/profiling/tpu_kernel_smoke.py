"""TPU smoke test for the pallas kernels: correctness vs the jnp oracle at
real model shapes + microbenchmark timings (ref role: fastdm/kernel/utils.py
benchmark_kernel + tests/ cross-backend pattern). Run on a real TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    print("backend:", jax.default_backend(), jax.devices())
    from fastdm_tpu.kernels.jnp_backend.impl import (
        int8_matmul_jnp, quantize_to_int8_jnp, sdpa_jnp,
    )
    from fastdm_tpu.kernels.pallas.attention import sdpa_pallas
    from fastdm_tpu.kernels.pallas.matmul import int8_matmul_pallas

    rng = np.random.default_rng(0)
    print("imports done", flush=True)

    # ---- int8 matmul, flux qkv shape
    m, k, n = 4608, 3072, 9216
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    ws = np.abs(w).max(0, keepdims=True) / 127.0
    wq = jnp.asarray(np.clip(np.round(w / ws), -128, 127).astype(np.int8))
    colsum = jnp.asarray(wq.astype(jnp.int32).sum(0))
    xq, xs, xzp = jax.jit(lambda a: quantize_to_int8_jnp(a, False))(x)
    jax.block_until_ready(xq); print("quantize done", flush=True)

    f_jnp = jax.jit(lambda: int8_matmul_jnp(xq, wq, xs, jnp.asarray(ws), jnp.bfloat16, colsum, xzp, None))
    f_pal = jax.jit(lambda: int8_matmul_pallas(xq, wq, xs, jnp.asarray(ws), jnp.bfloat16, colsum, xzp, None))
    o1 = np.asarray(f_jnp(), np.float32); print("jnp mm done", flush=True)
    o2 = np.asarray(f_pal(), np.float32); print("pallas mm done", flush=True)
    err = np.abs(o1 - o2).max() / max(np.abs(o1).max(), 1e-6)
    t_jnp, t_pal = bench(f_jnp), bench(f_pal)
    tflops = 2 * m * k * n / 1e12
    print(f"int8_matmul {m}x{k}x{n}: rel_err={err:.2e} "
          f"jnp={t_jnp*1e3:.2f}ms ({tflops/t_jnp:.0f} TOPS) "
          f"pallas={t_pal*1e3:.2f}ms ({tflops/t_pal:.0f} TOPS)")

    # ---- flash attention, flux shape
    b, s, h, d = 1, 4608, 24, 128
    q = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
    kk = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
    f_attn_p = jax.jit(lambda: sdpa_pallas(q, kk, v, h, h, d))
    f_attn_j = jax.jit(lambda: sdpa_jnp(q, kk, v, h, h, d))
    a1 = np.asarray(f_attn_j(), np.float32); print("jnp attn done", flush=True)
    a2 = np.asarray(f_attn_p(), np.float32); print("pallas attn done", flush=True)
    print(f"flash_attention {b}x{s}x{h}x{d}: maxdiff={np.abs(a1-a2).max():.3e}")
    t_j, t_p = bench(f_attn_j, reps=5), bench(f_attn_p, reps=5)
    aflops = 4 * b * h * s * s * d / 1e12
    print(f"  jnp={t_j*1e3:.2f}ms ({aflops/t_j:.0f} TFLOPS) "
          f"pallas={t_p*1e3:.2f}ms ({aflops/t_p:.0f} TFLOPS)")


if __name__ == "__main__":
    main()
