"""Kernel block-size tuning sweep on real TPU: pallas matmul + flash attention
vs XLA at the bench's hot shapes. Informs the registry auto-policy and the
kernels' default block sizes."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, reps=10):
    # block_until_ready does NOT sync over the axon tunnel; syncing on a tiny
    # output slice forces completion without paying the full d2h transfer
    sync = lambda o: np.asarray(o[:1, :8] if o.ndim >= 2 else o[:8])
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    from fastdm_tpu.kernels.jnp_backend.impl import int8_matmul_jnp, sdpa_jnp
    from fastdm_tpu.kernels.pallas.attention import _flash_attention
    from fastdm_tpu.kernels.pallas.matmul import _w8a8_matmul_pallas

    rng = np.random.default_rng(0)

    # ---- matmul: the three hottest flux shapes
    for (m, k, n) in [(8192, 3072, 9216), (8704, 3072, 12288), (8704, 15360, 3072)]:
        a = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        sa = jnp.ones((m, 1), jnp.float32)
        sb = jnp.ones((1, n), jnp.float32)
        azp = jnp.zeros((m, 1), jnp.int32)
        adj = jnp.zeros((1, n), jnp.int32)
        tops = 2 * m * k * n / 1e12

        t_x = bench(jax.jit(lambda: int8_matmul_jnp(a, b, sa, sb, jnp.bfloat16, adj, azp, None)))
        print(f"mm {m}x{k}x{n}: XLA {t_x*1e3:.2f}ms ({tops/t_x:.0f} TOPS)", flush=True)
        for bm, bn, bk in [(512, 1024, 1536), (512, 512, 3072), (256, 1024, 3072),
                           (512, 1024, 3072), (1024, 1024, 1536), (512, 2048, 1536),
                           (768, 1024, 3072), (256, 2048, 3072), (1024, 512, 3072)]:
            try:
                f = jax.jit(functools.partial(
                    _w8a8_matmul_pallas, a, b, sa, sb, azp, adj,
                    jnp.zeros((n,), jnp.float32),
                    out_dtype=jnp.bfloat16, block_m=bm, block_n=bn, block_k=bk,
                    has_azp=True, has_bias=False, int8=True))
                t = bench(f)
                print(f"  pallas bm{bm} bn{bn} bk{bk}: {t*1e3:.2f}ms ({tops/t:.0f} TOPS)", flush=True)
            except Exception as e:
                print(f"  pallas bm{bm} bn{bn} bk{bk}: FAIL {str(e)[:60]}", flush=True)

    # ---- attention: flux joint shape
    b_, s, h, d = 1, 8704, 24, 128
    q = jax.random.normal(jax.random.key(0), (b_, s, h * d), jnp.bfloat16)
    kk = jax.random.normal(jax.random.key(1), (b_, s, h * d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b_, s, h * d), jnp.bfloat16)
    aflop = 4 * b_ * h * s * s * d / 1e12
    for bq, bk in [(512, 1024), (1024, 1024), (512, 2048), (1024, 2048),
                   (2048, 1024), (256, 4352), (2048, 2048), (4352, 512)]:
        try:
            f = jax.jit(functools.partial(
                _flash_attention, q, kk, v, None,
                num_q_heads=h, num_kv_heads=h, head_dim=d, is_causal=False,
                scale=None, block_q=bq, block_k=bk, has_mask=False))
            t = bench(f, reps=5)
            print(f"attn bq{bq} bk{bk}: {t*1e3:.2f}ms ({aflop/t:.0f} TFLOPS)", flush=True)
        except Exception as e:
            print(f"attn bq{bq} bk{bk}: FAIL {str(e)[:60]}", flush=True)


if __name__ == "__main__":
    main()
