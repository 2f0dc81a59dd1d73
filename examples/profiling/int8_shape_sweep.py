"""Where does the int8 MXU rate go at MODEL shapes?

int8_rate_probe measured ~256 TOPS at square (8192^3) and wide-K shapes —
1.67x the bf16 rate and far above the 117-166 TOPS recorded for the FLUX
matmul shapes (BENCH_NOTES "Kernel microbenchmarks"). This sweep times the
pure s8xs8->s32 dot at every matmul shape in the FLUX step (plus controls
that vary one factor at a time) to find the losing factor, then re-times the
worst shape with the full W8A8 epilogue (scales + azp + bias) to separate
dot rate from epilogue cost.

Run: nohup python -u examples/profiling/int8_shape_sweep.py > /tmp/shapesweep.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache

REPS = 20

SHAPES = [
    # (tag, M, K, N) — the FLUX step's matmuls
    ("dual qkv (img)", 8192, 3072, 9216),
    ("dual out (img)", 8192, 3072, 3072),
    ("dual ff-in (img)", 8192, 3072, 12288),
    ("dual ff-out (img)", 8192, 12288, 3072),
    ("dual qkv (txt)", 512, 3072, 9216),
    ("single fused qkv+mlp", 8704, 3072, 21504),
    ("single out", 8704, 15360, 3072),
    # one-factor-at-a-time controls around the worst r1 shape (8192,3072,9216)
    ("ctrl square 8192", 8192, 8192, 8192),
    ("ctrl K->8192", 8192, 8192, 9216),
    ("ctrl K->6144", 8192, 6144, 9216),
    ("ctrl N->8192", 8192, 3072, 8192),
    ("ctrl N->4608", 8192, 3072, 4608),
    ("ctrl M->4096", 4096, 3072, 9216),
    ("ctrl K->4096", 8192, 4096, 9216),
    ("ctrl K->2048", 8192, 2048, 9216),
]


def bench(fn, args, m, n, k, tag):
    out = fn(*args)
    np.asarray(out[:1, :8])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out[:1, :8])
    dt = (time.perf_counter() - t0) / REPS
    tops = 2 * m * n * k / dt / 1e12
    print(f"{tag:26s} M{m:5d} K{k:5d} N{n:5d}  {dt*1e3:8.3f} ms {tops:7.1f} T",
          flush=True)
    return dt


def main():
    enable_compilation_cache()
    f_dot = jax.jit(lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.int32))
    k1, k2 = jax.random.split(jax.random.key(0))
    for tag, m, kk, n in SHAPES:
        a = jax.random.randint(k1, (m, kk), -127, 128, jnp.int8)
        b = jax.random.randint(k2, (kk, n), -127, 128, jnp.int8)
        bench(f_dot, (a, b), m, n, kk, tag)

    # full W8A8 op (the registry's int8_matmul epilogue) at two model shapes
    from fastdm_tpu.kernels.jnp_backend.impl import int8_matmul_jnp

    for tag, m, kk, n in [("W8A8 dual qkv", 8192, 3072, 9216),
                          ("W8A8 single fused", 8704, 3072, 21504)]:
        a = jax.random.randint(k1, (m, kk), -127, 128, jnp.int8)
        b = jax.random.randint(k2, (kk, n), -127, 128, jnp.int8)
        sa = jnp.abs(jax.random.normal(k1, (m, 1), jnp.float32)) + 0.01
        sb = jnp.abs(jax.random.normal(k2, (n,), jnp.float32)) + 0.01
        adj = jnp.sum(b.astype(jnp.int32), axis=0)
        bias = jax.random.normal(k1, (n,), jnp.float32)
        f = jax.jit(lambda x, y, p, q, j, bi: int8_matmul_jnp(
            x, y, p, q, jnp.bfloat16, j, None, bi))
        bench(f, (a, b, sa, sb, adj, bias), m, n, kk, tag)

    # does fusing the act-quantize into the consumer graph change the rate?
    def quant_dot(x16, y):
        s = jnp.max(jnp.abs(x16), -1, keepdims=True) / 127.0
        q = jnp.clip(jnp.round(x16 / s), -128, 127).astype(jnp.int8)
        return jax.lax.dot(q, y, preferred_element_type=jnp.int32)

    m, kk, n = 8192, 3072, 9216
    x16 = jax.random.normal(k1, (m, kk), jnp.bfloat16)
    b = jax.random.randint(k2, (kk, n), -127, 128, jnp.int8)
    bench(jax.jit(quant_dot), (x16, b), m, n, kk, "quant+dot fused (XLA)")


if __name__ == "__main__":
    main()
