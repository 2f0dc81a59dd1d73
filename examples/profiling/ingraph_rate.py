"""IN-GRAPH steady-state rates: amortize the ~1.5-2 ms per-launch tunnel
overhead that polluted every prior single-dot microbenchmark.

Design: each timed op runs N_ITER times inside ONE jitted executable via
lax.scan over *stacked varying inputs and weights* (so nothing is
loop-invariant and nothing can be hoisted), and every iteration's output is
consumed by a jnp.max checksum -- max (unlike sum, which XLA rewrites as
sum(A@B) == colsum(A) @ rowsum(B), eliding the dot!) cannot be pushed
through the matmul, and fuses into the dot's output epilogue. Iterations are independent — XLA may overlap the next
iteration's HBM weight fetch with compute, which is exactly what it does
for the model's per-layer scan too, so this is the realistic regime.

Variants per FLUX matmul shape:
  s8 dot        — pure s8 x s8 -> s32 jax.lax.dot (MXU rate ceiling)
  s8 dot bf16   — same dot with bf16 preferred output (writeback savings)
  W8A8 sym      — per-token symmetric act quantize + dot + scale epilogue
  W8A8 azp      — per-token asymmetric quantize + dot + azp outer-product
                  correction + scales (TODAY'S model path)
  bf16 dot      — unquantized control

The (W8A8 azp) - (s8 dot) delta is what quantize+epilogue actually cost
in the model; (azp) - (sym) is the asymmetric zero-point premium.

Run: nohup python -u examples/profiling/ingraph_rate.py > /tmp/ingraph.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache

N_ITER = 20
REPS = 3

SHAPES = [
    ("dual qkv (img)", 8192, 3072, 9216),
    ("dual out (img)", 8192, 3072, 3072),
    ("dual ff-in (img)", 8192, 3072, 12288),
    ("dual ff-out (img)", 8192, 12288, 3072),
    ("single fused qkv+mlp", 8704, 3072, 21504),
    ("single out", 8704, 15360, 3072),
]


def time_ingraph(fn, args, work_flops, tag):
    """fn is jitted and internally loops N_ITER times."""
    # NB: fetch the scalar to host — on the axon tunnel platform
    # block_until_ready() returns before execution completes.
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / N_ITER
    tops = work_flops / per / 1e12
    print(f"{tag:44s} {per*1e3:8.3f} ms/iter {tops:7.1f} T", flush=True)
    return per


def main():
    enable_compilation_cache()
    from fastdm_tpu.kernels.jnp_backend.impl import (
        int8_matmul_jnp,
        quantize_to_int8_jnp,
    )

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)

    for tag, m, kk, n in SHAPES:
        flops = 2 * m * kk * n
        b8 = jax.random.randint(k2, (N_ITER, kk, n), -127, 128, jnp.int8)
        a8 = jax.random.randint(k1, (N_ITER, m, kk), -127, 128, jnp.int8)

        @jax.jit
        def run_dot(a8, b8):
            def body(c, ab):
                a, b = ab
                o = jax.lax.dot(a, b, preferred_element_type=jnp.int32)
                return jnp.maximum(c, jnp.max(o)), None

            c, _ = jax.lax.scan(body, jnp.int32(0), (a8, b8))
            return c

        time_ingraph(run_dot, (a8, b8), flops, f"s8 dot         {tag}")

        @jax.jit
        def run_dot_bf16(a8, b8):
            def body(c, ab):
                a, b = ab
                o = jax.lax.dot(a, b, preferred_element_type=jnp.bfloat16)
                return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None

            c, _ = jax.lax.scan(body, jnp.float32(0), (a8, b8))
            return c

        time_ingraph(run_dot_bf16, (a8, b8), flops, f"s8 dot bf16out {tag}")
        del a8

        # realistic W8A8: bf16 activations quantized per token in-graph
        xs = jax.random.normal(k1, (N_ITER, m, kk), jnp.bfloat16)
        sb = jnp.abs(jax.random.normal(k3, (N_ITER, n), jnp.float32)) + 0.01
        adj = jnp.sum(b8.astype(jnp.int32), axis=1)
        bias = jax.random.normal(k3, (N_ITER, n), jnp.float32)

        @jax.jit
        def run_sym(xs, b8, sb, bias):
            def body(c, ws):
                x, b, s, bi = ws
                q, sa, _ = quantize_to_int8_jnp(x, symmetric=True)
                o = int8_matmul_jnp(q, b, sa, s, jnp.bfloat16, None, None, bi)
                return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None

            c, _ = jax.lax.scan(body, jnp.float32(0), (xs, b8, sb, bias))
            return c

        time_ingraph(run_sym, (xs, b8, sb, bias), flops, f"W8A8 sym       {tag}")

        @jax.jit
        def run_azp(xs, b8, sb, adj, bias):
            def body(c, ws):
                x, b, s, j, bi = ws
                q, sa, zp = quantize_to_int8_jnp(x, symmetric=False)
                o = int8_matmul_jnp(q, b, sa, s, jnp.bfloat16, j, zp, bi)
                return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None

            c, _ = jax.lax.scan(body, jnp.float32(0), (xs, b8, sb, adj, bias))
            return c

        time_ingraph(run_azp, (xs, b8, sb, adj, bias), flops, f"W8A8 azp       {tag}")

        b16 = b8.astype(jnp.bfloat16)
        del b8

        @jax.jit
        def run_bf16(xs, b16):
            def body(c, ab):
                x, b = ab
                o = jnp.dot(x, b, preferred_element_type=jnp.float32)
                return jnp.maximum(c, jnp.max(o)), None

            c, _ = jax.lax.scan(body, jnp.float32(0), (xs, b16))
            return c

        time_ingraph(run_bf16, (xs, b16), flops, f"bf16 dot       {tag}")
        del xs, b16, sb, adj, bias

    # quantize alone (per-token asymmetric), at the big-M shape
    m, kk = 8192, 3072
    xs = jax.random.normal(k1, (N_ITER, m, kk), jnp.bfloat16)

    @jax.jit
    def run_q(xs):
        def body(c, x):
            q, sa, zp = quantize_to_int8_jnp(x, symmetric=False)
            return c + jnp.sum(q.astype(jnp.int32)) + jnp.sum(sa).astype(jnp.int32), None

        c, _ = jax.lax.scan(body, jnp.int32(0), xs)
        return c

    time_ingraph(run_q, (xs,), 2 * m * kk * 9216, "quantize asym alone (flops=dual qkv)")
    del xs

    # flash attention in-graph at the FLUX joint shape
    from fastdm_tpu.kernels.ops import scaled_dot_product_attention as sdpa

    b, s, h, d = 1, 8704, 24, 128
    qs = jax.random.normal(k1, (N_ITER, b, s, h * d), jnp.bfloat16)
    kv = jax.random.normal(k2, (2, b, s, h * d), jnp.bfloat16)

    @jax.jit
    def run_attn(qs, kv):
        def body(c, q):
            o = sdpa(q, kv[0], kv[1], h, h, d)
            return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None

        c, _ = jax.lax.scan(body, jnp.float32(0), qs)
        return c

    flops = 4 * s * s * h * d
    time_ingraph(run_attn, (qs, kv), flops, "flash attention FLUX")


if __name__ == "__main__":
    main()
