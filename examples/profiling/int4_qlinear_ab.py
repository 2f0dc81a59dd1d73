"""IN-GRAPH W4A4 qlinear A/B: where does the shape-probe int4 gain go?

The s8->s4 dot probes showed 1.09-1.35x per FLUX shape (BENCH_NOTES
2026-08-19), but the full-model bench moved only ~2.6% (26.92 -> 26.23 s
uncached). This isolates the int4 QLINEAR (quantize + dot + epilogue +
SVDQuant branch) against the int8 qlinear at the same shapes, in-graph
(ingraph_rate.py methodology: lax.scan over stacked varying weights, max
checksum), to locate the overhead:

  W8A8 azp    — today's int8 model path (baseline)
  W4A4 today  — quantize_to_int4 + s4 dot + bf16 (x@u)@v branch
  W4A4 nobr   — same minus the branch (upper bound of the branch cost)
  branch only — (x@u)@v alone (narrow-N dot cost, suspected eater)
  W4A4 aug    — CANDIDATE: u's 32 columns ride as extra output columns of
                the main s4 dot (y_u computed from QUANTIZED activations),
                then + (y_u)@v — removes the narrow-N bf16 x@u entirely.
                Accuracy note: the branch then sees x_q4 instead of x_bf16;
                total error collapses to x_err@w (plain activation-quant
                error with EXACT low-rank weight part) — bounded by the same
                per-token s4 scales the residual path already accepts.

Run: nohup python -u examples/profiling/int4_qlinear_ab.py > /tmp/int4_ql.log 2>&1 &
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
RANK = 32

SHAPES = [
    ("dual qkv", 8192, 3072, 9216),
    ("dual ff-out", 8192, 12288, 3072),
    ("single fused", 8704, 3072, 21504),
    ("single out", 8704, 15360, 3072),
]


def time_ingraph(fn, args, work_flops, tag):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / N_ITER
    print(f"{tag:24s} {per*1e3:8.3f} ms/iter {work_flops/per/1e12:7.1f} T",
          flush=True)
    return per


def main():
    enable_compilation_cache()
    from fastdm_tpu.kernels import (
        int4_matmul, int8_matmul, quantize_to_int4, quantize_to_int8,
    )

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)

    for tag, m, kk, n in SHAPES:
        flops = 2 * m * kk * n
        xs = jax.random.normal(k1, (N_ITER, m, kk), jnp.bfloat16)
        w8 = jax.random.randint(k2, (N_ITER, kk, n), -127, 128, jnp.int8)
        w4 = jax.random.randint(k2, (N_ITER, kk, n), -8, 8, jnp.int8)
        sw = jnp.abs(jax.random.normal(k3, (N_ITER, n), jnp.float32)) * 1e-2 + 1e-3
        adj = jnp.sum(w8.astype(jnp.int32), axis=1)
        u = jax.random.normal(k1, (N_ITER, kk, RANK), jnp.bfloat16) * 0.01
        v = jax.random.normal(k2, (N_ITER, RANK, n), jnp.bfloat16) * 0.01
        print(f"--- {tag} {m}x{kk}x{n}", flush=True)

        @jax.jit
        def run_int8(xs, w8, sw, adj):
            def body(c, ws):
                x, w, s, j = ws
                q, sa, zp = quantize_to_int8(x, symmetric=False)
                o = int8_matmul(q, w, sa, s, jnp.bfloat16, j, zp, None)
                return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None

            c, _ = jax.lax.scan(body, jnp.float32(0), (xs, w8, sw, adj))
            return c

        time_ingraph(run_int8, (xs, w8, sw, adj), flops, "W8A8 azp")

        @jax.jit
        def run_int4(xs, w4, sw, u, v):
            def body(c, ws):
                x, w, s, uu, vv = ws
                q, sa = quantize_to_int4(x)
                o = int4_matmul(q, w, sa, s, jnp.bfloat16, None)
                o = o + ((x @ uu) @ vv).astype(o.dtype)
                return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None

            c, _ = jax.lax.scan(body, jnp.float32(0), (xs, w4, sw, u, v))
            return c

        time_ingraph(run_int4, (xs, w4, sw, u, v), flops, "W4A4 today")

        @jax.jit
        def run_int4_nobr(xs, w4, sw):
            def body(c, ws):
                x, w, s = ws
                q, sa = quantize_to_int4(x)
                o = int4_matmul(q, w, sa, s, jnp.bfloat16, None)
                return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None

            c, _ = jax.lax.scan(body, jnp.float32(0), (xs, w4, sw))
            return c

        time_ingraph(run_int4_nobr, (xs, w4, sw), flops, "W4A4 nobranch")

        @jax.jit
        def run_branch(xs, u, v):
            def body(c, ws):
                x, uu, vv = ws
                o = (x @ uu) @ vv
                return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None

            c, _ = jax.lax.scan(body, jnp.float32(0), (xs, u, v))
            return c

        time_ingraph(run_branch, (xs, u, v), flops, "branch only")

        # candidate: u quantized to s4 columns appended to the weight; branch
        # first stage rides the big MXU dot, second stage is rank-K tiny
        su = jnp.maximum(jnp.max(jnp.abs(u.astype(jnp.float32)), axis=1), 1e-12) / 7.0
        uq = jnp.clip(jnp.round(u.astype(jnp.float32) / su[:, None, :]), -8, 7
                      ).astype(jnp.int8)
        waug = jnp.concatenate([w4, uq], axis=2)
        saug = jnp.concatenate([sw, su], axis=1)

        @jax.jit
        def run_int4_aug(xs, waug, saug, v):
            def body(c, ws):
                x, w, s, vv = ws
                q, sa = quantize_to_int4(x)
                o = int4_matmul(q, w, sa, s, jnp.bfloat16, None)
                main, yu = o[:, :n], o[:, n:]
                main = main + (yu @ vv.astype(yu.dtype)).astype(main.dtype)
                return jnp.maximum(c, jnp.max(main.astype(jnp.float32))), None

            c, _ = jax.lax.scan(body, jnp.float32(0), (xs, waug, saug, v))
            return c

        time_ingraph(run_int4_aug, (xs, waug, saug, v), flops, "W4A4 aug-branch")
        del xs, w8, w4, u, v, waug


if __name__ == "__main__":
    main()
