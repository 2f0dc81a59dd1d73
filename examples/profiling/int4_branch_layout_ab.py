"""SVDQuant-branch layout A/B: where does the (x@u)@v 1.4-1.6 ms go?

The int4 qlinear A/B (int4_qlinear_ab.py, BENCH_NOTES 2026-08-19) pinned the
W4A4 gap to the bf16 rank-32 branch; padding the rank and quantizing u were
both measured dead ends. This probe isolates the two branch dots and tries
pure LAYOUT/SCHEDULE variants (no accuracy change — u/v stay exact bf16):

  first dot     — x(M,K) @ u(K,32) alone (suspected narrow-N cliff)
  second dot    — yu(M,32) @ v(32,N) alone (narrow-K)
  base          — (x @ u) @ v        (today's shipped form)
  swapT         — dot_general(u,x) -> (32,M), tiny transpose, @ v
                  (same math, output-narrow becomes output-wide-lanes)
  blockdiag C   — u embedded block-diagonally as (K, 32*C): chunk c of K
                  writes its partial sums to its own 32 output columns,
                  summed after. FLOPs x C, but N widens to 32*C — a win iff
                  the narrow dot is pipeline-bound, not FLOP-bound.
  f32acc swapT  — swapT with f32 accumulation type pinned

In-graph scan harness (ingraph_rate.py methodology): N_ITER iterations over
stacked varying weights inside one jit, max checksum defeats DCE, min of
REPS timed runs.

Run: nohup python -u examples/profiling/int4_branch_layout_ab.py > /tmp/br_ab.log 2>&1 &
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


def time_ingraph(fn, args, tag):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / N_ITER
    print(f"{tag:24s} {per*1e3:8.3f} ms/iter", flush=True)
    return per


def main():
    enable_compilation_cache()
    k1, k2 = jax.random.split(jax.random.key(0), 2)

    for tag, m, kk, n in SHAPES:
        xs = jax.random.normal(k1, (N_ITER, m, kk), jnp.bfloat16)
        u = jax.random.normal(k1, (N_ITER, kk, RANK), jnp.bfloat16) * 0.01
        v = jax.random.normal(k2, (N_ITER, RANK, n), jnp.bfloat16) * 0.01
        print(f"--- {tag} {m}x{kk}x{n}", flush=True)

        @jax.jit
        def run_first(xs, u):
            def body(c, ws):
                x, uu = ws
                yu = x @ uu
                return jnp.maximum(c, jnp.max(yu.astype(jnp.float32))), None
            c, _ = jax.lax.scan(body, jnp.float32(0), (xs, u))
            return c

        time_ingraph(run_first, (xs, u), "first dot only")

        yus = jax.random.normal(k2, (N_ITER, m, RANK), jnp.bfloat16)

        @jax.jit
        def run_second(yus, v):
            def body(c, ws):
                yu, vv = ws
                o = yu @ vv
                return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None
            c, _ = jax.lax.scan(body, jnp.float32(0), (yus, v))
            return c

        time_ingraph(run_second, (yus, v), "second dot only")

        @jax.jit
        def run_base(xs, u, v):
            def body(c, ws):
                x, uu, vv = ws
                o = (x @ uu) @ vv
                return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None
            c, _ = jax.lax.scan(body, jnp.float32(0), (xs, u, v))
            return c

        time_ingraph(run_base, (xs, u, v), "base (x@u)@v")

        @jax.jit
        def run_swapt(xs, u, v):
            def body(c, ws):
                x, uu, vv = ws
                # (32, M): contract K on both sides, no materialized x.T
                t = jax.lax.dot_general(uu, x, (((0,), (1,)), ((), ())))
                o = t.T @ vv  # (M,32) transpose is a tiny 1 MB copy
                return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None
            c, _ = jax.lax.scan(body, jnp.float32(0), (xs, u, v))
            return c

        time_ingraph(run_swapt, (xs, u, v), "swapT")

        @jax.jit
        def run_swapt_f32(xs, u, v):
            def body(c, ws):
                x, uu, vv = ws
                t = jax.lax.dot_general(uu, x, (((0,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                o = t.astype(jnp.bfloat16).T @ vv
                return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None
            c, _ = jax.lax.scan(body, jnp.float32(0), (xs, u, v))
            return c

        time_ingraph(run_swapt_f32, (xs, u, v), "swapT f32acc")

        for cblk in (4, 16):
            if kk % cblk:
                continue
            kc = kk // cblk
            # block-diagonal embed: chunk c of u occupies columns [c*32,(c+1)*32)
            eye = jnp.eye(cblk, dtype=jnp.bfloat16)  # (C, C)
            # u (it, K, 32) -> (it, C, kc, 32); blk (it, C, kc, C, 32)
            u4 = u.reshape(N_ITER, cblk, kc, RANK)
            blk = jnp.einsum("ickr,cd->ickdr", u4, eye)
            ublk = blk.reshape(N_ITER, kk, cblk * RANK)

            @jax.jit
            def run_blockdiag(xs, ublk, v):
                def body(c, ws):
                    x, ub, vv = ws
                    wide = x @ ub  # (M, C*32)
                    yu = wide.reshape(x.shape[0], cblk, RANK).sum(axis=1)
                    o = yu.astype(jnp.bfloat16) @ vv
                    return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None
                c, _ = jax.lax.scan(body, jnp.float32(0), (xs, ublk, v))
                return c

            time_ingraph(run_blockdiag, (xs, ublk, v), f"blockdiag C={cblk}")
            del ublk
        del xs, u, v, yus


if __name__ == "__main__":
    main()
