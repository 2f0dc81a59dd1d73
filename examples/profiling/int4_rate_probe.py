"""Does the v5e MXU run int4 weights faster than int8?

The int8 ceiling measured 258 TOPS in-graph (BENCH_NOTES 2026-08-18). If
s8 x s4 (or s4 x s4) doubles that, a W4A8 path would be a real lever for
the matmul-bound families. The earlier probe crashed on a harness bug
(int4 randint unsupported); this one builds int4 from int8 via astype.

Run: python -u examples/profiling/int4_rate_probe.py
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
M = N = K = 8192


def time_ingraph(fn, args, tag):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / N_ITER
    tops = 2 * M * N * K / per / 1e12
    print(f"{tag:38s} {per * 1e3:8.3f} ms/iter {tops:7.1f} T", flush=True)


def main():
    enable_compilation_cache()
    k1, k2 = jax.random.split(jax.random.key(0))
    a8 = jax.random.randint(k1, (N_ITER, M, K), -8, 8, jnp.int8)
    b8 = jax.random.randint(k2, (N_ITER, K, N), -8, 8, jnp.int8)

    def mk(cast_a, cast_b):
        @jax.jit
        def run(a8, b8):
            def body(c, ab):
                a, b = ab
                o = jax.lax.dot(a.astype(cast_a), b.astype(cast_b),
                                preferred_element_type=jnp.int32)
                return jnp.maximum(c, jnp.max(o)), None

            c, _ = jax.lax.scan(body, jnp.int32(0), (a8, b8))
            return c

        return run

    # correctness: int4 dot == int8 dot on int4-range values (small shape)
    sa = jax.random.randint(k1, (256, 512), -8, 8, jnp.int8)
    sb = jax.random.randint(k2, (512, 256), -8, 8, jnp.int8)
    try:
        o4 = jax.jit(lambda x, y: jax.lax.dot(
            x.astype(jnp.int4), y.astype(jnp.int4),
            preferred_element_type=jnp.int32))(sa, sb)
        o8 = jax.jit(lambda x, y: jax.lax.dot(
            x, y, preferred_element_type=jnp.int32))(sa, sb)
        print("s4 x s4 correctness maxdiff:",
              int(jnp.max(jnp.abs(o4 - o8))), flush=True)
    except Exception as e:
        print(f"s4 x s4 unsupported: {type(e).__name__}: {e}", flush=True)
        return

    time_ingraph(mk(jnp.int8, jnp.int8), (a8, b8), "s8 x s8 control")
    for ca, cb, tag in [
        (jnp.int4, jnp.int4, "s4 x s4"),
        (jnp.int8, jnp.int4, "s8 x s4 (W4A8 form)"),
    ]:
        try:
            time_ingraph(mk(ca, cb), (a8, b8), tag)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
