"""s4 x s4 in-graph rates at the FLUX per-layer shapes + pallas int4 feasibility.

Follow-up to int4_rate_probe.py (8192^3: s8 252 T, s4x s4 378 T, s8 x s4 254 T).
Questions answered here:
  1. does the 1.5x s4 rate survive at the actual FLUX matmul shapes
     (incl. the narrow-N 81-TOPS outlier)?
  2. does a per-K-group f32 rescale (grouped-int4 dequant, the accuracy-
     preserving form) keep the rate when expressed as XLA batched dots?
  3. can a pallas kernel load/dot jnp.int4 refs at all (Mosaic support)?

Run: python -u examples/profiling/int4_shape_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache

N_ITER = int(os.environ.get("N_ITER", 10))
REPS = 3
ONLY = os.environ.get("ONLY", "")  # substring filter over shape tags

FLUX_SHAPES = [
    ("dual qkv", 8192, 3072, 9216),
    ("dual out (narrow-N)", 8192, 3072, 3072),
    ("dual ff-in", 8192, 3072, 12288),
    ("dual ff-out", 8192, 12288, 3072),
    ("single fused", 8704, 3072, 21504),
    ("single out", 8704, 15360, 3072),
]


def bench(fn, args, m, n, k, tag):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / N_ITER
    tops = 2 * m * n * k / per / 1e12
    print(f"{tag:34s} {per * 1e3:8.3f} ms {tops:7.1f} T", flush=True)
    return tops


def flat_dot(cast):
    @jax.jit
    def run(a, b):
        def body(c, ab):
            x, y = ab
            o = jax.lax.dot(x.astype(cast), y.astype(cast),
                            preferred_element_type=jnp.int32)
            return jnp.maximum(c, jnp.max(o)), None
        c, _ = jax.lax.scan(body, jnp.int32(0), (a, b))
        return c
    return run


def grouped_dot(groups):
    """Per-K-group dequant: split K into `groups`, int4 dot per group,
    f32 rescale-accumulate (the W4A4 accuracy-preserving form)."""
    @jax.jit
    def run(a, b, sa, sw):
        # a: (I, M, K) i8-valued i4range, b: (I, K, N), sa: (I, groups, M), sw: (I, groups, N)
        def body(c, abss):
            x, y, ssa, ssw = abss
            m, k = x.shape
            n = y.shape[1]
            kg = k // groups
            xg = x.reshape(m, groups, kg).transpose(1, 0, 2).astype(jnp.int4)
            yg = y.reshape(groups, kg, n).astype(jnp.int4)
            og = jax.lax.dot_general(
                xg, yg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)  # (groups, M, N)
            of = (og.astype(jnp.float32)
                  * ssa[:, :, None] * ssw[:, None, :]).sum(0)
            return jnp.maximum(c, jnp.max(of)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), (a, b, sa, sw))
        return c
    return run


def main():
    enable_compilation_cache()
    key = jax.random.key(0)

    for tag, m, n, k in FLUX_SHAPES:
        if ONLY and ONLY not in tag:
            continue
        k1, k2 = jax.random.split(jax.random.fold_in(key, hash(tag) % 2**31))
        a = jax.random.randint(k1, (N_ITER, m, k), -8, 8, jnp.int8)
        b = jax.random.randint(k2, (N_ITER, k, n), -8, 8, jnp.int8)
        bench(flat_dot(jnp.int8), (a, b), m, n, k, f"{tag} s8")
        bench(flat_dot(jnp.int4), (a, b), m, n, k, f"{tag} s4 flat")
        if os.environ.get("GROUPED", "0") == "1":
            # measured catastrophic (41-141 T, 2026-08-19): the batched-dot
            # reshape defeats the MXU schedule; per-group dequant must NOT be
            # expressed this way. Kept behind a flag for re-measurement.
            g = 8
            sa = jnp.ones((N_ITER, g, m), jnp.float32)
            sw = jnp.ones((N_ITER, g, n), jnp.float32)
            try:
                bench(grouped_dot(g), (a, b, sa, sw), m, n, k, f"{tag} s4 G{g}")
            except Exception as e:
                print(f"{tag} s4 grouped FAILED: {type(e).__name__}: {e}",
                      flush=True)
        del a, b

    # 3. pallas int4 feasibility: trivial kernel that dots two int4 tiles
    try:
        from jax.experimental import pallas as pl

        def kern(x_ref, y_ref, o_ref):
            o_ref[...] = jax.lax.dot(
                x_ref[...], y_ref[...], preferred_element_type=jnp.int32)

        x = jax.random.randint(jax.random.key(7), (512, 512), -8, 8,
                               jnp.int8).astype(jnp.int4)
        y = jax.random.randint(jax.random.key(8), (512, 512), -8, 8,
                               jnp.int8).astype(jnp.int4)
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((512, 512), jnp.int32))(x, y)
        ref = jax.lax.dot(x.astype(jnp.int8), y.astype(jnp.int8),
                          preferred_element_type=jnp.int32)
        print("pallas int4 dot: OK maxdiff",
              int(jnp.max(jnp.abs(out - ref))), flush=True)
    except Exception as e:
        print(f"pallas int4 dot: UNSUPPORTED {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    main()
