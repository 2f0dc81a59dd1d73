"""A/B: (1) XLA vs pallas single-pass quantize_to_int8 at the FLUX hot shapes,
(2) XLA vs pallas int8 dot at the narrow-N "dual out" shape where the
in-graph steady-state probe measured only ~81 TOPS (vs ~250 at wide N).

Both measured IN-GRAPH (lax.scan over stacked varying inputs, max-checksum)
to amortize the tunnel's per-launch overhead — same harness discipline as
examples/profiling/ingraph_rate.py.

Run: python -u examples/profiling/quant_dot_ab.py
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


def time_ingraph(fn, args, tag, work=None):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / N_ITER
    extra = f" {work / per / 1e12:7.1f} T" if work else ""
    print(f"{tag:46s} {per * 1e3:8.3f} ms/iter{extra}", flush=True)
    return per


def main():
    enable_compilation_cache()
    from fastdm_tpu.kernels.jnp_backend.impl import (
        int8_matmul_jnp,
        quantize_to_int8_jnp,
    )
    from fastdm_tpu.kernels.pallas.elementwise import quantize_to_int8_pallas
    from fastdm_tpu.kernels.pallas.matmul import _w8a8_matmul_pallas

    k1, k2 = jax.random.split(jax.random.key(0))

    # ---- correctness first (hardware, small shape)
    x = jax.random.normal(k1, (256, 512), jnp.bfloat16)
    qj, sj, zj = jax.jit(lambda a: quantize_to_int8_jnp(a, symmetric=False))(x)
    qp, sp_, zp = jax.jit(lambda a: quantize_to_int8_pallas(a, symmetric=False))(x)
    dq = int(jnp.max(jnp.abs(qj.astype(jnp.int32) - qp.astype(jnp.int32))))
    ds = float(jnp.max(jnp.abs(sj - sp_)))
    print(f"quantize correctness: max |dq|={dq} (<=1 rounding ok) |ds|={ds:.2e}",
          flush=True)

    # ---- (1) quantize pass alone, asym, hot shapes
    for m, kk in [(8704, 15360), (8192, 12288), (8704, 3072)]:
        xs = jax.random.normal(k1, (N_ITER, m, kk), jnp.bfloat16)

        def mk(quant_fn):
            @jax.jit
            def run(xs):
                def body(c, x):
                    q, s, zp = quant_fn(x, symmetric=False)
                    return jnp.maximum(c, jnp.max(q.astype(jnp.int32))), None

                c, _ = jax.lax.scan(body, jnp.int32(0), xs)
                return c

            return run

        time_ingraph(mk(quantize_to_int8_jnp), (xs,), f"quant jnp    {m}x{kk}")
        time_ingraph(mk(quantize_to_int8_pallas), (xs,), f"quant pallas {m}x{kk}")
        del xs

    # ---- (2) narrow-N dual-out dot: XLA vs pallas tilings
    m, kk, n = 8192, 3072, 3072
    flops = 2 * m * kk * n
    a8 = jax.random.randint(k1, (N_ITER, m, kk), -127, 128, jnp.int8)
    b8 = jax.random.randint(k2, (N_ITER, kk, n), -127, 128, jnp.int8)

    @jax.jit
    def run_xla(a8, b8):
        def body(c, ab):
            a, b = ab
            o = jax.lax.dot(a, b, preferred_element_type=jnp.int32)
            return jnp.maximum(c, jnp.max(o)), None

        c, _ = jax.lax.scan(body, jnp.int32(0), (a8, b8))
        return c

    time_ingraph(run_xla, (a8, b8), f"dot XLA      {m}x{kk}x{n}", flops)

    ones_s = jnp.ones((N_ITER, m, 1), jnp.float32)
    ones_w = jnp.ones((N_ITER, n), jnp.float32)
    for bm, bn, bk in [(512, 512, 3072), (1024, 1024, 1536), (512, 1024, 3072),
                       (2048, 512, 3072), (1024, 3072, 1024), (512, 3072, 3072)]:
        try:
            @jax.jit
            def run_pal(a8, b8, ss, ws, bm=bm, bn=bn, bk=bk):
                def body(c, ab):
                    a, b, s, w = ab
                    o = _w8a8_matmul_pallas(
                        a, b, s, w, None, None, None,
                        out_dtype=jnp.bfloat16, block_m=bm, block_n=bn,
                        block_k=bk, has_azp=False, has_bias=False, int8=True)
                    return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None

                c, _ = jax.lax.scan(body, jnp.float32(0), (a8, b8, ss, ws))
                return c

            time_ingraph(run_pal, (a8, b8, ones_s, ones_w),
                         f"dot pallas {bm}/{bn}/{bk} {m}x{kk}x{n}", flops)
        except Exception as e:  # Mosaic VMEM OOM etc.
            print(f"dot pallas {bm}/{bn}/{bk}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
