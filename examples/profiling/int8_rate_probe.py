"""Does ANY int8 matmul formulation reach the v5e MXU's 2x int8 rate?

Spec sheet: v5e = 197 bf16 TFLOPS / 394 int8 TOPS. Every path measured so
far (XLA jnp.dot int8->int32, pallas lax.dot int8) lands at 136-156 TOPS
~= the bf16 rate, which would mean the W8A8 quant path saves only
bandwidth, not compute. This probe asks the narrow question: at a big
square MXU-saturating shape, does bf16 vs int8 vs mixed (bf16 x int8)
show ANY 2x formulation? If no, the ~150 TOPS matmul ceiling is final for
this chip and BENCH_NOTES records it as such.

Run: nohup python -u examples/profiling/int8_rate_probe.py > /tmp/int8rate.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache

M = N = K = 8192
REPS = 20


def bench(fn, *args, tag=""):
    out = fn(*args)
    np.asarray(out[:1, :8])  # tunnel-safe d2h sync
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out[:1, :8])
    dt = (time.perf_counter() - t0) / REPS
    tops = 2 * M * N * K / dt / 1e12
    print(f"{tag:34s} {dt * 1e3:8.3f} ms  {tops:7.1f} T", flush=True)
    return tops


def main():
    global M, N, K
    enable_compilation_cache()
    k1, k2 = jax.random.split(jax.random.key(0))
    a8 = jax.random.randint(k1, (M, K), -127, 128, jnp.int8)
    b8 = jax.random.randint(k2, (K, N), -127, 128, jnp.int8)
    bt8 = jnp.asarray(np.asarray(b8).T)  # (N, K) row-major = K-minor RHS
    a16 = a8.astype(jnp.bfloat16)
    b16 = b8.astype(jnp.bfloat16)

    f_bf16 = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32))
    f_i32 = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.int32))
    f_mixed = jax.jit(
        lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
    )
    # int4-packed weight: int8 act x int4 weight (upcast inside) — some MXU
    # generations only expose the fast int path via narrower operands
    b4 = jnp.clip(b8, -8, 7).astype(jnp.int4)
    f_i4 = jax.jit(lambda x, y: jnp.dot(x, y.astype(jnp.int8), preferred_element_type=jnp.int32))
    f_i4n = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))

    bench(f_bf16, a16, b16, tag="bf16 x bf16 -> f32")
    bench(f_i32, a8, b8, tag="int8 x int8 -> int32 (jnp.dot)")
    bench(f_mixed, a8, b8, tag="int8 x int8 -> int32 (dot_general)")
    try:
        bench(f_i4, a8, b4, tag="int8 x int4(upcast8) -> int32")
        bench(f_i4n, a8, b4, tag="int8 x int4(native) -> int32")
    except Exception as e:  # int4 support varies by jaxlib
        print(f"int4 path unsupported: {type(e).__name__}: {e}", flush=True)
    # fp8 operands (v5e has no fp8 MXU; expect upcast-to-bf16 rate)
    try:
        a_f8 = a16.astype(jnp.float8_e4m3fn)
        b_f8 = b16.astype(jnp.float8_e4m3fn)
        f_f8 = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32))
        bench(f_f8, a_f8, b_f8, tag="fp8e4m3 x fp8e4m3 -> f32")
    except Exception as e:
        print(f"fp8 path unsupported: {type(e).__name__}: {e}", flush=True)

    # Layout variants: RHS stored (N, K) so the contracting dim is minor on
    # both operands — MXU weight-stationary loads sometimes prefer this.
    f_tn = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32))
    bench(f_tn, a8, bt8, tag="int8 TN (both K-minor) -> int32")
    f_tn16 = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32))
    bench(f_tn16, a16, jnp.asarray(np.asarray(b16).T), tag="bf16 TN -> f32")

    # int8 -> bf16 output (skip the s32 accumulator writeback width)
    f_i8bf = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16))
    bench(f_i8bf, a8, b8, tag="int8 x int8 -> bf16 out")

    # Wide-K variant: rate may need a longer K to amortize int8 pipe setup
    oldM, oldN, oldK = M, N, K
    M, N, K = 4096, 4096, 32768
    a8w = jax.random.randint(k1, (M, K), -127, 128, jnp.int8)
    b8w = jax.random.randint(k2, (K, N), -127, 128, jnp.int8)
    bench(f_i32, a8w, b8w, tag="int8 wide-K 4096x32768x4096")
    bench(f_bf16, a8w.astype(jnp.bfloat16), b8w.astype(jnp.bfloat16),
          tag="bf16 wide-K 4096x32768x4096")
    M, N, K = oldM, oldN, oldK

    # What does XLA actually emit for the s8 dot? Look for convert-to-bf16
    # (emulation) vs a native s8 fusion in the optimized HLO.
    txt = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.int32)).lower(a8, b8).compile().as_text()
    import re
    dots = [l.strip() for l in txt.splitlines() if re.search(r"(dot|convolution)\(", l)]
    convs = [l.strip() for l in txt.splitlines() if "convert" in l and ("bf16" in l or "f32" in l)]
    print("--- optimized HLO dot lines ---", flush=True)
    for l in dots[:6]:
        print(l[:160], flush=True)
    print(f"bf16/f32 converts in module: {len(convs)}", flush=True)


if __name__ == "__main__":
    main()
