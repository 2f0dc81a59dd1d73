"""Dense flash-attention A/B on real TPU (round-2 perf work).

Variants at the FLUX joint shape and the Wan-A14B long shape:
  1. shipped kernel (f32 logits, jnp.exp2) across block configs — baseline
  2. stock jax.experimental pallas flash_attention — the sub-block
     (block_k_major/block_k) structure VERDICT.md round-1 item 1 asked about.

Round-2 verdict (2026-08-17, recorded in BENCH_NOTES.md): ours ties stock at
FLUX (10.4 vs 10.1 ms) and beats it at A14B (757 vs ~855 ms normalized);
bk2048 wins 5% at long shapes (now the shipped default for skv>=32k); the
polynomial-exp2 softmax variant measured 1.5x SLOWER everywhere and was
removed from the kernel along with the int8-QK path.

Run: nohup python examples/profiling/attn_dense_ab.py > /tmp/attn_ab.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache


def bench(fn, *args, reps=10):
    # one tiny-slice sync AFTER the rep loop: per-rep d2h syncs add a tunnel
    # round-trip (~20 ms) to every measurement (memory: tpu-tunnel-workflow)
    sync = lambda o: np.asarray(o.reshape(-1)[:8])
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    enable_compilation_cache()
    from fastdm_tpu.kernels.pallas.attention import _flash_attention

    rng = np.random.default_rng(0)
    shapes = [("flux", 1, 8704, 24, 128), ("a14b", 1, 75600, 40, 128)]

    for name, b, s, h, d in shapes:
        q = jnp.asarray(rng.standard_normal((b, s, h * d)) * 0.5, jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, h * d)) * 0.5, jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, h * d)) * 0.5, jnp.bfloat16)
        tf = 4 * b * h * s * s * d / 1e12
        print(f"== {name}: B{b} S{s} H{h} D{d} ({tf:.2f} TFLOP)", flush=True)

        def ours(q, k, v, bq=1024, bk=1024):
            return _flash_attention(
                q, k, v, None, num_q_heads=h, num_kv_heads=h, head_dim=d,
                is_causal=False, scale=None, block_q=bq, block_k=bk,
                has_mask=False)

        ref = None
        for bq, bk in [(1024, 1024), (1024, 2048), (2048, 1024)]:
            try:
                t = bench(lambda q, k, v: ours(q, k, v, bq, bk), q, k, v)
                out = ours(q, k, v, bq, bk)
                if ref is None:
                    ref = out
                    md = 0.0
                else:
                    md = float(jnp.max(jnp.abs(
                        out[:, :256].astype(jnp.float32)
                        - ref[:, :256].astype(jnp.float32))))
                print(f"  ours bq{bq}/bk{bk}: {t*1e3:.2f} ms "
                      f"({tf/t:.0f} TFLOPS) maxdiff={md:.1e}", flush=True)
            except Exception as e:
                print(f"  ours bq{bq}/bk{bk}: FAIL {type(e).__name__}: {e}",
                      flush=True)

        # stock flash (4D layout)
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention as stock_flash, BlockSizes)
            # stock flash requires seq divisible by its majors: zero-pad to the
            # same 9216/76800 our kernel internally pads to (extra keys carry
            # zero q-dot weight asymmetry but identical FLOPs accounting)
            sp = -(-s // 1024) * 1024
            while any(sp % m for m in (2304, 1536, 3072, 1024, 512, 768)):
                sp += 1024
            q4 = jnp.pad(q.reshape(b, s, h, d), ((0, 0), (0, sp - s), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
            k4 = jnp.pad(k.reshape(b, s, h, d), ((0, 0), (0, sp - s), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
            v4 = jnp.pad(v.reshape(b, s, h, d), ((0, 0), (0, sp - s), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
            print(f"  (stock padded to S={sp})", flush=True)
            for bqm, bkM, bkk in [(512, 2304, 768), (1024, 2048, 1024),
                                  (512, 1536, 512), (1024, 3072, 1024)]:
                try:
                    bs = BlockSizes(
                        block_q=bqm, block_k_major=min(bkM, s), block_k=min(bkk, s),
                        block_b=1, block_q_major_dkv=None, block_k_major_dkv=None,
                        block_k_dkv=None, block_q_dkv=None, block_k_major_dq=None,
                        block_k_dq=None, block_q_dq=None)
                    f = jax.jit(lambda q4, k4, v4: stock_flash(
                        q4, k4, v4, causal=False, sm_scale=d ** -0.5, block_sizes=bs))
                    t = bench(f, q4, k4, v4)
                    print(f"  stock bq{bqm}/bkM{bkM}/bk{bkk}: {t*1e3:.2f} ms "
                          f"({tf/t:.0f} TFLOPS)", flush=True)
                except Exception as e:
                    print(f"  stock bq{bqm}/bkM{bkM}/bk{bkk}: FAIL {type(e).__name__}: {e}",
                          flush=True)
        except ImportError as e:
            print(f"  stock flash unavailable: {e}", flush=True)


if __name__ == "__main__":
    main()
