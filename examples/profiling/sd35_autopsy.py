"""SD3.5-medium autopsy (VERDICT r3 weak #2): the worst bench row (11.045 s
vs H20 6.03 s, 0.546) shipped with "HBM-bandwidth-bound end to end" asserted
from the hardware ratio. This gives it the same treatment FLUX got: an
in-graph per-shape rate table + a component-sum accounting of the 736 ms
batched-CFG step, so the floor is either proven or a lever falls out.

Decomposition levels (all in-graph via lax.scan over stacked varying inputs,
max-checksum consumed — the house methodology, ingraph_rate.py):

  A. every matmul shape of the step on the REAL W8A8 azp path
     (quantize + s8 dot + azp epilogue), batch-2 CFG token counts,
  B. dense flash attention at the joint shape (2, 8525, 24 heads, d=64) —
     head_dim 64, HALF the MXU contraction of FLUX's 128,
  C. one sd3_joint_block (dual & non-dual) with real random params,
  D. the full sd3_forward (what the bench's denoiser scans).

Accounting: D vs 24xC + embed/out, C vs sum(A parts) + B — whatever gap
appears between levels localizes the loss (inter-layer, within-layer, or
per-shape). Run on TPU:
  nohup python -u examples/profiling/sd35_autopsy.py > /tmp/sd35.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache

N_ITER = int(os.environ.get("SD35_ITERS", 10))
REPS = 3

# SD3.5-medium at 1024x2048 batched CFG: img 8192 tokens (128x256 latents,
# patch 2), text 333; dim 1536 (24 x 64), ff 6144
B, S_IMG, S_TXT, D, HEADS, HD, FF = 2, 8192, 333, 1536, 24, 64, 6144
M_IMG, M_TXT = B * S_IMG, B * S_TXT


def timeit(fn, args, tag, work_flops=None):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / N_ITER
    rate = f" {work_flops / per / 1e12:7.1f} T" if work_flops else ""
    print(f"{tag:46s} {per * 1e3:9.3f} ms/iter{rate}", flush=True)
    return per


def part_a_matmuls():
    print("== A. per-matmul in-graph rates (W8A8 azp, the model path) ==",
          flush=True)
    from fastdm_tpu.kernels.jnp_backend.impl import (
        int8_matmul_jnp,
        quantize_to_int8_jnp,
    )

    shapes = [
        ("qkv img", M_IMG, D, 3 * D),
        ("attn out img", M_IMG, D, D),
        ("ff proj img", M_IMG, D, FF),
        ("ff out img", M_IMG, FF, D),
        ("add_qkv ctx", M_TXT, D, 3 * D),
        ("ff proj ctx", M_TXT, D, FF),
        ("norm1 mod (6D)", B, D, 6 * D),
    ]
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    total = 0.0
    for tag, m, kk, n in shapes:
        flops = 2 * m * kk * n
        xs = jax.random.normal(k1, (N_ITER, m, kk), jnp.bfloat16)
        b8 = jax.random.randint(k2, (N_ITER, kk, n), -127, 128, jnp.int8)
        sb = jnp.abs(jax.random.normal(k3, (N_ITER, n), jnp.float32)) + 0.01
        adj = jnp.sum(b8.astype(jnp.int32), axis=1)
        bias = jax.random.normal(k3, (N_ITER, n), jnp.float32)

        @jax.jit
        def run(xs, b8, sb, adj, bias):
            def body(c, ws):
                x, b, s, j, bi = ws
                q, sa, zp = quantize_to_int8_jnp(x, symmetric=False)
                o = int8_matmul_jnp(q, b, sa, s, jnp.bfloat16, j, zp, bi)
                return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None

            c, _ = jax.lax.scan(body, jnp.float32(0), (xs, b8, sb, adj, bias))
            return c

        total += timeit(run, (xs, b8, sb, adj, bias), f"W8A8 azp {tag}",
                        flops)
        del xs, b8, sb, adj, bias
    return total


def part_b_attention():
    print("== B. dense flash attention, joint shape, head_dim 64 ==",
          flush=True)
    from fastdm_tpu.kernels.ops import scaled_dot_product_attention as sdpa

    s = S_IMG + S_TXT
    k1, k2 = jax.random.split(jax.random.key(1))
    qs = jax.random.normal(k1, (N_ITER, B, s, HEADS * HD), jnp.bfloat16)
    kv = jax.random.normal(k2, (2, B, s, HEADS * HD), jnp.bfloat16)

    @jax.jit
    def run(qs, kv):
        def body(c, q):
            o = sdpa(q, kv[0], kv[1], HEADS, HEADS, HD)
            return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None

        c, _ = jax.lax.scan(body, jnp.float32(0), qs)
        return c

    flops = B * 4 * s * s * HEADS * HD
    return timeit(run, (qs, kv), f"flash attn (2,{s},{HEADS},{HD})", flops)


def part_c_block():
    print("== C. one sd3_joint_block in-graph ==", flush=True)
    from fastdm_tpu.models.sd35 import (
        SD3Config, _joint_block_random, sd3_joint_block,
    )

    cfg = SD3Config(quant="int8")
    h = jax.random.normal(jax.random.key(2), (B, S_IMG, D), jnp.bfloat16)
    e = jax.random.normal(jax.random.key(3), (B, S_TXT, D), jnp.bfloat16)
    temb = jax.random.normal(jax.random.key(4), (B, D), jnp.bfloat16)
    out = {}
    for dual in (True, False):
        blocks = [
            _joint_block_random(k, cfg, dual=dual, last=False)
            for k in jax.random.split(jax.random.key(5), 2)
        ]
        # alternate two blocks so weights are not loop-invariant (mirrors the
        # model's per-layer weight stream from HBM)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

        @jax.jit
        def run(stacked, h, e, temb):
            def body(carry, i):
                hh, ee = carry
                blk = jax.tree.map(lambda x: x[i % 2], stacked)
                hh, ee = sd3_joint_block(blk, hh, ee, temb, cfg, dual=dual,
                                         last=False)
                return (hh, ee), None

            (hh, ee), _ = jax.lax.scan(body, (h, e), jnp.arange(N_ITER))
            return jnp.max(hh.astype(jnp.float32))

        out[dual] = timeit(run, (stacked, h, e, temb),
                           f"sd3_joint_block dual={dual}")
    return out


def part_d_forward():
    print("== D. full sd3_forward (bench workload, 1 forward) ==", flush=True)
    from fastdm_tpu.models.sd35 import (
        SD3Config, sd3_cropped_pos_embed, sd3_forward, sd3_init_random,
    )

    cfg = SD3Config(quant="int8", num_layers=24, num_dual_layers=13)
    params = jax.jit(lambda k: sd3_init_random(k, cfg))(jax.random.key(0))
    lh, lw = 128, 256
    lat = jax.random.normal(jax.random.key(6), (B, cfg.in_channels, lh, lw),
                            jnp.bfloat16)
    emb = jax.random.normal(jax.random.key(7),
                            (B, S_TXT, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(8),
                               (B, cfg.pooled_projection_dim), jnp.bfloat16)
    pos = sd3_cropped_pos_embed(cfg, None, lh, lw)
    t = jnp.full((B,), 500.0, jnp.float32)

    @jax.jit
    def run(params, lat, emb, pooled, t):
        return sd3_forward(params, cfg, lat, emb, pooled, t, pos)

    np.asarray(run(params, lat, emb, pooled, t))
    best = float("inf")
    for _ in range(REPS + 2):
        t0 = time.perf_counter()
        np.asarray(run(params, lat, emb, pooled, t))
        best = min(best, time.perf_counter() - t0)
    print(f"{'sd3_forward (batched CFG step, no sched)':46s} "
          f"{best * 1e3:9.3f} ms", flush=True)
    return best


def main():
    enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)
    t_mm = part_a_matmuls()
    t_attn = part_b_attention()
    t_blk = part_c_block()
    t_fwd = part_d_forward()
    n_dual, n_single = 13, 11
    sum_blocks = n_dual * t_blk[True] + n_single * t_blk[False]
    print("\n== accounting ==")
    print(f"sum(A matmuls, img+ctx, x1 layer)    {t_mm * 1e3:9.3f} ms")
    print(f"B attention / layer                  {t_attn * 1e3:9.3f} ms")
    print(f"C block dual                         {t_blk[True] * 1e3:9.3f} ms")
    print(f"C block single                       {t_blk[False] * 1e3:9.3f} ms")
    print(f"13*dual + 11*single                  {sum_blocks * 1e3:9.3f} ms")
    print(f"D full forward                       {t_fwd * 1e3:9.3f} ms")
    print(f"bench step (measured 2026-08-19)        736.000 ms")
    print(f"  D - blocks = embed/unembed/overhead "
          f"{(t_fwd - sum_blocks) * 1e3:9.3f} ms")
    print(f"  C - (A+B) = within-layer overhead (dual) "
          f"{(t_blk[True] - t_mm - t_attn) * 1e3:9.3f} ms")


if __name__ == "__main__":
    main()
