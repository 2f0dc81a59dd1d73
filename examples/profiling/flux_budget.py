"""FLUX headline per-step time budget at the bench shape (VERDICT r4 #2):
decompose the ~1.0 s int4p forward (1024x2048, 8192 img + 512 txt tokens)
into matmul / attention / elementwise+rest buckets with MEASURED kernel
calls at the exact constituent shapes, next to the full-forward wall.

Buckets:
  * full forward      — flux_forward, 1 jit, min of reps
  * attention         — the flash sdpa kernel at (1, 8704, 24x128),
                        x(19 dual + 38 single) calls
  * int4 matmuls      — int4_matmul (s4 MXU dot + epilogue) at every
                        distinct (M, K, N) in the model, weighted by count
  * lora branches     — the SVDQuant rank-32 bf16 side paths
  * remainder         — full - (attention + matmul + lora): norms, rope,
                        adaLN modulation, quantize, concat/slicing, XLA
                        scheduling slack

Each bucket is a *standalone-kernel* sum — fusion inside the real forward
can make the true share smaller (remainder absorbs the difference), so the
budget brackets where optimization effort can pay.

Run (TPU): python examples/profiling/flux_budget.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache


def _sync(out):
    # d2h of ONE element (device-side slice first): np.asarray of the full
    # output ships the whole tensor over the tunnel (~1 s for 53 MB) and
    # poisons microbenchmarks
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


def timed(fn, *args, reps=5):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    enable_compilation_cache()
    from fastdm_tpu.kernels import scaled_dot_product_attention
    from fastdm_tpu.layers.qlinear import qlinear_apply, qlinear_random
    from fastdm_tpu.models.flux import (
        FluxConfig, flux_forward, flux_init_random, flux_rope_cache,
    )

    quant = os.environ.get("BUDGET_QUANT", "int4p")
    cfg = FluxConfig(quant=quant)
    ht, wt = 1024 // 16, 2048 // 16          # 64 x 128 = 8192 img tokens
    txt = 512
    s = ht * wt + txt                        # 8704 joint tokens
    d = cfg.inner_dim                        # 3072
    mlp = int(cfg.inner_dim * cfg.mlp_ratio)  # 12288
    key = jax.random.key(0)

    # ---- full forward
    params = jax.jit(lambda k: flux_init_random(k, cfg))(key)
    cos, sin = flux_rope_cache(cfg, txt, ht, wt)
    hidden = jax.random.normal(key, (1, ht * wt, cfg.in_channels), jnp.bfloat16)
    enc = jax.random.normal(key, (1, txt, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(key, (1, cfg.pooled_projection_dim), jnp.bfloat16)
    t = jnp.full((1,), 0.5, jnp.float32)
    g = jnp.full((1,), 3.5, jnp.float32)
    fwd = jax.jit(lambda p, h: flux_forward(p, cfg, h, enc, pooled, t, cos,
                                            sin, guidance=g))
    t_full = timed(fwd, params, hidden)
    print(f"full forward: {t_full*1e3:8.1f} ms", flush=True)

    # ---- attention bucket: 57 joint-attention calls at (1, 8704, 24, 128)
    h_, hd = cfg.num_attention_heads, cfg.attention_head_dim
    q_ = jax.random.normal(key, (1, s, d), jnp.bfloat16)
    attn = jax.jit(lambda q, k, v: scaled_dot_product_attention(
        q, k, v, h_, h_, hd, False, hd ** -0.5))
    t_attn1 = timed(attn, q_, q_, q_)
    n_attn = cfg.num_layers + cfg.num_single_layers
    print(f"attention:    {t_attn1*1e3:8.2f} ms x {n_attn} = "
          f"{t_attn1*n_attn*1e3:8.1f} ms", flush=True)

    # ---- matmul bucket: distinct (M, K, N) x count  (img-stream M = 8192,
    # txt-stream M = 512; single blocks run the joint 8704 stream)
    sd_, si = 8192, 512
    shapes = []
    # dual blocks x19: img qkv, txt qkv, img out, txt out, img mlp in/out,
    # txt mlp in/out, adaLN 6d x2 (M=1)
    shapes += [(sd_, d, 3 * d, 19), (si, d, 3 * d, 19),
               (sd_, d, d, 19), (si, d, d, 19),
               (sd_, d, mlp, 19), (sd_, mlp, d, 19),
               (si, d, mlp, 19), (si, mlp, d, 19)]
    # single blocks x38: fused qkv+mlp_in (d -> 3d+mlp), proj_out
    # (d+mlp -> d), adaLN 3d
    shapes += [(s, d, 3 * d + mlp, 38), (s, d + mlp, d, 38)]
    t_mm = 0.0
    t_lora = 0.0
    for m, k_, n, cnt in shapes:
        p = qlinear_random(jax.random.key(1), k_, n, quant=quant)
        x = jax.random.normal(key, (m, k_), jnp.bfloat16)
        f = jax.jit(lambda pp, xx: qlinear_apply(pp, xx))
        tt = timed(f, p, x)
        t_mm += tt * cnt
        if "lora_u" in p:
            fl = jax.jit(lambda pp, xx: (
                (xx @ pp["lora_u"]) @ pp["lora_v"]).astype(jnp.bfloat16))
            t_lora += timed(fl, p, x) * cnt
        flops = 2 * m * k_ * n
        print(f"  qlinear {m:5d}x{k_:5d}x{n:5d} x{cnt:2d}: {tt*1e3:7.2f} ms "
              f"({flops/tt/1e12:6.1f} TOPS)", flush=True)
    print(f"matmuls:      {t_mm*1e3:8.1f} ms (incl lora {t_lora*1e3:.1f})",
          flush=True)
    rest = t_full - t_attn1 * n_attn - t_mm
    print(f"remainder:    {rest*1e3:8.1f} ms "
          f"({100*rest/t_full:.0f}% of full)", flush=True)
    # attention TFLOPs for reference
    fl_attn = 4 * s * s * d
    print(f"attention kernel rate: {fl_attn/t_attn1/1e12:.1f} TFLOPs "
          f"(bf16 peak ~197)", flush=True)


if __name__ == "__main__":
    main()
