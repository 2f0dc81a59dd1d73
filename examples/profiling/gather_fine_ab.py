"""Fine-gather sparse attention A/B on real TPU (round-2, VERDICT item 3).

At the Wan-A14B shape (75,600 tokens, block-64 radial mask): dense flash vs
the coarse 512x1024 gather (round-1 shipped, 1.33x) vs the fine gather
(sdpa_gather_fine: compute tiles assembled from compacted ACTIVE fine blocks
by manual double-buffered DMA — work ratio = fine density 0.234, ceiling ~4x).

Starts with a small-shape correctness check vs the jnp oracle ON HARDWARE
(the CPU interpreter hides OOB DMAs — memory: tpu-tunnel-workflow).

Run: nohup python examples/profiling/gather_fine_ab.py > /tmp/gather_ab.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache


def bench(fn, *args, reps=5):
    sync = lambda o: np.asarray(o.reshape(-1)[:8])
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    enable_compilation_cache()
    from fastdm_tpu.kernels.jnp_backend.impl import sdpa_gather_fine_jnp
    from fastdm_tpu.kernels.pallas.attention import (
        _flash_attention,
        sdpa_gather_fine_pallas,
        sdpa_gather_pallas,
    )
    from fastdm_tpu.sparse.config import RadialAttnConfig
    from fastdm_tpu.sparse.xsparse import RadialAttn

    rng = np.random.default_rng(0)

    # ---- hardware correctness first (small wan-like shape) ----
    cfg = RadialAttnConfig(block_size=64, decay_factor=0.2, model_type="wan")
    attn = RadialAttn(cfg)
    tokens, frames = 8 * 576, 8
    attn.post_init(video_token_num=tokens, num_frame=frames)
    idx, val, rows = attn.block_lists_fine(512, 8)
    h, d = 4, 128
    q = jnp.asarray(rng.standard_normal((1, tokens, h * d)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, tokens, h * d)) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, tokens, h * d)) * 0.5, jnp.bfloat16)
    args3 = (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))
    out_hw = sdpa_gather_fine_pallas(q, k, v, *args3, h, h, d,
                                     block_q=512, group=8, fine=64)
    out_or = sdpa_gather_fine_jnp(q, k, v, *args3, h, h, d,
                                  block_q=512, group=8, fine=64)
    md = float(jnp.max(jnp.abs(out_hw.astype(jnp.float32)
                               - out_or.astype(jnp.float32))))
    print(f"correctness (S={tokens}): maxdiff={md:.3e} "
          f"{'OK' if md < 2e-2 else 'FAIL'}", flush=True)
    if md >= 2e-2:
        return

    # ---- A14B shape perf ----
    tokens, frames = 75600, 21
    attn2 = RadialAttn(cfg)
    attn2.post_init(video_token_num=tokens, num_frame=frames)
    h, d = 40, 128
    q = jnp.asarray(rng.standard_normal((1, tokens, h * d)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, tokens, h * d)) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, tokens, h * d)) * 0.5, jnp.bfloat16)
    fine_mask = attn2._mask2d()
    print(f"fine mask density: {fine_mask.mean():.3f}", flush=True)
    tf_dense = 4 * h * tokens * tokens * d / 1e12

    t = bench(lambda q, k, v: _flash_attention(
        q, k, v, None, num_q_heads=h, num_kv_heads=h, head_dim=d,
        is_causal=False, scale=None, block_q=1024, block_k=2048,
        has_mask=False), q, k, v)
    t_dense = t
    print(f"dense bq1024/bk2048: {t*1e3:.1f} ms ({tf_dense/t:.0f} TFLOPS)",
          flush=True)

    ci, cc = attn2.block_lists(512, 1024)
    coarse_density = cc.sum() / (ci.shape[0] * (-(-tokens // 1024)))
    print(f"coarse 512x1024 density: {coarse_density:.3f}", flush=True)
    t = bench(lambda q, k, v: sdpa_gather_pallas(
        q, k, v, jnp.asarray(ci), jnp.asarray(cc), h, h, d,
        block_q=512, block_k=1024), q, k, v)
    print(f"coarse gather 512x1024: {t*1e3:.1f} ms ({t_dense/t:.2f}x dense)",
          flush=True)

    # CSR-flat tables: SMEM = active blocks (~380 KB at bq256), so the small
    # q tiles the 2D table OOMed on are now in play
    for bq, grp in [(512, 32), (256, 16), (256, 32), (256, 48), (128, 32)]:
        fi, fv, fr = attn2.block_lists_fine(bq, grp)
        nq = fr.shape[0]
        dens = fr[:, 1].sum() / (nq * (-(-tokens // 64)))
        print(f"  bq{bq}/G{grp}: flat table {fi.shape[0]} entries "
              f"({fi.shape[0] * 4 / 1024:.0f} KB SMEM), density {dens:.3f}",
              flush=True)
        try:
            t = bench(lambda q, k, v, a=jnp.asarray(fi), b_=jnp.asarray(fv),
                      c=jnp.asarray(fr), bq=bq, grp=grp:
                      sdpa_gather_fine_pallas(q, k, v, a, b_, c, h, h, d,
                                              block_q=bq, group=grp, fine=64),
                      q, k, v)
            print(f"fine gather bq{bq}/G{grp} (density {dens:.3f}): "
                  f"{t*1e3:.1f} ms ({t_dense/t:.2f}x dense)", flush=True)
        except Exception as e:
            print(f"fine gather bq{bq}/G{grp}: FAIL {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
