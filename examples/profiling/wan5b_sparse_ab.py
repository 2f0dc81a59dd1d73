"""Wan2.2-5B-shape sparse attention A/B on real TPU (round-3, VERDICT item 2).

Round-2's "radial doesn't pay below ~3600 tokens/frame" write-off was measured
through the COARSE 512x1024 OR-reduced gather (density 0.998 at this shape) —
before the fine CSR-flat gather landed. This re-measures the 5B flagship
attention shape (768^2 x 121f with the 16x-compression TI2V VAE: 576
tokens/frame x 31 latent frames = 17,856 tokens, 24 heads x 128) through
`sdpa_gather_fine`, whose work ratio is the FINE density (~0.35 here).

Decision rule (recorded in BENCH_NOTES either way): flip the engine's 5B
sparse recommendation if fine-gather >= 1.2x dense.

Run: nohup python examples/profiling/wan5b_sparse_ab.py > /tmp/wan5b_ab.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

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
    from fastdm_tpu.kernels.pallas.attention import (
        _flash_attention,
        sdpa_gather_fine_pallas,
        sdpa_gather_pallas,
    )
    from fastdm_tpu.sparse.config import RadialAttnConfig
    from fastdm_tpu.sparse.xsparse import RadialAttn

    rng = np.random.default_rng(0)

    # 5B flagship attention shape (BASELINE.md row: 768^2 x 121f x 50 steps)
    tokens, frames = 576 * 31, 31
    h, d = 24, 128
    cfg = RadialAttnConfig(block_size=64, decay_factor=0.2, model_type="wan")
    attn = RadialAttn(cfg)
    attn.post_init(video_token_num=tokens, num_frame=frames)

    q = jnp.asarray(rng.standard_normal((1, tokens, h * d)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, tokens, h * d)) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, tokens, h * d)) * 0.5, jnp.bfloat16)
    fine_density = float(attn._mask2d().mean())
    print(f"tokens={tokens} frames={frames} heads={h} "
          f"fine mask density: {fine_density:.3f}", flush=True)
    tf_dense = 4 * h * tokens * tokens * d / 1e12

    t_dense = bench(lambda q, k, v: _flash_attention(
        q, k, v, None, num_q_heads=h, num_kv_heads=h, head_dim=d,
        is_causal=False, scale=None, block_q=1024, block_k=2048,
        has_mask=False), q, k, v)
    print(f"dense bq1024/bk2048: {t_dense*1e3:.1f} ms "
          f"({tf_dense/t_dense:.0f} TFLOPS)", flush=True)

    ci, cc = attn.block_lists(512, 1024)
    coarse_density = cc.sum() / (ci.shape[0] * (-(-tokens // 1024)))
    t = bench(lambda q, k, v: sdpa_gather_pallas(
        q, k, v, jnp.asarray(ci), jnp.asarray(cc), h, h, d,
        block_q=512, block_k=1024), q, k, v)
    print(f"coarse gather 512x1024 (density {coarse_density:.3f}): "
          f"{t*1e3:.1f} ms ({t_dense/t:.2f}x dense)", flush=True)

    best = (None, t_dense)
    for bq, grp in [(512, 32), (512, 16), (256, 16), (256, 32)]:
        fi, fv, fr = attn.block_lists_fine(bq, grp)
        nq = fr.shape[0]
        dens = fr[:, 1].sum() / (nq * (-(-tokens // 64)))
        try:
            t = bench(lambda q, k, v, a=jnp.asarray(fi), b_=jnp.asarray(fv),
                      c=jnp.asarray(fr), bq=bq, grp=grp:
                      sdpa_gather_fine_pallas(q, k, v, a, b_, c, h, h, d,
                                              block_q=bq, group=grp, fine=64),
                      q, k, v)
            print(f"fine gather bq{bq}/G{grp} (density {dens:.3f}): "
                  f"{t*1e3:.1f} ms ({t_dense/t:.2f}x dense)", flush=True)
            if t < best[1]:
                best = ((bq, grp), t)
        except Exception as e:
            print(f"fine gather bq{bq}/G{grp}: FAIL {type(e).__name__}: {e}",
                  flush=True)

    if best[0] is not None:
        print(f"BEST fine config {best[0]}: {best[1]*1e3:.1f} ms "
              f"= {t_dense/best[1]:.2f}x dense "
              f"({'FLIP 5B default to sparse' if t_dense/best[1] >= 1.2 else 'keep dense default'})",
              flush=True)
    else:
        print("no fine config beat dense; keep dense default", flush=True)


if __name__ == "__main__":
    main()
