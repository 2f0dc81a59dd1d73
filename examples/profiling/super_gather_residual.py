"""Super-gather residual split (VERDICT r3 weak #5): the kernel shipped at
~63-65% of its fetch-density ideal (362 ms vs ~231 ms at density 0.304) with
the residual ATTRIBUTED to "scatter latency + grid constants" but never
split. This probe separates the two with same-session A/Bs at the real A14B
shape (1 x 75600 x 40 x 128, bq256/grp32/sb4):

  dense          — pallas flash at the same shape: the rate reference;
                   ideal_sparse = dense * fetched_density.
  real tables    — the radial super tables the engine ships (the 362 ms).
  contig tables  — SAME row counts (same DMA count, sizes, compute), indices
                   rewritten to CONSECUTIVE superblocks: every fetch is
                   sequential HBM. real - contig == the scatter (random
                   access) premium; contig - ideal == grid/pipeline
                   constants.
  slots=4        — double the DMA ring depth on the real tables: if the
                   scatter premium is latency (not bandwidth), deeper
                   buffering hides it.

Decision rule (VERDICT): ship whatever reaches >= 2.2x over dense, else
record the split as the closing negative result.

Run on TPU: nohup python -u examples/profiling/super_gather_residual.py \
  > /tmp/sg_residual.log 2>&1 &
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache

N_ITER = int(os.environ.get("SG_ITERS", 5))
REPS = 3

B, S, H, HD = 1, 75600, 40, 128
BQ, GRP, FINE, SB = 256, 32, 64, 4


def timeit(fn, args, tag, flops=None):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / N_ITER
    rate = f" {flops / per / 1e12:6.1f} T" if flops else ""
    print(f"{tag:34s} {per * 1e3:9.1f} ms/layer-attn{rate}", flush=True)
    return per


def ingraph(attn_fn):
    """Scan over varying q (k/v loop-invariant — they are per-layer in the
    model too), max-checksum consumed."""

    @jax.jit
    def run(qs, k, v):
        def body(c, q):
            o = attn_fn(q, k, v)
            return jnp.maximum(c, jnp.max(o.astype(jnp.float32))), None

        c, _ = jax.lax.scan(body, jnp.float32(0), qs)
        return c

    return run


def contiguous_like(idx, rows, nsuper):
    """Rewrite each q-row's superblock list to CONSECUTIVE ids starting at
    its first entry (wrapped into range): same entry count per row, same DMA
    sizes, sequential HBM addresses."""
    idx2 = np.asarray(idx).copy()
    rows_np = np.asarray(rows)
    for r in range(rows_np.shape[0]):
        start, cnt = int(rows_np[r, 0]), int(rows_np[r, 1])
        base = int(idx2[start]) if cnt else 0
        base = min(base, max(nsuper - cnt, 0))
        idx2[start : start + cnt] = (base + np.arange(cnt)) % nsuper
    return idx2


def main():
    enable_compilation_cache()
    from fastdm_tpu.kernels.ops import (
        gather_super_attention,
        scaled_dot_product_attention,
    )
    from fastdm_tpu.sparse.config import RadialAttnConfig
    from fastdm_tpu.sparse.xsparse import RadialAttn

    print(f"devices: {jax.devices()}", flush=True)
    lf = 21  # latent frames at 81px
    sp = RadialAttn(RadialAttnConfig(block_size=64, decay_factor=0.2,
                                     model_type="wan"))
    sp.post_init(video_token_num=S, num_frame=lf)
    idx, val, rows = sp.block_lists_super(BQ, GRP // SB, SB)
    nsuper = -(-(-(-S // FINE)) // SB)
    dens = rows[:, 1].sum() * SB / (rows.shape[0] * (-(-S // FINE)))
    print(f"tables: {idx.shape[0]} entries, fetched density {dens:.3f}",
          flush=True)

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    qs = jax.random.normal(k1, (N_ITER, B, S, H * HD), jnp.bfloat16)
    k = jax.random.normal(k2, (B, S, H * HD), jnp.bfloat16)
    v = jax.random.normal(k3, (B, S, H * HD), jnp.bfloat16)
    flops = 4 * S * S * H * HD  # dense-equivalent

    t_dense = timeit(
        ingraph(lambda q, kk, vv: scaled_dot_product_attention(
            q, kk, vv, H, H, HD, False, HD**-0.5)),
        (qs, k, v), "dense flash", flops)
    ideal = t_dense * float(dens)
    print(f"{'ideal = dense x density':34s} {ideal * 1e3:9.1f} ms", flush=True)

    def gather_fn(i, vl, r, slots):
        i, vl, r = jnp.asarray(i), jnp.asarray(vl), jnp.asarray(r)
        return lambda q, kk, vv: gather_super_attention(
            q, kk, vv, i, vl, r, H, H, HD, scale=HD**-0.5, block_q=BQ,
            group=GRP // SB, fine=FINE, superblock=SB, slots=slots)

    t_real = timeit(ingraph(gather_fn(idx, val, rows, 2)),
                    (qs, k, v), "real tables, slots=2")
    idx_c = contiguous_like(idx, rows, nsuper)
    t_contig = timeit(ingraph(gather_fn(idx_c, val, rows, 2)),
                      (qs, k, v), "contig tables, slots=2")
    t_real4 = timeit(ingraph(gather_fn(idx, val, rows, 4)),
                     (qs, k, v), "real tables, slots=4")
    t_contig4 = timeit(ingraph(gather_fn(idx_c, val, rows, 4)),
                       (qs, k, v), "contig tables, slots=4")

    print("\n== split ==")
    print(f"dense -> real speedup           {t_dense / t_real:.2f}x "
          f"(target >= 2.2x)")
    print(f"scatter premium (real - contig) {(t_real - t_contig) * 1e3:8.1f} ms")
    print(f"grid constants (contig - ideal) {(t_contig - ideal) * 1e3:8.1f} ms")
    print(f"slots=4 on real                 {(t_real - t_real4) * 1e3:8.1f} ms "
          f"({t_dense / t_real4:.2f}x)")
    print(f"slots=4 on contig               {(t_contig - t_contig4) * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
