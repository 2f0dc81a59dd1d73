"""Wan-A14B half-model forward at the real 720p/81f shape, dense vs
fine-gather radial sparse, on one v5e.

Round-1 measured 20/40 layers dense = 20.95 s (bq1024 kernels); this script
re-measures the same 20-layer forward with the round-2 fine-gather sparse
path (sdpa_gather_fine, CSR tables) to turn the kernel-level 2.01x into a
measured end-to-end forward number (BENCH_NOTES "A14B residency" section).

Round-3: A14B_QUANT=int4p packs the weights 0.5 byte/param (~7.2 GB for all
40 layers), which makes the FULL 40-layer 720p81f forward measurable on one
16GB chip — replacing the 20-layer extrapolation (VERDICT r2 item 3).

Run: nohup python -u examples/profiling/a14b_sparse_forward.py > /tmp/a14b.log 2>&1 &
Env: A14B_LAYERS (default 20), A14B_FRAMES (default 21 latent frames),
A14B_LH/A14B_LW (default 90x160 = 720p latents; 64x64 = the Lightning 512^2
serving shape), A14B_QUANT=int8|int4|int4p (default int8),
A14B_DENSE_ONLY=1 (skip the sparse half — Lightning's 1024
tokens/frame makes radial sparsity inapplicable, see BENCH_NOTES Wan-5B).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache


def main():
    enable_compilation_cache()
    from fastdm_tpu.models.wan import (
        WanConfig, wan_forward, wan_init_random, wan_rope_cos_sin,
    )
    from fastdm_tpu.sparse.config import RadialAttnConfig
    from fastdm_tpu.sparse.xsparse import RadialAttn

    layers = int(os.environ.get("A14B_LAYERS", 20))
    lf = int(os.environ.get("A14B_FRAMES", 21))  # 81 px frames -> 21 latent
    lh = int(os.environ.get("A14B_LH", 90))      # 720p latent default
    lw = int(os.environ.get("A14B_LW", 160))
    quant = os.environ.get("A14B_QUANT", "int8")
    cfg = WanConfig(num_layers=layers, quant=quant)
    params = jax.jit(lambda k: wan_init_random(k, cfg))(jax.random.key(0))
    pt, ph, pw = cfg.patch_size
    tokens = (lf // pt) * (lh // ph) * (lw // pw)
    wbytes = sum(x.size * x.dtype.itemsize
                 for x in jax.tree_util.tree_leaves(params))
    print(f"A14B {layers}/40 layers, {tokens} tokens, quant={quant}, "
          f"weights {wbytes/2**30:.2f} GiB", flush=True)

    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, cfg.in_channels, lf, lh, lw), jnp.bfloat16)
    text = jax.random.normal(k, (1, 512, cfg.text_dim), jnp.bfloat16)
    t = jnp.full((1,), 500.0)
    # wan_rope_cos_sin takes RAW latent dims (divides by patch internally)
    cos, sin = wan_rope_cos_sin(cfg, lf, lh, lw)

    def run(mask, tag):
        fwd = jax.jit(lambda p, x, tt, e: wan_forward(
            p, cfg, x, tt, e, rope_cos=cos, rope_sin=sin, sparse_mask=mask))
        out = fwd(params, lat, t, text)
        np.asarray(out[..., :1, :1, :1])  # d2h sync (tunnel-safe)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fwd(params, lat, t, text)
        np.asarray(out[..., :1, :1, :1])
        dt = (time.perf_counter() - t0) / 3
        print(f"{tag}: {dt:.2f} s/forward ({layers} layers) -> "
              f"x40-layer ~= {dt * 40 / layers:.1f} s", flush=True)
        return dt

    t_dense = run(None, "dense")
    if os.environ.get("A14B_DENSE_ONLY", "0") == "1":
        return

    sp = RadialAttn(RadialAttnConfig(block_size=64, decay_factor=0.2,
                                     model_type="wan"))
    sp.post_init(video_token_num=tokens, num_frame=lf // pt)
    mode = os.environ.get("A14B_GATHER", "super")  # engine default
    if mode == "super":
        import dataclasses as _dc

        sb = 4
        bq, grp = 256, 32
        cfg = _dc.replace(cfg, sparse_gather_fine_blocks=(bq, grp, 64),
                          sparse_gather_superblock=sb)
        idx, val, rows = sp.block_lists_super(bq, grp // sb, sb)
        fetched = rows[:, 1].sum() * sb / (rows.shape[0] * (-(-tokens // 64)))
        print(f"super tables: {idx.shape[0]} entries, fetched density "
              f"{fetched:.3f}", flush=True)
        tag = "super-gather sparse"
    else:
        bq, grp, fine = cfg.sparse_gather_fine_blocks
        idx, val, rows = sp.block_lists_fine(bq, grp)
        dens = rows[:, 1].sum() / (rows.shape[0] * (-(-tokens // fine)))
        print(f"fine tables: {idx.shape[0]} entries, q-coarsened density "
              f"{dens:.3f}", flush=True)
        tag = "fine-gather sparse"
    t_sparse = run((jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows)),
                   tag)
    print(f"forward speedup: {t_dense / t_sparse:.2f}x", flush=True)


if __name__ == "__main__":
    main()
