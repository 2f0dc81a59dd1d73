"""Fast HBM-temp feedback loop for the A14B compile OOM: compile ONE
wan_block at the full 720p/81f shape (75600 tokens, int4p, super-gather
sparse) and print the compiler's memory analysis + every HLO temp >= 256 MiB
with its dtype — so f32 ghosts (the 2x 1.44 GiB [9450,8,40,128] buffers in
the 2026-08-20 a14b_e2e OOM) can be localized and fixes verified in ~2 min
instead of a ~15 min full-denoiser compile.

Run on TPU: python -u examples/profiling/wan_block_mem_probe.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import dataclasses as dc

    from fastdm_tpu.kernels import kernel_registry
    from fastdm_tpu.models.wan import (
        WanConfig, _block_random, wan_block, wan_rope_cos_sin,
    )
    from fastdm_tpu.sparse.config import RadialAttnConfig
    from fastdm_tpu.sparse.xsparse import RadialAttn

    print("rotembd backend:", kernel_registry.backend_for("rotembd"),
          "| rms_norm:", kernel_registry.backend_for("rms_norm"),
          "| matmul_int4:",
          kernel_registry.backend_for("matmul_int4")
          if "matmul_int4" in kernel_registry._ops else "n/a", flush=True)

    quant = os.environ.get("PROBE_QUANT", "int4p")
    cfg = WanConfig(num_layers=1, quant=quant)
    bq, grp, sb = 256, 32, 4
    cfg = dc.replace(cfg, sparse_gather_fine_blocks=(bq, grp, 64),
                     sparse_gather_superblock=sb)
    lf, lh, lw = 21, 90, 160
    pt, ph, pw = cfg.patch_size
    tokens = (lf // pt) * (lh // ph) * (lw // pw)

    sp = RadialAttn(RadialAttnConfig(block_size=64, decay_factor=0.2,
                                     model_type="wan"))
    sp.post_init(video_token_num=tokens, num_frame=lf // pt)
    idx, val, rows = sp.block_lists_super(bq, grp // sb, sb)
    mask = (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))

    blk = jax.jit(lambda k: _block_random(k, cfg))(jax.random.key(0))
    h = jax.random.normal(jax.random.key(1), (1, tokens, cfg.inner_dim),
                          jnp.bfloat16)
    enc = jax.random.normal(jax.random.key(2), (1, cfg.text_len, cfg.inner_dim),
                            jnp.bfloat16)
    t6 = jax.random.normal(jax.random.key(3), (1, 6, cfg.inner_dim),
                           jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(cfg, lf, lh, lw)

    fn = jax.jit(lambda b, hh, ee, tt: wan_block(b, hh, ee, tt, cos, sin,
                                                 cfg, mask))
    print("lowering + compiling one wan_block at full shape...", flush=True)
    comp = fn.lower(blk, h, enc, t6).compile()
    ma = comp.memory_analysis()
    print(ma, flush=True)

    hlo = comp.as_text()
    # every >=256MiB allocation-like shape in the optimized HLO, grouped
    big = {}
    for m in re.finditer(r"(f32|bf16|s32|s8|u8)\[([0-9,]+)\]", hlo):
        dt, dims = m.group(1), [int(x) for x in m.group(2).split(",")]
        sz = int(np.prod(dims)) * {"f32": 4, "s32": 4, "bf16": 2,
                                   "s8": 1, "u8": 1}[dt]
        if sz >= 256 * 2**20:
            key = f"{dt}[{m.group(2)}] = {sz / 2**30:.2f} GiB"
            big[key] = big.get(key, 0) + 1
    print("\n>=256MiB shapes in optimized HLO (mention counts):")
    for k, v in sorted(big.items(), key=lambda kv: -kv[1]):
        print(f"  {v:4d}x {k}")

    # the specific ghosts from the a14b OOM
    for pat in (r"f32\[9450,8,40,128\]", r"f32\[75600", r"f32\[1,75600"):
        n = len(re.findall(pat, hlo))
        print(f"ghost {pat}: {n} mentions")


if __name__ == "__main__":
    main()
