"""AOT memory analysis of the exact A14B dual-host branch program that OOMs
at 720p/81f (a14b_e2e.py): compiles the cached-branch jit with the real
shapes and prints XLA's memory_analysis (temp arena, args, outputs, alias
savings) plus device memory_stats if the platform exposes them. No 40-step
run — this isolates WHERE the ~16 GB goes."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import functools

import jax
import jax.numpy as jnp

from fastdm_tpu.utils.profiling import enable_compilation_cache


def main():
    enable_compilation_cache()
    from fastdm_tpu.caching.config import FBCacheConfig
    from fastdm_tpu.caching.xcaching import cache_init_state
    from fastdm_tpu.models.wan import (
        WanConfig, wan_forward_cached, wan_rope_cos_sin,
    )
    from fastdm_tpu.sparse.config import RadialAttnConfig
    from fastdm_tpu.sparse.xsparse import RadialAttn
    import dataclasses as dc

    layers = int(os.environ.get("A14B_LAYERS", 40))
    lf, lh, lw = 21, 90, 160
    cfg = WanConfig(num_layers=layers, quant="int4p",
                ffn_chunk_tokens=5400, split_qkv_proj=True)
    pt, ph, pw = cfg.patch_size
    tokens = (lf // pt) * (lh // ph) * (lw // pw)
    cfg = dc.replace(cfg, sparse_gather_fine_blocks=(256, 32, 64),
                     sparse_gather_superblock=4)

    sp = RadialAttn(RadialAttnConfig(block_size=64, decay_factor=0.2,
                                     model_type="wan"))
    sp.post_init(video_token_num=tokens, num_frame=lf)
    idx, val, rows = sp.block_lists_super(256, 8, 4)
    mask = (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))

    cache_cfg = FBCacheConfig(cache_algorithm="fbcache", enable_caching=True,
                              threshold=0.15, warmup_steps=8,
                              negtive_cache=True)
    hshape = (1, tokens, cfg.inner_dim)
    steps = 40

    @functools.partial(jax.jit, donate_argnums=(1,))
    def branch(p, cst, inp, t, step, text, rope_cos, rope_sin, m):
        out, cst = wan_forward_cached(
            p, cfg, cache_cfg, cst, step, steps,
            inp.astype(jnp.bfloat16), t, text,
            rope_cos=rope_cos, rope_sin=rope_sin, sparse_mask=m)
        return out.astype(jnp.float32), cst

    # abstract args — no device memory touched
    import numpy as np

    def sds(x):
        return jax.ShapeDtypeStruct(np.shape(x), x.dtype) \
            if hasattr(x, "dtype") else x

    params_tree = jax.eval_shape(
        lambda k: __import__("fastdm_tpu.models.wan", fromlist=["x"])
        .wan_init_random(k, cfg), jax.random.key(0))
    cst = jax.eval_shape(lambda: cache_init_state(cache_cfg, hshape, hshape))
    inp = jax.ShapeDtypeStruct((1, cfg.in_channels, lf, lh, lw), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    step = jax.ShapeDtypeStruct((), jnp.int32)
    text = jax.ShapeDtypeStruct((1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(cfg, lf, lh, lw)
    lowered = branch.lower(params_tree, cst, inp, t, step, text,
                           jax.eval_shape(lambda: cos),
                           jax.eval_shape(lambda: sin),
                           jax.tree.map(lambda x: jax.eval_shape(lambda: x),
                                        mask))
    print("lowered; compiling...", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gib = 2**30
    print(f"args      {ma.argument_size_in_bytes / gib:8.2f} GiB")
    print(f"outputs   {ma.output_size_in_bytes / gib:8.2f} GiB")
    print(f"temps     {ma.temp_size_in_bytes / gib:8.2f} GiB")
    print(f"aliased   {ma.alias_size_in_bytes / gib:8.2f} GiB")
    print(f"gen code  {ma.generated_code_size_in_bytes / gib:8.2f} GiB")
    tot = (ma.argument_size_in_bytes + ma.output_size_in_bytes
           + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    print(f"peak (args+out+temp-alias) {tot / gib:8.2f} GiB", flush=True)

    import re

    hlo = compiled.as_text()
    import numpy as _np
    big = {}
    for m in re.finditer(r"(f32|bf16|s32|s8|u8)\[([0-9,]+)\]", hlo):
        dt, dims = m.group(1), [int(x) for x in m.group(2).split(",")]
        sz = int(_np.prod(dims)) * {"f32": 4, "s32": 4, "bf16": 2,
                                    "s8": 1, "u8": 1}[dt]
        if sz >= 256 * 2**20:
            key = f"{dt}[{m.group(2)}] = {sz / 2**30:.2f} GiB"
            big[key] = big.get(key, 0) + 1
    print("\n>=256MiB shapes in optimized HLO (mention counts):")
    for k, v in sorted(big.items(), key=lambda kv: -kv[1]):
        print(f"  {v:4d}x {k}", flush=True)



if __name__ == "__main__":
    main()
