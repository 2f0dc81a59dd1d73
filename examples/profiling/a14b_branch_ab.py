"""Single cached-branch-call A/B at the full A14B 720p/81f shape: FFN/proj
chunk size x split_qkv on one v5e — the forward cost term of the e2e row
(863 s @ 24 computed branch-forwards, BENCH_NOTES r5). Measures the exact
jitted program the dual-host denoiser dispatches per CFG branch.

Run: python examples/profiling/a14b_branch_ab.py
Env: AB_CHUNKS (comma list, default "5400,7560,9450"), A14B_QUANT (int4p).
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


def main():
    enable_compilation_cache()
    import dataclasses as dc

    from fastdm_tpu.caching.config import FBCacheConfig
    from fastdm_tpu.models import snapshot as snap
    from fastdm_tpu.models.wan import (
        WanConfig, wan_forward_cached, wan_init_random, wan_rope_cos_sin,
    )

    quant = os.environ.get("A14B_QUANT", "int4p")
    lf, lh, lw = 21, 90, 160
    base = WanConfig(num_layers=40, quant=quant,
                     sparse_gather_fine_blocks=(256, 32, 64),
                     sparse_gather_superblock=4)
    pt = base.patch_size
    tokens = (lf // pt[0]) * (lh // pt[1]) * (lw // pt[2])

    cache_dir = os.environ.get("A14B_SNAPSHOT", "/root/a14b_experts_snapshot")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        m = snap.load_manifest(cache_dir)
        params_host = snap.load_tree(cache_dir, "expert_1", m)
    params = jax.device_put(params_host, jax.devices()[0])
    jax.block_until_ready(params)

    tab = np.load(f"/tmp/a14b_tables/d0.2_t{tokens}_f{lf}_256_32_4.npz")
    mask = (jnp.asarray(tab["idx"]), jnp.asarray(tab["val"]),
            jnp.asarray(tab["rows"]))

    cache_cfg = FBCacheConfig(cache_algorithm="fbcache", enable_caching=True,
                              threshold=0.15, warmup_steps=8,
                              negtive_cache=True)
    steps = 40
    hshape = (1, tokens, base.inner_dim)
    cos, sin = wan_rope_cos_sin(base, lf, lh, lw)
    inp = jax.random.normal(jax.random.key(1), (1, 16, lf, lh, lw),
                            jnp.float32)
    text = jax.random.normal(jax.random.key(2), (1, base.text_len,
                                                 base.text_dim), jnp.bfloat16)
    t = jnp.full((1,), 900.0, jnp.float32)

    chunks = [int(c) for c in
              os.environ.get("AB_CHUNKS", "5400,7560,9450").split(",")]
    for ct in chunks:
        for split in ([True] if ct else [True, False]):
            cfg = dc.replace(base, ffn_chunk_tokens=ct, split_qkv_proj=split)

            @functools.partial(jax.jit, donate_argnums=(1,))
            def branch(p, cst, step):
                out, cst = wan_forward_cached(
                    p, cfg, cache_cfg, cst, step, steps,
                    inp.astype(jnp.bfloat16), t, text,
                    rope_cos=cos, rope_sin=sin, sparse_mask=mask)
                return out.astype(jnp.float32), cst

            from fastdm_tpu.caching.xcaching import cache_init_state

            try:
                cst = jax.jit(lambda: cache_init_state(
                    cache_cfg, hshape, hshape))()
                o, cst = branch(params, cst, jnp.int32(0))  # compile+warm
                np.asarray(o[..., :1, :1, :1])
                times = []
                for r in range(2):
                    t0 = time.perf_counter()
                    o, cst = branch(params, cst, jnp.int32(1 + r))
                    np.asarray(o[..., :1, :1, :1])
                    times.append(time.perf_counter() - t0)
                print(f"chunk={ct} split={split}: {min(times):.2f} s/branch "
                      f"(reps {[f'{x:.2f}' for x in times]})", flush=True)
                del cst
            except Exception as e:  # noqa: BLE001 - report OOM per variant
                print(f"chunk={ct} split={split}: FAILED {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()
