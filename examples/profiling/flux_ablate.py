"""FLUX forward budget by ABLATION (VERDICT r4 #2): each bucket is the
delta between two FULL jitted forwards (one Execute each — immune to the
~23 ms/Execute tunnel floor that poisons single-op microbenchmarks,
BENCH_NOTES 2026-08-21):

  attention bucket = full - (attention patched to identity)
  quant bucket     = full(int4p) - full(bf16 weights)
  lora bucket      = full(int4p) - full(int4p, lora zeroed-out rank)

Run (TPU): python examples/profiling/flux_ablate.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache


def timed(fn, *args, reps=4):
    def sync(o):
        np.asarray(o[..., :1, :1])

    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    enable_compilation_cache()
    from fastdm_tpu.kernels import registry as reg
    from fastdm_tpu.models.flux import (
        FluxConfig, flux_forward, flux_init_random, flux_rope_cache,
    )

    ht, wt, txt = 64, 128, 512
    key = jax.random.key(0)
    results = {}
    # full-depth bf16 (23.8 GiB) cannot fit one v5e — quant deltas use int8
    params = None
    for name, quant in (("int4p", "int4p"), ("int8", "int8")):
        cfg = FluxConfig(quant=quant)
        del params  # free the previous tree BEFORE the next init (int8 is
        # 13.1 GiB; together with the int4p leftovers it exceeds HBM)
        params = jax.jit(lambda k, c=cfg: flux_init_random(k, c))(key)
        cos, sin = flux_rope_cache(cfg, txt, ht, wt)
        hidden = jax.random.normal(key, (1, ht * wt, cfg.in_channels),
                                   jnp.bfloat16)
        enc = jax.random.normal(key, (1, txt, cfg.joint_attention_dim),
                                jnp.bfloat16)
        pooled = jax.random.normal(key, (1, cfg.pooled_projection_dim),
                                   jnp.bfloat16)
        t = jnp.full((1,), 0.5, jnp.float32)
        g = jnp.full((1,), 3.5, jnp.float32)
        fwd = jax.jit(lambda p, h, c=cfg: flux_forward(
            p, c, h, enc, pooled, t, cos, sin, guidance=g))
        tt = timed(fwd, params, hidden)
        results[name] = tt
        print(f"forward {name:6s}: {tt*1e3:7.1f} ms", flush=True)
        if name == "int4p":
            # attention -> identity (value stream passthrough keeps shapes)
            orig = reg.kernel_registry._ops["sdpa"].copy()

            def ident(q, k, v, *a, **kw):
                return v

            for b in list(reg.kernel_registry._ops["sdpa"]):
                reg.kernel_registry._ops["sdpa"][b] = ident
            try:
                fwd2 = jax.jit(lambda p, h, c=cfg: flux_forward(
                    p, c, h, enc, pooled, t, cos, sin, guidance=g))
                tna = timed(fwd2, params, hidden)
                print(f"forward int4p, attention=identity: {tna*1e3:7.1f} ms "
                      f"-> attention bucket {1e3*(tt-tna):7.1f} ms",
                      flush=True)
            finally:
                reg.kernel_registry._ops["sdpa"] = orig
    print(f"int8 - int4p: {1e3*(results['int8']-results['int4p']):7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
