"""Memory probe: full-size int8 FLUX on one chip — where does HBM go?

Stages: init params -> report -> jit ONE forward at the bench shape -> report.
(ref role: gen.py peak-memory print, examples/demo/gen.py:114-115)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp


def mem(tag):
    try:
        stats = jax.local_devices()[0].memory_stats()
        used = stats.get("bytes_in_use", 0) / 2**30
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        limit = stats.get("bytes_limit", 0) / 2**30
        print(f"[{tag}] in_use={used:.2f}GiB peak={peak:.2f}GiB limit={limit:.2f}GiB", flush=True)
    except Exception as e:
        print(f"[{tag}] memory_stats unavailable: {e}", flush=True)


def main():
    from fastdm_tpu.models.flux import FluxConfig, flux_forward, flux_init_random, flux_rope_cache

    steps_h = int(os.environ.get("PROBE_HEIGHT", 1024))
    steps_w = int(os.environ.get("PROBE_WIDTH", 2048))
    layers = int(os.environ.get("PROBE_LAYERS", 19))
    slayers = int(os.environ.get("PROBE_SINGLE_LAYERS", 38))

    print("devices:", jax.devices(), flush=True)
    mem("start")
    cfg = FluxConfig(quant="int8", quant_mods=True, num_layers=layers,
                     num_single_layers=slayers)
    t0 = time.time()
    params = flux_init_random(jax.random.key(0), cfg)
    jax.block_until_ready(params)
    print(f"init took {time.time()-t0:.0f}s", flush=True)
    n_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    print(f"param bytes: {n_bytes/2**30:.2f} GiB", flush=True)
    mem("params")

    ht, wt, txt = steps_h // 16, steps_w // 16, 512
    k = jax.random.key(1)
    hidden = jax.random.normal(k, (1, ht * wt, cfg.in_channels), jnp.bfloat16)
    encoder = jax.random.normal(k, (1, txt, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(k, (1, cfg.pooled_projection_dim), jnp.bfloat16)
    t = jnp.full((1,), 0.5, jnp.float32)
    g = jnp.full((1,), 3.5, jnp.float32)
    cos, sin = flux_rope_cache(cfg, txt, ht, wt)

    fwd = jax.jit(flux_forward, static_argnames="cfg")
    t0 = time.time()
    out = fwd(params, cfg, hidden, encoder, pooled, t, cos, sin, guidance=g)
    out.block_until_ready()
    print(f"first forward (compile+run) {time.time()-t0:.1f}s", flush=True)
    mem("after forward")
    t0 = time.time()
    for _ in range(3):
        out = fwd(params, cfg, hidden, encoder, pooled, t, cos, sin, guidance=g)
    out.block_until_ready()
    dt = (time.time() - t0) / 3
    print(f"steady-state forward: {dt*1e3:.0f} ms -> {dt*25:.1f}s per 25 steps", flush=True)
    mem("end")


if __name__ == "__main__":
    main()
