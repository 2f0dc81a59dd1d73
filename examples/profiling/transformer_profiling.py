"""Isolated denoiser-forward latency profiling with random inputs
(ref: examples/profiling/*_profiling.py — one script, --architecture switch).

Usage: python transformer_profiling.py --architecture flux --height 1024 \
           --width 2048 [--quant int8] [--layers N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def profile(fn, args, reps=5):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # force full sync through the tunnel
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return compile_s, min(times)


def main():
    p = argparse.ArgumentParser("transformer profiling")
    p.add_argument("--architecture", default="flux",
                   choices=["flux", "sd35", "sdxl", "qwen", "wan"])
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--num-frames", type=int, default=16)
    p.add_argument("--quant", default="int8",
                   choices=["int8", "fp8", "bf16", "int4", "int4p"])
    p.add_argument("--layers", type=int, default=None, help="override layer count")
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()
    quant = None if args.quant == "bf16" else args.quant
    key = jax.random.key(0)
    arch = args.architecture

    if arch == "flux":
        from fastdm_tpu.models.flux import FluxConfig, flux_forward, flux_init_random, flux_rope_cache

        kw = dict(quant=quant, quant_mods=quant is not None)
        if args.layers:
            kw.update(num_layers=args.layers, num_single_layers=2 * args.layers)
        cfg = FluxConfig(**kw)
        params = jax.jit(lambda k: flux_init_random(k, cfg))(key)
        ht, wt, txt = args.height // 16, args.width // 16, 512
        cos, sin = flux_rope_cache(cfg, txt, ht, wt)
        inputs = (
            params, cfg,
            jax.random.normal(key, (1, ht * wt, cfg.in_channels), jnp.bfloat16),
            jax.random.normal(key, (1, txt, cfg.joint_attention_dim), jnp.bfloat16),
            jax.random.normal(key, (1, cfg.pooled_projection_dim), jnp.bfloat16),
            jnp.full((1,), 0.5), cos, sin,
        )
        fn = jax.jit(
            lambda *a: flux_forward(*a, guidance=jnp.full((1,), 3.5)),
            static_argnums=(1,),
        )
        tokens = ht * wt + txt
    elif arch == "sd35":
        from fastdm_tpu.models.sd35 import SD3Config, sd3_cropped_pos_embed, sd3_forward, sd3_init_random

        kw = dict(quant=quant)
        if args.layers:
            kw.update(num_layers=args.layers, num_dual_layers=args.layers // 2)
        cfg = SD3Config(**kw)
        params = jax.jit(lambda k: sd3_init_random(k, cfg))(key)
        lh, lw = args.height // 8, args.width // 8
        pos = sd3_cropped_pos_embed(cfg, None, lh, lw)
        inputs = (
            params, cfg,
            jax.random.normal(key, (1, cfg.in_channels, lh, lw), jnp.bfloat16),
            jax.random.normal(key, (1, 333, cfg.joint_attention_dim), jnp.bfloat16),
            jax.random.normal(key, (1, cfg.pooled_projection_dim), jnp.bfloat16),
            jnp.full((1,), 500.0), pos,
        )
        fn = jax.jit(sd3_forward, static_argnums=(1,))
        tokens = (lh // 2) * (lw // 2) + 333
    elif arch == "sdxl":
        from fastdm_tpu.models.sdxl import SDXLConfig, sdxl_forward, sdxl_init_random

        cfg = SDXLConfig(quant=quant)
        params = jax.jit(lambda k: sdxl_init_random(k, cfg))(key)
        lh, lw = args.height // 8, args.width // 8
        inputs = (
            params, cfg,
            jax.random.normal(key, (1, 4, lh, lw), jnp.bfloat16),
            jnp.full((1,), 500.0),
            jax.random.normal(key, (1, 77, cfg.cross_attention_dim), jnp.bfloat16),
            jax.random.normal(key, (1, 1280), jnp.bfloat16),
            jnp.asarray([[args.height, args.width, 0, 0, args.height, args.width]], jnp.float32),
        )
        fn = jax.jit(sdxl_forward, static_argnums=(1,))
        tokens = (lh // 4) * (lw // 4)
    elif arch == "qwen":
        from fastdm_tpu.models.qwenimage import QwenImageConfig, qwen_forward, qwen_init_random, qwen_rope_cos_sin

        kw = dict(quant=quant, quant_mods=quant is not None)
        if args.layers:
            kw.update(num_layers=args.layers)
        cfg = QwenImageConfig(**kw)
        params = jax.jit(lambda k: qwen_init_random(k, cfg))(key)
        ht, wt, txt = args.height // 16, args.width // 16, 300
        cos, sin = qwen_rope_cos_sin(cfg, 1, ht, wt, txt)
        inputs = (
            params, cfg,
            jax.random.normal(key, (1, ht * wt, cfg.in_channels), jnp.bfloat16),
            jax.random.normal(key, (1, txt, cfg.joint_attention_dim), jnp.bfloat16),
            jnp.full((1,), 0.5), cos, sin,
        )
        fn = jax.jit(qwen_forward, static_argnums=(1,))
        tokens = ht * wt + txt
    else:  # wan
        from fastdm_tpu.models.wan import WanConfig, wan_forward, wan_init_random, wan_rope_cos_sin

        kw = dict(quant=quant)
        if args.layers:
            kw.update(num_layers=args.layers)
        cfg = WanConfig(**kw)
        params = jax.jit(lambda k: wan_init_random(k, cfg))(key)
        lf, lh, lw = args.num_frames, args.height // 8, args.width // 8
        cos, sin = wan_rope_cos_sin(cfg, lf, lh, lw)
        inputs = (
            params, cfg,
            jax.random.normal(key, (1, cfg.in_channels, lf, lh, lw), jnp.bfloat16),
            jnp.full((1,), 500.0),
            jax.random.normal(key, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16),
            None, cos, sin,
        )
        fn = jax.jit(wan_forward, static_argnums=(1,))
        tokens = (lf // cfg.patch_size[0]) * (lh // 2) * (lw // 2)

    compile_s, best = profile(fn, inputs, args.reps)
    print(f"{arch} quant={args.quant} tokens={tokens}: "
          f"compile {compile_s:.1f}s, forward {best*1e3:.1f} ms "
          f"({best*25:.2f}s / 25 steps)")


if __name__ == "__main__":
    main()
