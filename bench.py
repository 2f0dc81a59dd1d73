#!/usr/bin/env python
"""Headline benchmark: FLUX.1-dev architecture, 1024x2048 t2i, 25 denoise steps.

Matches the reference's headline workload (BASELINE.md: FLUX t2i 1024x2048,
25 steps; H20 FastDM fp8 no-cache = 19.91 s, +cache = 10.02 s). Weights are
random (no checkpoints in this environment) at the exact FLUX-dev architecture
— compute/latency is weight-value-independent. The default metric is
END-TO-END: the full denoise loop PLUS the owned VAE decode, both measured
on-chip (the reference rows are e2e — README_en.md:114-128). Text encoding is
excluded: it runs once on host (always-host text encoders) and costs the
reference ~0.1-0.2 s on its own hardware; BENCH_E2E=0 gives denoise-only.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = H20_fastdm_seconds / our_seconds (speedup over the reference's
own accelerated number on its best hardware; > 1.0 means faster than FastDM).

Env knobs:
  BENCH_MODEL=flux|qwen|sd35|sdxl|wan5b   (default flux = the headline; the
      others reproduce the reference's per-family BASELINE.md rows: qwen
      1024x2048 25-step no-neg vs H20 21.34/13.29 s, sd35 1024x2048 25-step
      CFG vs 10.26/6.03 s, sdxl 1024x2048 25-step CFG vs 6.73 s uncached,
      wan5b 768^2x121f 50-step CFG vs 181/102 s)
  BENCH_CACHE=teacache|dicache|none   (default teacache, mirroring '+cache'
      rows; dicache = the reference's stated flux best practice)
  BENCH_STEPS, BENCH_HEIGHT, BENCH_WIDTH
  BENCH_QUANT=int8|fp8|bf16|int4|int4p   (default int4p: W4A4 + SVDQuant
      low-rank branch with the 0.5 byte/param packed-halves carrier —
      measured 13.07 s vs int4's 13.70 s vs int8's 14.07 s on 2026-08-19
      (halving weight HBM reads beats the concat-unpack cost); accuracy-
      gated by tests/test_int4.py where int4+branch BEATS int8 on the
      outlier-heavy probe, and packed==unpacked carriers are bit-equal)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def _timed_denoise(run, args, latents_shape, latents_dtype, reps):
    """Warmup (compile) + timed reps with fresh donated latents each rep.
    run's first arg after params must be the latents (donated). args is the
    full warmup arg tuple; index 1 is replaced per rep."""
    import numpy as np

    out = run(*args)
    first = out[0] if isinstance(out, tuple) else out
    np.asarray(first)
    skips = None
    if isinstance(out, tuple) and len(out) > 1:
        skips = int(np.asarray(out[1]))
    times = []
    args = list(args)
    for i in range(reps):
        args[1] = jax.random.normal(
            jax.random.key(100 + i), latents_shape, latents_dtype)
        t0 = time.perf_counter()
        out = run(*args)
        np.asarray(out[0] if isinstance(out, tuple) else out)
        times.append(time.perf_counter() - t0)
    return min(times), skips


def _emit(metric, value, baseline, steps, skips=None):
    if skips is not None:
        print(f"cache skipped {skips}/{steps} steps", file=sys.stderr)
    print(json.dumps({
        "metric": metric,
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(baseline / value, 3),
    }))


def _e2e_on() -> bool:
    """BENCH_E2E=1 (default): metrics are END-TO-END — denoise + the owned
    VAE decode measured on-chip in the same process — matching the basis of
    every reference row (ref README_en.md:114-128 times the whole pipeline).
    Text encoding is excluded: it runs once on host (always-host text
    encoders, pipeline/text_encoder.py) and its cost on the reference's own
    hardware is ~0.1-0.2 s. BENCH_E2E=0 restores denoise-only metrics."""
    return os.environ.get("BENCH_E2E", "1") == "1"


def _vae_decode_seconds(family, height, width, frames=1):
    """On-chip decode latency for the family's owned VAE at the bench shape
    (random decoder weights; conv latency is weight-value-independent).
    min over 2 reps after a compile warmup."""
    import numpy as np

    from fastdm_tpu.pipeline.vae import (
        VAEConfig, vae_decode, vae_decoder_random,
    )

    if family in ("flux", "sd35"):
        cfg = VAEConfig(latent_channels=16)
        p = jax.jit(lambda k: vae_decoder_random(k, cfg))(jax.random.key(9))
        dec = jax.jit(lambda z: vae_decode(p, cfg, z))
        shape = (1, 16, height // 8, width // 8)
    elif family == "sdxl":
        cfg = VAEConfig(latent_channels=4, scaling_factor=0.13025,
                        shift_factor=0.0)
        p = jax.jit(lambda k: vae_decoder_random(k, cfg))(jax.random.key(9))
        dec = jax.jit(lambda z: vae_decode(p, cfg, z))
        shape = (1, 4, height // 8, width // 8)
    elif family == "qwen":
        # qwen rides the wan-style 3D VAE with a singleton frame (engine
        # _load_vae_wan_style)
        from fastdm_tpu.pipeline.wan_vae import (
            WanVAEConfig, wan_vae_decode, wan_vae_random,
        )

        cfg = WanVAEConfig()
        p = jax.jit(lambda k: wan_vae_random(k, cfg))(jax.random.key(9))
        dec = jax.jit(
            lambda z: wan_vae_decode(p, cfg, z[:, :, None])[:, 0])
        shape = (1, 16, height // 8, width // 8)
    elif family == "wan5b":
        # Wan2.2-TI2V 48-ch patched VAE (z48, 16x spatial via patch_size=2;
        # channel dims load from the checkpoint config in the engine — the
        # diffusers Wan2.2 VAE uses base_dim 160)
        from fastdm_tpu.pipeline.wan_vae import (
            WanVAEConfig, wan_vae_decode_chunked, wan_vae_random,
        )

        cfg = WanVAEConfig(base_dim=160, z_dim=48, patch_size=2)
        p = jax.jit(lambda k: wan_vae_random(k, cfg))(jax.random.key(9))
        dec = jax.jit(lambda z: wan_vae_decode_chunked(p, cfg, z))
        lf = (frames - 1) // 4 + 1
        shape = (1, 48, lf, height // 16, width // 16)
    elif family == "a14b":
        # Wan2.1 16-ch VAE (the A14B's codec): streaming chunked decode at
        # 720p x 81 frames (full-sequence holds every 8x-scale activation)
        from fastdm_tpu.pipeline.wan_vae import (
            WanVAEConfig, wan_vae_decode_chunked, wan_vae_random,
        )

        cfg = WanVAEConfig()
        p = jax.jit(lambda k: wan_vae_random(k, cfg))(jax.random.key(9))
        dec = jax.jit(lambda z: wan_vae_decode_chunked(p, cfg, z))
        lf = (frames - 1) // 4 + 1
        shape = (1, 16, lf, height // 8, width // 8)
    else:
        raise ValueError(family)

    np.asarray(dec(jax.random.normal(jax.random.key(10), shape, jnp.float32)))
    best = float("inf")
    for i in range(2):
        z = jax.random.normal(jax.random.key(11 + i), shape, jnp.float32)
        t0 = time.perf_counter()
        np.asarray(dec(z))
        best = min(best, time.perf_counter() - t0)
    return best


def main_sd35():
    """BENCH_MODEL=sd35: SD3.5-medium 1024x2048, 25 steps, batched CFG
    (BASELINE.md: H20 10.26 s fastdm / 6.03 s +cache). TeaCache with the
    reference's published sd35 coefficients (threshold 0.15, single batched
    stream — the reference's sd35 config sets negtive_cache=false).
    MEASURED on chip 2026-08-19: 11.045 s at 10/25 skips (vs_baseline
    0.546) — the batched-CFG step is ~736 ms, and the 2B model is
    HBM-bandwidth-bound end to end (0.82 vs H20's 4.0 TB/s); dp=2 over the
    CFG pair is the designed equalizer."""
    from fastdm_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from fastdm_tpu.caching.config import TeaCacheConfig
    from fastdm_tpu.models.sd35 import (
        SD3Config, sd3_cropped_pos_embed, sd3_init_random,
    )
    from fastdm_tpu.pipeline.denoise_more import make_sd3_denoiser
    from fastdm_tpu.pipeline.schedulers import FlowMatchEulerScheduler

    steps = int(os.environ.get("BENCH_STEPS", 25))
    height = int(os.environ.get("BENCH_HEIGHT", 1024))
    width = int(os.environ.get("BENCH_WIDTH", 2048))
    # int8 default: int4p measured within noise of int8 on sd35 (413 vs
    # 419 ms — the 2B model is activation-bound, BENCH_NOTES 2026-08-19)
    quant = os.environ.get("BENCH_QUANT", "int8")
    cache_kind = os.environ.get("BENCH_CACHE", "teacache")

    lh, lw = height // 8, width // 8
    n_layers = int(os.environ.get("BENCH_LAYERS", 24))
    cfg = SD3Config(quant=quant if quant != "bf16" else None,
                    num_layers=n_layers,
                    num_dual_layers=13 if n_layers >= 13 else n_layers // 2)
    params = jax.jit(lambda k: sd3_init_random(k, cfg))(jax.random.key(0))

    cache_cfg = None
    if cache_kind == "teacache":
        # the reference's published sd35 coefficients
        # (examples/xcaching/configs/teacache_sd35.json)
        cache_cfg = TeaCacheConfig(
            cache_algorithm="teacache", enable_caching=True,
            threshold=float(os.environ.get("BENCH_CACHE_THRESHOLD", 0.15)),
            coefficients=(5.02516305e04, -1.71350998e04, 1.81247682e03,
                          -6.99267532e01, 9.39706146e-01),
        )
    sched = FlowMatchEulerScheduler.create(steps, shift=3.0)
    run = make_sd3_denoiser(cfg, sched, steps, guidance_scale=7.0,
                            cache_cfg=cache_cfg)

    kl, ke, kp = jax.random.split(jax.random.key(1), 3)
    latents = jax.random.normal(kl, (1, cfg.in_channels, lh, lw), jnp.float32)
    embeds = jax.random.normal(ke, (2, 333, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(kp, (2, cfg.pooled_projection_dim), jnp.bfloat16)
    pos = sd3_cropped_pos_embed(cfg, None, lh, lw)

    value, skips = _timed_denoise(
        run, (params, latents, embeds, pooled, pos), latents.shape,
        jnp.float32, int(os.environ.get("BENCH_REPS", 2)))
    baseline = 6.03 if cache_cfg is not None else 10.26
    metric = f"sd35_t2i_{height}x{width}_{steps}step_denoise_latency"
    if _e2e_on():
        dec = _vae_decode_seconds("sd35", height, width)
        print(f"denoise {value:.3f} s + vae decode {dec:.3f} s",
              file=sys.stderr)
        metric, value = f"sd35_t2i_{height}x{width}_{steps}step_e2e_latency", \
            value + dec
    _emit(metric, value, baseline, steps, skips)


def main_sdxl():
    """BENCH_MODEL=sdxl: SDXL-base 1024x2048, 25 steps, batched CFG
    (BASELINE.md: H20 6.73 s fastdm; the reference publishes no cached SDXL
    row, so this mode is uncached). MEASURED on chip 2026-08-19: 7.934 s
    (vs_baseline 0.848) — int8 weights + fused epilogues keep the UNet on
    the MXU, so the gap is well under the raw bandwidth ratio."""
    from fastdm_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from fastdm_tpu.models.sdxl import SDXLConfig, sdxl_init_random
    from fastdm_tpu.pipeline.denoise_more import make_sdxl_denoiser
    from fastdm_tpu.pipeline.schedulers import EulerDiscreteScheduler

    steps = int(os.environ.get("BENCH_STEPS", 25))
    height = int(os.environ.get("BENCH_HEIGHT", 1024))
    width = int(os.environ.get("BENCH_WIDTH", 2048))
    quant = os.environ.get("BENCH_QUANT", "int8")

    lh, lw = height // 8, width // 8
    cfg = SDXLConfig(quant=quant if quant != "bf16" else None)
    params = jax.jit(lambda k: sdxl_init_random(k, cfg))(jax.random.key(0))

    sched = EulerDiscreteScheduler.create(steps)
    run = make_sdxl_denoiser(cfg, sched, steps, guidance_scale=5.0)

    kl, ke, kp = jax.random.split(jax.random.key(1), 3)
    latents = jax.random.normal(kl, (1, 4, lh, lw), jnp.float32)
    embeds = jax.random.normal(ke, (2, 77, cfg.cross_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(kp, (2, 1280), jnp.bfloat16)
    time_ids = jnp.asarray(
        [[height, width, 0, 0, height, width]] * 2, jnp.float32)

    value, skips = _timed_denoise(
        run, (params, latents, embeds, pooled, time_ids), latents.shape,
        jnp.float32, int(os.environ.get("BENCH_REPS", 2)))
    metric = f"sdxl_t2i_{height}x{width}_{steps}step_denoise_latency"
    if _e2e_on():
        dec = _vae_decode_seconds("sdxl", height, width)
        print(f"denoise {value:.3f} s + vae decode {dec:.3f} s",
              file=sys.stderr)
        metric, value = f"sdxl_t2i_{height}x{width}_{steps}step_e2e_latency", \
            value + dec
    _emit(metric, value, 6.73, steps)


def main_wan5b():
    """BENCH_MODEL=wan5b: Wan2.2-TI2V-5B t2v 768x768x121f, 50 steps, CFG
    (BASELINE.md: H20 181 s fastdm / 102 s +cache). FBCache with the
    reference's wan config (threshold 0.15, warmup 8, dual pos/neg states);
    UniPC scheduler (the engine's wan default). Dense attention — radial
    sparse measured NEGATIVE at this 576-tokens/frame shape through coarse
    AND fine gather kernels (BENCH_NOTES 2026-08-17/19). Timestep is kept in
    compact (B,) form: diffusers expands the 5B's timestep per-token, but in
    t2v every token gets the SAME value, so the compact broadcast is
    numerically identical and skips a (B,S,6,D) f32 materialization; the
    per-token path is exercised by the ti2v tests. BENCH_REPS defaults to 2
    (same min-of-reps standard as every other mode; a cached rep is ~2 min
    on one v5e)."""
    from fastdm_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from fastdm_tpu.caching.config import FBCacheConfig
    from fastdm_tpu.models.wan import WanConfig, wan_init_random, wan_rope_cos_sin
    from fastdm_tpu.pipeline.denoise_more import make_wan_cached_denoiser
    from fastdm_tpu.pipeline.schedulers import UniPCMultistepScheduler

    steps = int(os.environ.get("BENCH_STEPS", 50))
    height = int(os.environ.get("BENCH_HEIGHT", 768))
    width = int(os.environ.get("BENCH_WIDTH", 768))
    frames = int(os.environ.get("BENCH_FRAMES", 121))
    quant = os.environ.get("BENCH_QUANT", "int8")

    # Wan2.2-TI2V-5B hyperparameters (diffusers WanTransformer3DModel config:
    # 30 layers, 24 heads x 128, ffn 14336, 48 latent channels, 16x VAE)
    cfg = WanConfig(
        num_layers=int(os.environ.get("BENCH_LAYERS", 30)),
        num_attention_heads=24, attention_head_dim=128,
        ffn_dim=14336, in_channels=48, out_channels=48,
        quant=quant if quant != "bf16" else None)
    lf, lh, lw = (frames - 1) // 4 + 1, height // 16, width // 16
    params = jax.jit(lambda k: wan_init_random(k, cfg))(jax.random.key(0))

    cache_cfg = None
    if os.environ.get("BENCH_CACHE", "fbcache") == "fbcache":
        # the reference's published wan config
        # (examples/xcaching/configs/fbcache_wan.json)
        cache_cfg = FBCacheConfig(
            cache_algorithm="fbcache", enable_caching=True,
            threshold=float(os.environ.get("BENCH_CACHE_THRESHOLD", 0.15)),
            warmup_steps=8, negtive_cache=True)

    sched = UniPCMultistepScheduler.create(steps, shift=5.0)
    # BENCH_SEGMENT: steps per jitted program (host-threaded state between
    # programs; numerically identical — test_denoise.py). The axon tunnel
    # kills any single execution at ~60 s (measured 2026-08-20: 61 s OK,
    # 62 s+ kills the worker), and 50 steps at ~3.9 s/step is one ~195 s
    # program — segment at 10 steps (~39 s/program) by default.
    segment = int(os.environ.get("BENCH_SEGMENT", 10)) or None
    if cache_cfg is not None:
        run = make_wan_cached_denoiser(cfg, sched, steps, cache_cfg,
                                       guidance_scale=5.0,
                                       segment_steps=segment)
    else:
        from fastdm_tpu.pipeline.denoise_more import make_wan_denoiser
        _run = make_wan_denoiser(cfg, sched, steps, guidance_scale=5.0)
        run = lambda p, lat, pt, nt, c, s, m: _run(p, None, lat, pt, nt, c, s, m)

    kl, kp, kn = jax.random.split(jax.random.key(1), 3)
    latents = jax.random.normal(
        kl, (1, cfg.in_channels, lf, lh, lw), jnp.float32)
    pos_text = jax.random.normal(kp, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    neg_text = jax.random.normal(kn, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(cfg, lf, lh, lw)

    value, skips = _timed_denoise(
        run, (params, latents, pos_text, neg_text, cos, sin, None),
        latents.shape, jnp.float32, int(os.environ.get("BENCH_REPS", 2)))
    baseline = 102.0 if cache_cfg is not None else 181.0
    # skips counts BRANCH skips across the dual pos/neg cache streams, so
    # the denominator is 2x steps. MEASURED on chip 2026-08-20: 104.77 s at
    # 46/100 branch skips (the H20 181->102 s row implies ~44% — rate
    # comparable without threshold tuning) -> vs_baseline 0.974.
    metric = f"wan5b_t2v_{height}x{width}x{frames}f_{steps}step_denoise_latency"
    if _e2e_on():
        dec = _vae_decode_seconds("wan5b", height, width, frames)
        print(f"denoise {value:.3f} s + vae decode {dec:.3f} s",
              file=sys.stderr)
        metric = f"wan5b_t2v_{height}x{width}x{frames}f_{steps}step_e2e_latency"
        value += dec
    _emit(metric, value, baseline, 2 * steps, skips)


def main_a14b():
    """BENCH_MODEL=a14b: Wan2.2-T2V-A14B 720x1280x81f, 40 steps, CFG, dual
    14B experts (BASELINE.md: H20 1056 s +cache / 811 s +cache+radial-sparse
    — the marquee reference rows). int4p experts, both HOST-resident with
    per-phase placement (offload_inactive_expert residency), FBCache
    (reference wan config), radial super-gather sparse attention, UniPC.
    Host-stepped per-CFG-branch programs (the axon tunnel kills any single
    execution at ~60 s; one A14B branch forward is ~12-25 s). Experts load
    from the disk snapshot when present (A14B_SNAPSHOT, ~40 min random-init
    otherwise on this 1-core host). BENCH_REPS defaults to 1 — one rep is a
    full ~10-15 min generation."""
    from fastdm_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses as _dc

    from fastdm_tpu.caching.config import FBCacheConfig
    from fastdm_tpu.kernels import contracts
    from fastdm_tpu.models import snapshot as snap
    from fastdm_tpu.models.wan import (
        WanConfig, wan_init_random, wan_rope_cos_sin,
    )
    from fastdm_tpu.pipeline.denoise_more import make_wan_dual_host_denoiser
    from fastdm_tpu.pipeline.schedulers import UniPCMultistepScheduler
    from fastdm_tpu.sparse.config import RadialAttnConfig
    from fastdm_tpu.sparse.xsparse import RadialAttn

    steps = int(os.environ.get("BENCH_STEPS", 40))
    height = int(os.environ.get("BENCH_HEIGHT", 720))
    width = int(os.environ.get("BENCH_WIDTH", 1280))
    frames = int(os.environ.get("BENCH_FRAMES", 81))
    quant = os.environ.get("BENCH_QUANT", "int4p")
    decay = float(os.environ.get("BENCH_SPARSE_DECAY", 0.2))

    cfg = WanConfig(num_layers=int(os.environ.get("BENCH_LAYERS", 40)),
                    quant=quant, ffn_chunk_tokens=5400, split_qkv_proj=True)
    lf, lh, lw = (frames - 1) // 4 + 1, height // 8, width // 8
    pt, ph, pw = cfg.patch_size
    tokens = (lf // pt) * (lh // ph) * (lw // pw)

    cpu = jax.devices("cpu")[0]
    cache_dir = os.environ.get("A14B_SNAPSHOT", "/root/a14b_experts_snapshot")
    with jax.default_device(cpu):
        if cache_dir and snap.is_snapshot(cache_dir):
            m = snap.load_manifest(cache_dir)
            snap.check_compatible(m, architecture="wan-a14b-bench",
                                  quant=quant, cfg=cfg)
            params = snap.load_tree(cache_dir, "expert_1", m)
            params_2 = snap.load_tree(cache_dir, "expert_2", m)
        else:
            params = jax.jit(lambda k: wan_init_random(k, cfg))(
                jax.random.key(0))
            params_2 = jax.jit(lambda k: wan_init_random(k, cfg))(
                jax.random.key(1))
            jax.block_until_ready((params, params_2))

    bq, grp, sb = 256, 32, 4
    cfg = _dc.replace(cfg, sparse_gather_fine_blocks=(bq, grp, 64),
                      sparse_gather_superblock=sb)
    sp = RadialAttn(RadialAttnConfig(block_size=64, decay_factor=decay,
                                     model_type="wan"))
    sp.post_init(video_token_num=tokens, num_frame=lf // pt)
    tab = f"/tmp/a14b_tables/d{decay}_t{tokens}_f{lf // pt}_{bq}_{grp}_{sb}.npz"
    if os.path.exists(tab):
        import numpy as _np
        z = _np.load(tab)
        idx, val, rows = z["idx"], z["val"], z["rows"]
    else:
        idx, val, rows = sp.block_lists_super(bq, grp // sb, sb)
        os.makedirs(os.path.dirname(tab), exist_ok=True)
        __import__("numpy").savez(tab, idx=idx, val=val, rows=rows)
    mask = (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))
    contracts.check_gather_super("bench a14b tables", *mask, tokens, tokens,
                                 bq, grp // sb, 64, sb)

    # threshold 0.07 = the RATE-MATCHED calibration on synthetic weights
    # (48/80 branch skips ~= the reference's implied ~44/80 from its
    # 2348 -> 1056 s +cache delta); the published wan config's 0.15
    # over-skips to 56/80 here (BENCH_NOTES 2026-08-21). Real-weight runs
    # use the published 0.15.
    cache_cfg = FBCacheConfig(
        cache_algorithm="fbcache", enable_caching=True,
        threshold=float(os.environ.get("BENCH_CACHE_THRESHOLD", 0.07)),
        warmup_steps=8, negtive_cache=True)
    sched = UniPCMultistepScheduler.create(steps, shift=5.0)
    run = make_wan_dual_host_denoiser(
        cfg, sched, steps, cache_cfg, 5.0, None, 0.875,
        dense_warmup_steps=0,
        place_params=lambda p: jax.device_put(p, jax.devices()[0]))

    kp, kn = jax.random.split(jax.random.key(7))
    pos_text = jax.random.normal(kp, (1, cfg.text_len, cfg.text_dim),
                                 jnp.bfloat16)
    neg_text = jax.random.normal(kn, (1, cfg.text_len, cfg.text_dim),
                                 jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(cfg, lf, lh, lw)

    import numpy as np

    best, skips = float("inf"), 0
    reps = int(os.environ.get("BENCH_REPS", 1))
    for rep in range(reps + 1):  # rep 0 = compile+transfer warmup, untimed
        lat = jax.random.normal(jax.random.key(100 + rep),
                                (1, cfg.in_channels, lf, lh, lw), jnp.float32)
        t0 = time.perf_counter()
        out, sk = run(params, params_2, lat, pos_text, neg_text, cos, sin,
                      mask)
        np.asarray(out[..., :1, :1, :1])
        dt = time.perf_counter() - t0
        print(f"a14b rep {rep}: {dt:.1f} s, {int(np.asarray(sk))} branch "
              f"skips", file=sys.stderr)
        if rep > 0 or reps == 0:
            best, skips = min(best, dt), int(np.asarray(sk))
    value = best
    baseline = 811.0
    metric = f"wan_a14b_t2v_{height}x{width}x{frames}f_{steps}step_denoise_latency"
    if _e2e_on():
        dec = _vae_decode_seconds("a14b", height, width, frames)
        print(f"denoise {value:.3f} s + vae decode {dec:.3f} s",
              file=sys.stderr)
        metric = f"wan_a14b_t2v_{height}x{width}x{frames}f_{steps}step_e2e_latency"
        value += dec
    _emit(metric, value, baseline, 2 * steps, skips)


def main_qwen():
    """BENCH_MODEL=qwen: Qwen-Image 1024x2048, 25 steps, no negative stream
    (the reference's own Qwen workload — BASELINE.md 'no neg' row: H20
    21.34 s fastdm / 13.29 s +cache). Full 60-layer model; int4p is what
    makes it fit one 16 GB chip at all (int8 carrier = 13.6 GB weights +
    activations OOMs — BENCH_NOTES 2026-08-19)."""
    from fastdm_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from fastdm_tpu.caching.config import TeaCacheConfig
    from fastdm_tpu.models.qwenimage import (
        QwenImageConfig, qwen_init_random, qwen_rope_cos_sin,
    )
    from fastdm_tpu.pipeline.denoise_more import make_qwen_denoiser
    from fastdm_tpu.pipeline.schedulers import (
        FlowMatchEulerScheduler, flow_match_shift_mu,
    )

    steps = int(os.environ.get("BENCH_STEPS", 25))
    height = int(os.environ.get("BENCH_HEIGHT", 1024))
    width = int(os.environ.get("BENCH_WIDTH", 2048))
    quant = os.environ.get("BENCH_QUANT", "int4p")
    cache_kind = os.environ.get("BENCH_CACHE", "teacache")

    ht, wt = height // 16, width // 16
    seq, txt_len = ht * wt, 512
    # quant_mods: the 60 blocks' modulation projections are ~6.8 GB at bf16
    # — quantizing them is what fits the full model (the reference quantizes
    # qwen mods too: fastdm/model/qwenimage.py:166-167)
    cfg = QwenImageConfig(
        quant=quant if quant != "bf16" else None,
        quant_mods=quant != "bf16",
        num_layers=int(os.environ.get("BENCH_LAYERS", 60)))
    params = jax.jit(lambda k: qwen_init_random(k, cfg))(jax.random.key(0))

    cache_cfg = None
    if cache_kind == "teacache":
        # the reference's published qwen coefficients
        # (examples/xcaching/configs/teacache_qwenimage.json). Threshold
        # choice, MEASURED (2026-08-19): the published 0.2 over-skips on
        # random-weight trajectories (16/25 steps -> 9.49 s; 0.4 -> 20/25 ->
        # 5.34 s), while the reference's own H20 row implies ~38% skip
        # (21.34 -> 13.29 s ~= 9.4/25). 0.1 reproduces that effective rate
        # exactly (9/25 -> 16.80 s) — the comparability criterion, same as
        # the flux threshold note below; real-weight runs use the published
        # 0.2.
        cache_cfg = TeaCacheConfig(
            cache_algorithm="teacache", enable_caching=True,
            threshold=float(os.environ.get("BENCH_CACHE_THRESHOLD", 0.1)),
            coefficients=(20.04634615, 3.13881129, -11.25528647,
                          4.70808005, -0.15457715),
        )
    mu = flow_match_shift_mu(seq)
    sched = FlowMatchEulerScheduler.create(steps, use_dynamic_shifting=True, mu=mu)
    run = make_qwen_denoiser(cfg, sched, steps, true_cfg_scale=1.0,
                             cache_cfg=cache_cfg)

    kl, ke = jax.random.split(jax.random.key(1))
    latents = jax.random.normal(kl, (1, seq, cfg.in_channels), jnp.float32)
    embeds = jax.random.normal(ke, (1, txt_len, cfg.joint_attention_dim),
                               jnp.bfloat16)
    cos, sin = qwen_rope_cos_sin(cfg, 1, ht, wt, txt_len)

    out, skips = run(params, latents, embeds, embeds, cos, sin)
    np.asarray(out)
    if cache_cfg is not None:
        print(f"cache skipped {int(np.asarray(skips))}/{steps} steps",
              file=sys.stderr)
    times = []
    for i in range(int(os.environ.get("BENCH_REPS", 2))):
        lat = jax.random.normal(jax.random.key(2 + i), latents.shape, jnp.float32)
        t0 = time.perf_counter()
        out, _ = run(params, lat, embeds, embeds, cos, sin)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    value = min(times)
    baseline = 13.29 if cache_cfg is not None else 21.34
    metric = f"qwen_t2i_{height}x{width}_{steps}step_denoise_latency"
    if _e2e_on():
        dec = _vae_decode_seconds("qwen", height, width)
        print(f"denoise {value:.3f} s + vae decode {dec:.3f} s",
              file=sys.stderr)
        metric = f"qwen_t2i_{height}x{width}_{steps}step_e2e_latency"
        value += dec
    print(json.dumps({
        "metric": metric,
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(baseline / value, 3),
    }))


def main():
    model = os.environ.get("BENCH_MODEL", "flux")
    if model != "flux":
        return {"qwen": main_qwen, "sd35": main_sd35, "sdxl": main_sdxl,
                "wan5b": main_wan5b, "a14b": main_a14b}[model]()
    from fastdm_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    from fastdm_tpu.caching.config import TeaCacheConfig
    from fastdm_tpu.models.flux import FluxConfig, flux_init_random, flux_rope_cache
    from fastdm_tpu.pipeline.denoise import make_flux_denoiser
    from fastdm_tpu.pipeline.schedulers import (
        FlowMatchEulerScheduler,
        flow_match_shift_mu,
    )

    steps = int(os.environ.get("BENCH_STEPS", 25))
    height = int(os.environ.get("BENCH_HEIGHT", 1024))
    width = int(os.environ.get("BENCH_WIDTH", 2048))
    quant = os.environ.get("BENCH_QUANT", "int4p")
    cache_kind = os.environ.get("BENCH_CACHE", "teacache")

    ht, wt = height // 16, width // 16  # packed latent tokens
    txt_len = 512
    seq = ht * wt

    # quant_mods: quantize AdaLN projections too — required to fit FLUX-dev
    # (12B params) in a 16GB v5e; ref precedent qwenimage.py:166-167
    cfg = FluxConfig(quant=quant if quant != "bf16" else None,
                     quant_mods=quant != "bf16",
                     # CPU smoke runs can shrink the stack; TPU uses the real 19/38
                     num_layers=int(os.environ.get("BENCH_LAYERS", 19)),
                     num_single_layers=int(os.environ.get("BENCH_SINGLE_LAYERS", 38)))
    # jitted init: XLA manages init temporaries in one program (eager init
    # leaves transients the lazy-committing TPU allocator never reclaims)
    params = jax.jit(lambda k: flux_init_random(k, cfg))(jax.random.key(0))

    cache_cfg = None
    if cache_kind == "teacache":
        # Threshold choice, MEASURED (2026-08-19): the reference's published
        # flux config uses 0.2 (examples/xcaching/configs/teacache_flux.json),
        # but with random weights the TeaCache signal is distribution-shifted
        # — 0.2 here skips only 9/25 steps (16.87 s) while the reference's own
        # H20 row implies ~50% skip (19.91 -> 10.02 s). 0.25 reproduces the
        # reference's EFFECTIVE skip rate (12/25), which is the comparability
        # criterion that matters for a latency bench; real-weight runs should
        # use the published 0.2.
        cache_cfg = TeaCacheConfig(
            cache_algorithm="teacache",
            enable_caching=True,
            threshold=0.25,
            coefficients=(4.98651651e02, -2.83781631e02, 5.58554382e01,
                          -3.82021401e00, 2.64230861e-01),
        )
    elif cache_kind == "dicache":
        # the reference's stated flux BEST PRACTICE (doc/introduction.md
        # "flux: recommend Dicache"; config examples/xcaching/configs/
        # dicache_flux.json: threshold 0.2, probe depth 1, ret_ratio 0.2)
        from fastdm_tpu.caching.config import DiCacheConfig

        cache_cfg = DiCacheConfig(
            cache_algorithm="dicache",
            enable_caching=True,
            threshold=0.2,
            probe_depth=1,
            ret_ratio=0.2,
        )

    mu = flow_match_shift_mu(seq)
    sched = FlowMatchEulerScheduler.create(steps, use_dynamic_shifting=True, mu=mu)
    run = make_flux_denoiser(cfg, sched, steps, cache_cfg, guidance_scale=3.5)

    kl, ke, kp = jax.random.split(jax.random.key(1), 3)
    latents = jax.random.normal(kl, (1, seq, cfg.in_channels), jnp.float32)
    encoder = jax.random.normal(ke, (1, txt_len, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(kp, (1, cfg.pooled_projection_dim), jnp.bfloat16)
    cos, sin = flux_rope_cache(cfg, txt_len, ht, wt)

    import numpy as np

    # warmup / compile (np.asarray forces a real device sync over the tunnel)
    out, skips = run(params, latents, encoder, pooled, cos, sin)
    np.asarray(out)
    if cache_cfg is not None:
        # skip-rate observability (stderr keeps the stdout JSON contract):
        # the reference's H20 19.91 -> 10.02 s implies ~half the steps replay
        print(f"cache skipped {int(np.asarray(skips))}/{steps} steps",
              file=sys.stderr)

    # timed runs (fresh latents each time; donated arg)
    times = []
    for i in range(int(os.environ.get("BENCH_REPS", 2))):
        lat = jax.random.normal(jax.random.key(2 + i), latents.shape, jnp.float32)
        t0 = time.perf_counter()
        out, _ = run(params, lat, encoder, pooled, cos, sin)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    value = min(times)

    # H20 fp8 rows (BASELINE.md): any cached config compares to the '+cache'
    # number, uncached to the plain FastDM number
    baseline = 10.02 if cache_cfg is not None else 19.91
    metric = f"flux_t2i_{height}x{width}_{steps}step_denoise_latency"
    if _e2e_on():
        dec = _vae_decode_seconds("flux", height, width)
        print(f"denoise {value:.3f} s + vae decode {dec:.3f} s",
              file=sys.stderr)
        metric = f"flux_t2i_{height}x{width}_{steps}step_e2e_latency"
        value += dec
    print(json.dumps({
        "metric": metric,
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(baseline / value, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
