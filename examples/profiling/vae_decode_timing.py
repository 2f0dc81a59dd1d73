"""VAE decode ON-CHIP timing (VERDICT r3 missing #2): every reference
baseline row is END-TO-END (ref README_en.md:114-128) while bench.py times
the denoise loop only, asserting decode is "a few %" — a number borrowed
from the reference's hardware. This measures the repo's OWN decoders on the
v5e at the bench workloads' exact shapes, so the e2e accounting is ours:

  * FLUX/SD3.5 AutoencoderKL (16ch), 1024x2048  <- headline + sd35 rows
  * SDXL AutoencoderKL (4ch),       1024x2048  <- sdxl row
  * Wan2.1 3D VAE chunked decode, 81f 720x1280 <- A14B flagship
  * Wan2.1 3D VAE chunked decode, 121f 768x768 (z16 spatial-8x arch at the
    wan5b pixel workload; the TI2V-16x VAE variant shares the machinery)

Each: jit + warmup, then min over REPS with a fresh latent tensor. Random
VAE weights (decode latency is weight-value-independent).

Run: nohup python -u examples/profiling/vae_decode_timing.py > /tmp/vae.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache

REPS = 3


def timeit(tag, fn, lat_shape, denoise_s):
    lat = jax.random.normal(jax.random.key(0), lat_shape, jnp.float32)
    t0 = time.perf_counter()
    np.asarray(fn(lat))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for i in range(REPS):
        lat = jax.random.normal(jax.random.key(1 + i), lat_shape, jnp.float32)
        t0 = time.perf_counter()
        np.asarray(fn(lat))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:44s} {best*1e3:9.1f} ms  (+{100*best/denoise_s:5.1f}% of the "
          f"{denoise_s:.1f}s denoise row; compile {compile_s:.1f}s)",
          flush=True)
    return best


def main():
    enable_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)
    from fastdm_tpu.pipeline.vae import (
        VAEConfig, vae_decode, vae_decoder_random,
    )

    # FLUX/SD3.5 16-ch KL VAE at 1024x2048 (latents 128x256)
    cfg16 = VAEConfig(latent_channels=16)
    p16 = jax.jit(lambda k: vae_decoder_random(k, cfg16))(jax.random.key(0))
    dec16 = jax.jit(lambda z: vae_decode(p16, cfg16, z))
    timeit("flux/sd35 KL-VAE 1024x2048", dec16, (1, 16, 128, 256), 13.07)

    # SDXL 4-ch KL VAE at 1024x2048
    cfg4 = VAEConfig(latent_channels=4, scaling_factor=0.13025, shift_factor=0.0)
    p4 = jax.jit(lambda k: vae_decoder_random(k, cfg4))(jax.random.key(1))
    dec4 = jax.jit(lambda z: vae_decode(p4, cfg4, z))
    timeit("sdxl KL-VAE 1024x2048", dec4, (1, 4, 128, 256), 7.93)
    del p16, p4

    from fastdm_tpu.pipeline.wan_vae import (
        WanVAEConfig, wan_vae_decode_chunked, wan_vae_random,
    )

    wcfg = WanVAEConfig()
    wp = jax.jit(lambda k: wan_vae_random(k, wcfg))(jax.random.key(2))
    wdec = jax.jit(lambda z: wan_vae_decode_chunked(wp, wcfg, z))
    # A14B: 81f 720x1280 -> latents (1,16,21,90,160)
    timeit("wan 3D-VAE chunked 81f 720x1280", wdec, (1, 16, 21, 90, 160),
           1000.0)
    # wan5b pixel workload at the z16/8x arch: 121f 768x768 -> (1,16,31,96,96)
    timeit("wan 3D-VAE chunked 121f 768x768", wdec, (1, 16, 31, 96, 96),
           104.77)


if __name__ == "__main__":
    main()
