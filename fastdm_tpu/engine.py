"""FastDMEngine — the end-user engine (ref: fastdm/model_entry.py:529-834).

API-compatible constructor flags (`use_fp8`/`use_int8`, `kernel_backend`,
`cache_config`, `sparse_attn_config`, `oom_resolve`) and `.generate()` kwargs.
Differences by design:
  * the denoise loop is owned (one jit, SURVEY.md §7) instead of delegating to
    diffusers;
  * `oom_resolve` is a no-op accepted for CLI parity — text encoders always
    run host-side (see pipeline/text_encoder.py), which is the TPU-native
    equivalent;
  * compiled denoisers are memoized per (resolution, steps, batch) — the
    reference's warmup-run convention (examples/demo/gen.py) maps to first-call
    compilation here.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.caching.xcaching import AutoCache
from fastdm_tpu.kernels import set_global_backend
from fastdm_tpu.models.flux import FluxConfig, flux_load, flux_rope_cache
from fastdm_tpu.models.loader import TensorSource
from fastdm_tpu.pipeline.denoise import (
    flux_unpack_latents,
    make_flux_denoiser,
)
from fastdm_tpu.pipeline.schedulers import (
    FlowMatchEulerScheduler,
    flow_match_shift_mu,
)
from fastdm_tpu.pipeline.text_encoder import FluxTextEncoder
from fastdm_tpu.pipeline.vae import VAEConfig, vae_decode, vae_load

ARCH_ALIASES = {
    "flux": "flux", "flux-dev": "flux", "flux-krea": "flux", "flux-kontext": "flux",
}


class FastDMEngine:
    def __init__(
        self,
        model_path: str,
        architecture: str = "flux",
        use_fp8: bool = False,
        use_int8: bool = False,
        kernel_backend: str = "auto",
        cache_config: Optional[str | Dict[str, Any]] = None,
        sparse_attn_config: Optional[str | Dict[str, Any]] = None,
        oom_resolve: bool = False,  # accepted for parity; host text-encode is default
        max_sequence_length: int = 512,
        quant_mods: bool = False,
        verbose: bool = True,
    ):
        arch = ARCH_ALIASES.get(architecture, architecture)
        if arch != "flux":
            raise NotImplementedError(
                f"architecture {architecture!r} not wired into the engine yet "
                "(flux is; sd35/sdxl/qwen/wan cores exist at the model level)"
            )
        self.architecture = arch
        set_global_backend(kernel_backend)
        quant = "fp8" if use_fp8 else ("int8" if use_int8 else None)

        t0 = time.perf_counter()
        self.cfg = FluxConfig(quant=quant, quant_mods=quant_mods)
        src = TensorSource.from_path(os.path.join(model_path, "transformer"))
        self.params = flux_load(src, self.cfg)

        self.vae_cfg = VAEConfig()
        self.vae_params = vae_load(
            TensorSource.from_path(os.path.join(model_path, "vae")), self.vae_cfg
        )
        self.text_encoder = FluxTextEncoder(model_path, max_sequence_length)
        self.max_sequence_length = max_sequence_length

        self.cache = None
        if cache_config is not None:
            self.cache = (
                AutoCache.from_json(cache_config)
                if isinstance(cache_config, str)
                else AutoCache.from_dict(cache_config)
            )
        self.sparse_attn_config = sparse_attn_config  # used by wan (round 2)

        self._denoisers: Dict[tuple, Any] = {}
        self._decode = jax.jit(
            lambda p, z: vae_decode(p, self.vae_cfg, z)
        )
        if verbose:
            print(
                f"FastDMEngine[{arch}] loaded in {time.perf_counter() - t0:.1f}s "
                f"(quant={quant}, backend={kernel_backend})"
            )

    # ------------------------------------------------------------------

    def _get_denoiser(self, ht: int, wt: int, steps: int, guidance_scale: float):
        key = (ht, wt, steps, guidance_scale)
        if key not in self._denoisers:
            mu = flow_match_shift_mu(ht * wt)
            sched = FlowMatchEulerScheduler.create(
                steps, use_dynamic_shifting=True, mu=mu
            )
            cache_cfg = self.cache.config if self.cache is not None else None
            self._denoisers[key] = make_flux_denoiser(
                self.cfg, sched, steps, cache_cfg, guidance_scale
            )
        return self._denoisers[key]

    def generate(
        self,
        prompt: Optional[str] = None,
        negative_prompt: Optional[str] = None,  # flux-dev: unused (distilled)
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 25,
        guidance_scale: float = 3.5,
        seed: int = 42,
        num_images_per_prompt: int = 1,
        prompt_embeds: Optional[jnp.ndarray] = None,
        pooled_prompt_embeds: Optional[jnp.ndarray] = None,
        output_type: str = "np",
        task: str = "t2i",
        **_,
    ):
        """Text-to-image generation (ref: FastDMEngine.generate,
        model_entry.py:719-834). Returns uint8 images (B, H, W, 3) for
        output_type="np", or raw latents for "latent"."""
        assert task == "t2i", f"task {task!r} lands with the other model cores"
        if prompt_embeds is None:
            prompt_embeds, pooled_prompt_embeds = self.text_encoder.encode(
                prompt, num_images_per_prompt
            )
        b = prompt_embeds.shape[0]
        ht, wt = height // 16, width // 16

        cos, sin = flux_rope_cache(self.cfg, prompt_embeds.shape[1], ht, wt)
        latents = jax.random.normal(
            jax.random.key(seed), (b, ht * wt, self.cfg.in_channels), jnp.float32
        )
        run = self._get_denoiser(ht, wt, num_inference_steps, guidance_scale)
        latents = run(self.params, latents, prompt_embeds, pooled_prompt_embeds, cos, sin)
        if output_type == "latent":
            return np.asarray(latents)

        z = flux_unpack_latents(latents, ht, wt)
        img = self._decode(self.vae_params, z)  # (B, H, W, 3) in [-1, 1]
        img = np.asarray(jnp.clip(img * 0.5 + 0.5, 0.0, 1.0))
        return (img * 255).round().astype(np.uint8)
