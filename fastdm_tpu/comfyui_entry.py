"""ComfyUI forward wrappers (ref: fastdm/comfyui_entry.py).

ComfyUI drives torch `diffusion_model(x, timestep, context, y, ...)` callables;
these wrappers bridge torch CPU tensors <-> JAX device arrays around the
jitted cores. The sigma-indexed cache step callback of the reference
(doc/introduction.md:62-67) is replaced by the on-device cache carried across
calls via engine-side state (wired when caching is enabled).

Torch is only needed when ComfyUI actually calls in — imports are deferred.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp


def _to_jax(t, dtype=jnp.bfloat16):
    return jnp.asarray(np.asarray(t.detach().cpu().float()), dtype)


def _to_torch(a, like):
    import torch

    return torch.from_numpy(np.asarray(a, np.float32)).to(like.dtype)


def pad_to_patch_size(x_np: np.ndarray, patch: int = 2):
    """(ref: comfyui_entry.py:17-25) pad H/W up to the patch multiple."""
    b, c, h, w = x_np.shape
    ph, pw = (-h) % patch, (-w) % patch
    if ph or pw:
        x_np = np.pad(x_np, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="edge")
    return x_np, (h, w)


class ComfyUIFluxForwardWrapper:
    """Callable matching ComfyUI's flux diffusion_model signature
    (ref: comfyui_entry.py:287+)."""

    def __init__(self, params, cfg):
        import jax

        self.params = params
        self.cfg = cfg
        self._fwd = jax.jit(
            __import__("fastdm_tpu.models.flux", fromlist=["flux_forward"]).flux_forward,
            static_argnames="cfg",
        )
        self._rope_cache = {}

    def __call__(self, x, timestep, context, y, guidance=None, control=None,
                 transformer_options={}, **kwargs):
        from fastdm_tpu.models.flux import flux_rope_cache
        from fastdm_tpu.pipeline.denoise import flux_pack_latents, flux_unpack_latents

        x_np, (h, w) = pad_to_patch_size(np.asarray(x.detach().cpu().float()))
        hp, wp = x_np.shape[-2:]
        ht, wt = hp // 2, wp // 2
        hidden = flux_pack_latents(jnp.asarray(x_np, jnp.bfloat16))
        ctx = _to_jax(context)
        pooled = _to_jax(y)
        t = jnp.asarray(np.asarray(timestep.detach().cpu().float()), jnp.float32)
        g = (
            jnp.asarray(np.asarray(guidance.detach().cpu().float()), jnp.float32)
            if guidance is not None
            else jnp.full(t.shape, 3.5, jnp.float32)
        )
        key = (ctx.shape[1], ht, wt)
        if key not in self._rope_cache:
            self._rope_cache[key] = flux_rope_cache(self.cfg, ctx.shape[1], ht, wt)
        cos, sin = self._rope_cache[key]
        out = self._fwd(self.params, self.cfg, hidden, ctx, pooled, t, cos, sin, guidance=g)
        img = flux_unpack_latents(out, ht, wt)[:, :, :h, :w]
        return _to_torch(img, x)


class ComfyUISDXLForwardWrapper:
    """Callable matching ComfyUI's SDXL UNet signature."""

    def __init__(self, params, cfg):
        import jax

        self.params = params
        self.cfg = cfg
        self._fwd = jax.jit(
            __import__("fastdm_tpu.models.sdxl", fromlist=["sdxl_forward"]).sdxl_forward,
            static_argnames="cfg",
        )

    def __call__(self, x, timesteps=None, context=None, y=None, control=None,
                 transformer_options={}, **kwargs):
        sample = jnp.asarray(np.asarray(x.detach().cpu().float()), jnp.float32)
        t = jnp.asarray(np.asarray(timesteps.detach().cpu().float()), jnp.float32)
        ctx = _to_jax(context)
        y_np = np.asarray(y.detach().cpu().float())
        # ComfyUI packs pooled text embeds + 6 sinusoid-encoded time ids into
        # y; the pooled width comes from the config (1280 for stock SDXL) —
        # recovering the ids from their sinusoids is lossy, so time_ids ride
        # as zeros and y's leading block is the pooled text embedding.
        pooled_dim = self.cfg.add_embedding_in_dim - 6 * self.cfg.addition_time_embed_dim
        pooled = jnp.asarray(y_np[:, :pooled_dim], jnp.bfloat16)
        time_ids = jnp.zeros((y_np.shape[0], 6), jnp.float32)
        out = self._fwd(self.params, self.cfg, sample, t, ctx, pooled, time_ids)
        return _to_torch(out, x)


class ComfyUISD3ForwardWrapper:
    """Callable matching ComfyUI's SD3 MMDiT signature
    (ref wrapper role: comfyui_entry.py SD35 path)."""

    def __init__(self, params, cfg):
        import jax

        self.params = params
        self.cfg = cfg
        self._fwd = jax.jit(
            __import__("fastdm_tpu.models.sd35", fromlist=["sd3_forward"]).sd3_forward,
            static_argnames="cfg",
        )
        self._pos_cache = {}

    def __call__(self, x, timestep=None, context=None, y=None,
                 transformer_options={}, **kwargs):
        from fastdm_tpu.models.sd35 import sd3_cropped_pos_embed

        sample = jnp.asarray(np.asarray(x.detach().cpu().float()), jnp.float32)
        h, w = sample.shape[-2:]
        if (h, w) not in self._pos_cache:
            self._pos_cache[(h, w)] = sd3_cropped_pos_embed(
                self.cfg, self.params.get("pos_embed_table"), h, w
            )
        t = jnp.asarray(np.asarray(timestep.detach().cpu().float()), jnp.float32)
        # ComfyUI hands flow sigma in [0,1]; the core expects 0..1000 timesteps
        t = t * 1000.0
        out = self._fwd(
            self.params, self.cfg, sample, _to_jax(context), _to_jax(y), t,
            self._pos_cache[(h, w)],
        )
        return _to_torch(out, x)


class ComfyUIQwenForwardWrapper:
    """Callable matching ComfyUI's Qwen-Image signature (packed like flux)."""

    def __init__(self, params, cfg):
        import jax

        self.params = params
        self.cfg = cfg
        self._fwd = jax.jit(
            __import__(
                "fastdm_tpu.models.qwenimage", fromlist=["qwen_forward"]
            ).qwen_forward,
            static_argnames="cfg",
        )
        self._rope_cache = {}

    def __call__(self, x, timestep=None, context=None, attention_mask=None,
                 transformer_options={}, **kwargs):
        from fastdm_tpu.models.qwenimage import qwen_rope_cos_sin
        from fastdm_tpu.pipeline.denoise import flux_pack_latents, flux_unpack_latents

        x_np, (h, w) = pad_to_patch_size(np.asarray(x.detach().cpu().float()))
        ht, wt = x_np.shape[-2] // 2, x_np.shape[-1] // 2
        hidden = flux_pack_latents(jnp.asarray(x_np, jnp.bfloat16))
        ctx = _to_jax(context)
        t = jnp.asarray(np.asarray(timestep.detach().cpu().float()), jnp.float32)
        key = (ht, wt, ctx.shape[1])
        if key not in self._rope_cache:
            self._rope_cache[key] = qwen_rope_cos_sin(self.cfg, 1, ht, wt, ctx.shape[1])
        cos, sin = self._rope_cache[key]
        out = self._fwd(self.params, self.cfg, hidden, ctx, t, cos, sin)
        img = flux_unpack_latents(out, ht, wt)[:, :, :h, :w]
        return _to_torch(img, x)


class ComfyUISDXLControlnetForwardWrapper:
    """control_model callable for comfy.controlnet.ControlNet: returns the
    {'middle': [mid], 'output': [down...]} residual dict ComfyUI applies to
    the UNet (ref: ComfyUIControlnetForwardWrapper, comfyui nodes)."""

    def __init__(self, params, cfg):
        self.params = params
        self.cfg = cfg

    def __call__(self, x, hint=None, timesteps=None, context=None, y=None, **kwargs):
        from fastdm_tpu.models.controlnets import sdxl_controlnet_forward

        sample = jnp.asarray(np.asarray(x.detach().cpu().float()), jnp.float32)
        t = jnp.asarray(np.asarray(timesteps.detach().cpu().float()), jnp.float32)
        ctx = _to_jax(context)
        y_np = np.asarray(y.detach().cpu().float())
        pooled_dim = self.cfg.add_embedding_in_dim - 6 * self.cfg.addition_time_embed_dim
        pooled = jnp.asarray(y_np[:, :pooled_dim], jnp.bfloat16)
        time_ids = jnp.zeros((y_np.shape[0], 6), jnp.float32)
        # ComfyUI hint is (B, 3, H, W) in [0, 1]; our encoder wants NHWC
        cn_cond = jnp.asarray(
            np.asarray(hint.detach().cpu().float()).transpose(0, 2, 3, 1), jnp.float32
        )
        down, mid = sdxl_controlnet_forward(
            self.params, self.cfg, sample, t, ctx, pooled, time_ids, cn_cond
        )
        # NHWC -> NCHW torch for ComfyUI's residual application
        to_t = lambda a: _to_torch(jnp.transpose(a, (0, 3, 1, 2)), x)
        return {"middle": [to_t(mid)], "output": [to_t(d) for d in down]}


class ComfyUIFluxControlnetForwardWrapper:
    """control_model callable for flux ControlNets: returns the stacked
    per-layer residual dict ('input' = dual-block, 'output' = single-block)."""

    def __init__(self, params, cfg):
        self.params = params
        self.cfg = cfg
        self._rope_cache = {}

    def __call__(self, x, hint=None, timesteps=None, context=None, y=None,
                 guidance=None, **kwargs):
        from fastdm_tpu.models.controlnets import flux_controlnet_forward
        from fastdm_tpu.models.flux import flux_rope_cache
        from fastdm_tpu.pipeline.denoise import flux_pack_latents

        x_np, _ = pad_to_patch_size(np.asarray(x.detach().cpu().float()))
        ht, wt = x_np.shape[-2] // 2, x_np.shape[-1] // 2
        hidden = flux_pack_latents(jnp.asarray(x_np, jnp.bfloat16))
        hint_np, _ = pad_to_patch_size(np.asarray(hint.detach().cpu().float()))
        cnd = flux_pack_latents(jnp.asarray(hint_np, jnp.bfloat16))
        ctx = _to_jax(context)
        pooled = _to_jax(y)
        t = jnp.asarray(np.asarray(timesteps.detach().cpu().float()), jnp.float32)
        g = (
            jnp.asarray(np.asarray(guidance.detach().cpu().float()), jnp.float32)
            if guidance is not None
            else jnp.full(t.shape, 3.5, jnp.float32)
        )
        key = (ctx.shape[1], ht, wt)
        if key not in self._rope_cache:
            self._rope_cache[key] = flux_rope_cache(self.cfg, ctx.shape[1], ht, wt)
        cos, sin = self._rope_cache[key]
        bs, sbs = flux_controlnet_forward(
            self.params, self.cfg, hidden, cnd, ctx, pooled, t, cos, sin, guidance=g
        )
        out = {}
        if bs is not None:
            out["input"] = [_to_torch(bs[i], x) for i in range(bs.shape[0])]
        if sbs is not None:
            out["output"] = [_to_torch(sbs[i], x) for i in range(sbs.shape[0])]
        return out
