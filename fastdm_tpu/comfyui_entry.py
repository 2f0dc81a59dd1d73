"""ComfyUI forward wrappers (ref: fastdm/comfyui_entry.py).

ComfyUI drives torch `diffusion_model(x, timestep, context, y, ...)` callables;
these wrappers bridge torch CPU tensors <-> JAX device arrays around the
jitted cores.

Step-skipping caches: the engine keeps cache state in the denoise-loop scan
carry, but ComfyUI drives the model one externally-scheduled call per step —
so here the state lives host-side on the wrapper (`HostStepCache`), and the
step index is recovered from the sampler's sigma schedule exactly like the
reference's sigma-indexed callback (ref: fastdm/comfyui_entry.py:291-294,
doc/introduction.md:62-67). Pass `cache=AutoCache(...)` to the Flux/SD3/Qwen
wrappers to enable it.

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


class HostStepCache:
    """Host-side cache state across per-step ComfyUI calls.

    ComfyUI calls the model once (or twice, for CFG) per sampler step; the
    reference recovers the step index by locating the call's sigma in the
    full schedule (`transformer_options['sample_sigmas']` vs `['sigmas']`,
    ref: fastdm/comfyui_entry.py:291-294) and keeps skip state on the model
    object. Same design here: `cached_run` is pure, so the jax-array state
    dict simply persists on this object between calls. CFG double-calls at
    the same step alternate pos/neg state slots, matching the reference's
    `negtive_cache` dual-state (ref: fastdm/caching/xcaching.py:66-76).
    A step index that moves backwards signals a new sampling run -> reset.
    """

    def __init__(self, config):
        from fastdm_tpu.caching.xcaching import negative_stream_config

        self.config = config
        self.neg_config = negative_stream_config(config)
        self.reset()

    def reset(self):
        self.states = [None, None]  # pos / neg CFG stream
        self._last_step = None
        self._total = None
        self._chunk = 0

    @property
    def skips(self) -> int:
        """Total recorded step-skips across both CFG streams (observability
        parity with the reference's per-step skip prints)."""
        return sum(int(st["skips"]) for st in self.states if st is not None)

    @staticmethod
    def step_from_options(transformer_options) -> Optional[tuple]:
        """(step, total) from the sampler sigma schedule; None when ComfyUI
        didn't provide sigmas (then the caller must run uncached)."""
        all_s = transformer_options.get("sample_sigmas")
        cur = transformer_options.get("sigmas")
        if all_s is None or cur is None:
            return None
        all_np = np.asarray(all_s.detach().cpu().float()).reshape(-1)
        cur_np = np.asarray(cur.detach().cpu().float()).reshape(-1)
        idx = np.nonzero(all_np == cur_np[0])[0]
        if idx.size == 0:
            return None
        # total = full schedule length, matching the reference's
        # total_steps_callback = all_steps_sigmas.shape[0] (:294)
        return int(idx[0]), int(all_np.shape[0])

    def begin(self, step: int, total: Optional[int] = None,
              marker: Optional[int] = None) -> int:
        """Select the state slot for this call; returns the slot index.

        New-run detection: within one sampling run the recovered step index
        only ever repeats (CFG / cond-chunk forwards) or advances by exactly
        1, so a backward move, a jump > 1, or a changed schedule length all
        signal a fresh run and reset the cross-run state (stale
        prev_probe/prev_residual from another image must never feed a skip
        decision). The one undetectable case — a new run whose first step
        equals or immediately follows the previous run's last step with the
        SAME schedule length — degrades to at most one mis-judged probe
        delta, never a crash.

        Slot selection: when the sampler labels the call (`marker` derived
        from ComfyUI's `transformer_options['cond_or_uncond']`, where 0 =
        cond / 1 = uncond) that label wins — ComfyUI's cond execution order
        is NOT guaranteed, so an unlabeled chunk heuristic could route the
        skip-driving positive trajectory into the negative slot (ADVICE r3).
        Without a marker, fall back to the chunk heuristic: chunk 0 of a
        step is the positive stream (slot 0); every later chunk shares slot
        1, keeping the positive trajectory clean even when ComfyUI splits a
        step into 3+ model calls."""
        if (self._last_step is None or step < self._last_step
                or step > self._last_step + 1
                or (total is not None and self._total is not None
                    and total != self._total)):
            self.reset()
        if step == self._last_step:
            self._chunk += 1
        else:
            self._chunk = 0
        self._last_step = step
        if total is not None:
            self._total = total
        if marker is not None:
            return min(max(int(marker), 0), 1)
        return min(self._chunk, 1)

    @staticmethod
    def marker_from_options(transformer_options) -> Optional[int]:
        """Map ComfyUI's `cond_or_uncond` list (0 = cond, 1 = uncond) to a
        state-slot marker. A batched cond+uncond call ([0, 1]) runs both
        streams at once — route it to the positive slot (0) so the
        skip-driving trajectory stays the conditioned one; an uncond-only
        call maps to slot 1. None when the option is absent/unrecognised
        (caller falls back to the chunk heuristic)."""
        cou = transformer_options.get("cond_or_uncond")
        if cou is None:
            return None
        try:
            vals = {int(v) for v in cou}
        except (TypeError, ValueError):
            return None
        if not vals or not vals <= {0, 1}:
            return None
        return 0 if 0 in vals else 1

    def config_for(self, slot: int):
        return self.config if slot == 0 else self.neg_config

    def ensure_state(self, slot: int, hidden_shape, probe_shape):
        if self.states[slot] is None:
            from fastdm_tpu.caching.xcaching import cache_init_state

            self.states[slot] = cache_init_state(
                self.config_for(slot), hidden_shape, probe_shape
            )
        return self.states[slot]

    def dispatch(self, fwd_cached, transformer_options, hshape, pshape,
                 params, cfg, *fwd_args, **fwd_kwargs):
        """One cached forward: recover the step, pick the CFG slot, run
        `fwd_cached(params, cfg, cache_cfg, state, step, total, *fwd_args)`,
        persist the new state. Returns None when the sampler didn't provide
        a recoverable step (caller then runs the uncached forward) — the
        single implementation behind every ComfyUI wrapper."""
        step_info = self.step_from_options(transformer_options)
        if step_info is None:
            return None
        step, total = step_info
        slot = self.begin(step, total,
                          marker=self.marker_from_options(transformer_options))
        st = self.ensure_state(slot, hshape, pshape)
        out, st = fwd_cached(
            params, cfg, self.config_for(slot), st, jnp.int32(step), total,
            *fwd_args, **fwd_kwargs,
        )
        self.states[slot] = st
        return out


def _make_host_cache(cache) -> Optional[HostStepCache]:
    """Wrapper-ctor helper: AutoCache | CacheConfig | None -> HostStepCache."""
    if cache is None:
        return None
    config = getattr(cache, "config", cache)
    if not config.enable_caching:
        return None
    return HostStepCache(config)


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

    def __init__(self, params, cfg, cache=None):
        import jax

        from fastdm_tpu.models.flux import flux_forward, flux_forward_cached

        self.params = params
        self.cfg = cfg
        self._fwd = jax.jit(flux_forward, static_argnames="cfg")
        self.cache = _make_host_cache(cache)
        self._fwd_cached = (
            jax.jit(flux_forward_cached,
                    static_argnames=("cfg", "cache_cfg", "total_steps"))
            if self.cache is not None else None
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
        out = None
        if self.cache is not None:
            hshape = (hidden.shape[0], hidden.shape[1], self.cfg.inner_dim)
            out = self.cache.dispatch(
                self._fwd_cached, transformer_options, hshape, hshape,
                self.params, self.cfg, hidden, ctx, pooled, t, cos, sin,
                guidance=g,
            )
        if out is None:
            out = self._fwd(self.params, self.cfg, hidden, ctx, pooled, t,
                            cos, sin, guidance=g)
        img = flux_unpack_latents(out, ht, wt)[:, :, :h, :w]
        return _to_torch(img, x)


class ComfyUISDXLForwardWrapper:
    """Callable matching ComfyUI's SDXL UNet signature.

    IP-Adapter: when the loaded checkpoint carries fused ipadp_kv weights
    and ComfyUI's IPAdapter extension registered an attn2 patch
    (transformer_options["patches_replace"]["attn2"]), the patch's image
    embeds are routed per cond_or_uncond and gated on the step sigma
    ([sigma_end, sigma_start]) exactly like the reference's sigma-gated
    branch (ref: fastdm/comfyui_entry.py:47-101 transformer_options
    threading + fastdm/layer/unetblock.py:70-127 update_scale_and_conuncon)."""

    def __init__(self, params, cfg):
        import jax

        self.params = params
        self.cfg = cfg
        self._fwd = jax.jit(
            __import__("fastdm_tpu.models.sdxl", fromlist=["sdxl_forward"]).sdxl_forward,
            static_argnames="cfg",
        )

    def _ip_from_options(self, transformer_options, batch):
        """-> (ip_embeds (B, L, D) | None, ip_scale | None) from the ComfyUI
        IPAdapter attn2 patch, sigma-gated and cond/uncond-routed."""
        opts = transformer_options or {}
        patches = opts.get("patches_replace", {}).get("attn2") or {}
        if not patches or not self.cfg.ip_adapter:
            return None, None
        patch = next(iter(patches.values()))
        kws = getattr(patch, "kwargs", None)
        if kws is None and isinstance(patch, dict):
            kws = patch.get("kwargs")
        if not kws:
            return None, None
        kw = kws[0] if isinstance(kws, (list, tuple)) else kws
        sig = opts.get("sigmas")
        sigma = float(np.asarray(sig.detach().cpu())[0]) if sig is not None \
            else 999999999.9
        s_start = float(kw.get("sigma_start", 999999999.9))
        s_end = float(kw.get("sigma_end", 0.0))
        if not (s_end <= sigma <= s_start):
            return None, None
        cond = kw.get("cond")
        uncond = kw.get("uncond")
        if cond is None:
            return None, None
        cond_j = _to_jax(cond)
        uncond_j = _to_jax(uncond) if uncond is not None else \
            jnp.zeros_like(cond_j)
        cou = opts.get("cond_or_uncond") or [0]
        per = max(1, batch // len(cou))
        segs = []
        for marker in cou:
            e = uncond_j if int(marker) == 1 else cond_j
            if e.shape[0] == 1 and per > 1:
                e = jnp.broadcast_to(e, (per, *e.shape[1:]))
            segs.append(e[:per])
        embeds = jnp.concatenate(segs, axis=0)
        weight = kw.get("weight", self.cfg.ip_adapter_scale)
        try:
            weight = float(weight)
        except (TypeError, ValueError):
            weight = self.cfg.ip_adapter_scale
        return embeds, jnp.float32(weight)

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
        ip_embeds, ip_scale = self._ip_from_options(
            transformer_options, sample.shape[0])
        out = self._fwd(self.params, self.cfg, sample, t, ctx, pooled, time_ids,
                        ip_embeds=ip_embeds, ip_scale=ip_scale)
        return _to_torch(out, x)


class ComfyUISD3ForwardWrapper:
    """Callable matching ComfyUI's SD3 MMDiT signature
    (ref wrapper role: comfyui_entry.py SD35 path)."""

    def __init__(self, params, cfg, cache=None):
        import jax

        from fastdm_tpu.models.sd35 import sd3_forward, sd3_forward_cached

        self.params = params
        self.cfg = cfg
        self._fwd = jax.jit(sd3_forward, static_argnames="cfg")
        self.cache = _make_host_cache(cache)
        self._fwd_cached = (
            jax.jit(sd3_forward_cached,
                    static_argnames=("cfg", "cache_cfg", "total_steps"))
            if self.cache is not None else None
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
        out = None
        if self.cache is not None:
            p = self.cfg.patch_size
            hshape = (sample.shape[0], (h // p) * (w // p), self.cfg.inner_dim)
            out = self.cache.dispatch(
                self._fwd_cached, transformer_options, hshape, hshape,
                self.params, self.cfg, sample, _to_jax(context), _to_jax(y),
                t, self._pos_cache[(h, w)],
            )
        if out is None:
            out = self._fwd(
                self.params, self.cfg, sample, _to_jax(context), _to_jax(y), t,
                self._pos_cache[(h, w)],
            )
        return _to_torch(out, x)


class ComfyUIQwenForwardWrapper:
    """Callable matching ComfyUI's Qwen-Image signature (packed like flux)."""

    def __init__(self, params, cfg, cache=None):
        import jax

        from fastdm_tpu.models.qwenimage import qwen_forward, qwen_forward_cached

        self.params = params
        self.cfg = cfg
        self._fwd = jax.jit(qwen_forward, static_argnames="cfg")
        self.cache = _make_host_cache(cache)
        self._fwd_cached = (
            jax.jit(qwen_forward_cached,
                    static_argnames=("cfg", "cache_cfg", "total_steps"))
            if self.cache is not None else None
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
        out = None
        if self.cache is not None:
            from fastdm_tpu.caching.config import TeaCacheConfig

            hshape = (hidden.shape[0], hidden.shape[1], self.cfg.inner_dim)
            # qwen TeaCache probes the TEXT-stream modulated input
            # (ref: xcaching.py:171-181 qwenimage path)
            pshape = (
                (ctx.shape[0], ctx.shape[1], self.cfg.inner_dim)
                if isinstance(self.cache.config, TeaCacheConfig) else hshape
            )
            out = self.cache.dispatch(
                self._fwd_cached, transformer_options, hshape, pshape,
                self.params, self.cfg, hidden, ctx, t, cos, sin,
            )
        if out is None:
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
