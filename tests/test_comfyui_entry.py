"""ComfyUI forward-wrapper smoke tests (ref surface: fastdm/comfyui_entry.py).

Drives every wrapper with torch CPU tensors through the ComfyUI calling
conventions (x/timestep/context/y/hint, NCHW, odd sizes for patch padding)
on tiny random-init cores, asserting torch-tensor outputs of the right
shape come back — the torch<->jax bridge, rope caches, y-unpacking and
residual-dict layouts are the code under test.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _t(shape, seed=0, scale=1.0):
    r = np.random.default_rng(seed)
    return torch.from_numpy(r.standard_normal(shape).astype(np.float32) * scale)


def test_flux_wrapper_pads_and_returns_torch():
    from fastdm_tpu.comfyui_entry import ComfyUIFluxForwardWrapper
    from fastdm_tpu.models.flux import FluxConfig, flux_init_random

    cfg = FluxConfig(num_layers=1, num_single_layers=1, attention_head_dim=32,
                     num_attention_heads=2, joint_attention_dim=24,
                     pooled_projection_dim=16, in_channels=8, out_channels=8,
                     axes_dims_rope=(8, 12, 12), guidance_embeds=False,
                     quant=None)
    params = flux_init_random(jax.random.key(0), cfg)
    w = ComfyUIFluxForwardWrapper(params, cfg)
    # odd H exercises pad_to_patch_size; latent C = in_channels / 4 = 2
    x = _t((1, 2, 7, 8), 1)
    out = w(x, timestep=_t((1,), 2, 0.1).abs(), context=_t((1, 5, 24), 3),
            y=_t((1, 16), 4))
    assert isinstance(out, torch.Tensor)
    assert out.shape == (1, 2, 7, 8)
    assert torch.isfinite(out).all()
    # rope cache reused on second call (same spatial key)
    assert len(w._rope_cache) == 1
    w(x, timestep=_t((1,), 5, 0.1).abs(), context=_t((1, 5, 24), 6), y=_t((1, 16), 7))
    assert len(w._rope_cache) == 1


def test_sdxl_wrapper_unpacks_pooled_from_config():
    from fastdm_tpu.comfyui_entry import ComfyUISDXLForwardWrapper
    from fastdm_tpu.models.sdxl import SDXLConfig, sdxl_init_random

    cfg = SDXLConfig(block_channels=(8, 16, 32), cross_attention_dim=16,
                     attn_layers=(0, 1, 2), head_dim=8,
                     addition_time_embed_dim=4, time_embed_dim=16,
                     add_embedding_in_dim=8 + 6 * 4, norm_groups=4, quant=None)
    params = sdxl_init_random(jax.random.key(0), cfg)
    w = ComfyUISDXLForwardWrapper(params, cfg)
    # y = pooled(8) + 6 encoded time ids (4 each) — the wrapper must slice the
    # pooled width from the CONFIG (regression: it was hardcoded to 1280)
    y = _t((1, 8 + 24), 4)
    out = w(_t((1, 4, 16, 16), 1), timesteps=torch.tensor([500.0]),
            context=_t((1, 6, 16), 3), y=y)
    assert out.shape == (1, 4, 16, 16)
    assert torch.isfinite(out).all()


def test_sd3_wrapper_scales_sigma_to_timestep():
    from fastdm_tpu.comfyui_entry import ComfyUISD3ForwardWrapper
    from fastdm_tpu.models.sd35 import SD3Config, sd3_init_random

    cfg = SD3Config(sample_size=16, patch_size=2, in_channels=4, out_channels=4,
                    num_layers=4, attention_head_dim=16, num_attention_heads=4,
                    joint_attention_dim=32, caption_projection_dim=64,
                    pooled_projection_dim=24, pos_embed_max_size=24,
                    num_dual_layers=2, quant=None)
    params = sd3_init_random(jax.random.key(0), cfg)
    w = ComfyUISD3ForwardWrapper(params, cfg)
    out = w(_t((1, 4, 16, 16), 1), timestep=torch.tensor([0.5]),
            context=_t((1, 6, 32), 2), y=_t((1, 24), 3))
    assert out.shape == (1, 4, 16, 16)
    assert torch.isfinite(out).all()
    assert len(w._pos_cache) == 1


def test_qwen_wrapper_roundtrip():
    from fastdm_tpu.comfyui_entry import ComfyUIQwenForwardWrapper
    from fastdm_tpu.models.qwenimage import QwenImageConfig, qwen_init_random

    cfg = QwenImageConfig(num_layers=2, attention_head_dim=32,
                          num_attention_heads=2, joint_attention_dim=24,
                          in_channels=8, out_channels=2,
                          axes_dims_rope=(8, 12, 12), quant=None)
    params = qwen_init_random(jax.random.key(0), cfg)
    w = ComfyUIQwenForwardWrapper(params, cfg)
    x = _t((1, 2, 6, 7), 1)  # odd W exercises padding
    out = w(x, timestep=torch.tensor([0.7]), context=_t((1, 5, 24), 2))
    assert out.shape == (1, 2, 6, 7)
    assert torch.isfinite(out).all()


def _flux_tiny():
    from fastdm_tpu.models.flux import FluxConfig, flux_init_random

    cfg = FluxConfig(num_layers=2, num_single_layers=1, attention_head_dim=32,
                     num_attention_heads=2, joint_attention_dim=24,
                     pooled_projection_dim=16, in_channels=8, out_channels=8,
                     axes_dims_rope=(8, 12, 12), guidance_embeds=False,
                     quant=None)
    return flux_init_random(jax.random.key(0), cfg), cfg


def _sigma_options(sigmas, i):
    """transformer_options the way ComfyUI's sampler populates them."""
    return {"sample_sigmas": sigmas, "sigmas": sigmas[i : i + 1]}


def test_flux_wrapper_cache_skips_steps():
    """Host-side DiCache across per-step ComfyUI calls: constant inputs make
    every post-warmup rel-L1 distance 0, so all non-forced steps must skip
    (ref node cache semantics: comfyui/nodes.py:144-184, sigma-indexed step:
    comfyui_entry.py:291-294)."""
    from fastdm_tpu.caching.xcaching import AutoCache
    from fastdm_tpu.comfyui_entry import ComfyUIFluxForwardWrapper

    params, cfg = _flux_tiny()
    cache = AutoCache.from_dict({
        "cache_algorithm": "dicache", "enable_caching": True,
        "threshold": 0.2, "probe_depth": 1, "ret_ratio": 0.2,
    })
    w = ComfyUIFluxForwardWrapper(params, cfg, cache=cache)
    assert w.cache is not None

    n = 8
    sigmas = torch.linspace(1.0, 0.0, n + 1)
    x = _t((1, 2, 8, 8), 1)
    ctx, y = _t((1, 5, 24), 3), _t((1, 16), 4)
    for i in range(n):
        out = w(x, timestep=sigmas[i : i + 1], context=ctx, y=y,
                transformer_options=_sigma_options(sigmas, i))
        assert out.shape == (1, 2, 8, 8) and torch.isfinite(out).all()
    # warmup = step <= int(0.2 * 9) = 1 -> steps 0,1 forced; 2..7 skip
    assert w.cache.skips >= 1
    assert w.cache.skips == n - 2

    # a fresh schedule (step index restarts) resets the state
    w(x, timestep=sigmas[:1], context=ctx, y=y,
      transformer_options=_sigma_options(sigmas, 0))
    assert w.cache.skips == 0


def test_flux_wrapper_cache_cfg_dual_stream():
    """CFG runs call the model twice per step; the two calls must land in
    separate state slots (ref dual pos/neg state: xcaching.py:66-76) — with
    DIFFERENT inputs per stream, cross-talk would poison the probe distance."""
    from fastdm_tpu.caching.xcaching import AutoCache
    from fastdm_tpu.comfyui_entry import ComfyUIFluxForwardWrapper

    params, cfg = _flux_tiny()
    cache = AutoCache.from_dict({
        "cache_algorithm": "dicache", "enable_caching": True,
        "threshold": 0.2, "probe_depth": 1, "ret_ratio": 0.2,
    })
    w = ComfyUIFluxForwardWrapper(params, cfg, cache=cache)

    n = 6
    sigmas = torch.linspace(1.0, 0.0, n + 1)
    x = _t((1, 2, 8, 8), 1)
    ctx_pos, ctx_neg = _t((1, 5, 24), 3), _t((1, 5, 24), 30)
    y = _t((1, 16), 4)
    for i in range(n):
        opts = _sigma_options(sigmas, i)
        w(x, timestep=sigmas[i : i + 1], context=ctx_pos, y=y,
          transformer_options=opts)
        w(x, timestep=sigmas[i : i + 1], context=ctx_neg, y=y,
          transformer_options=opts)
    assert all(st is not None for st in w.cache.states)
    # constant per-stream inputs -> both streams skip all non-warmup steps
    per_stream = n - 2  # warmup: step <= int(0.2*7) = 1
    assert w.cache.skips == 2 * per_stream


def test_wrapper_without_sigmas_runs_uncached():
    """ComfyUI contexts that omit sample_sigmas must still work (uncached)."""
    from fastdm_tpu.caching.xcaching import AutoCache
    from fastdm_tpu.comfyui_entry import ComfyUIFluxForwardWrapper

    params, cfg = _flux_tiny()
    cache = AutoCache.from_dict({
        "cache_algorithm": "dicache", "enable_caching": True,
        "threshold": 0.2, "probe_depth": 1, "ret_ratio": 0.2,
    })
    w = ComfyUIFluxForwardWrapper(params, cfg, cache=cache)
    out = w(_t((1, 2, 8, 8), 1), timestep=_t((1,), 2, 0.1).abs(),
            context=_t((1, 5, 24), 3), y=_t((1, 16), 4))
    assert torch.isfinite(out).all()
    assert all(st is None for st in w.cache.states)


def test_sd3_and_qwen_wrapper_cache():
    """SD3.5 + Qwen wrappers carry the same host cache (TeaCache for qwen
    exercises the text-stream probe shape)."""
    from fastdm_tpu.caching.xcaching import AutoCache
    from fastdm_tpu.comfyui_entry import (
        ComfyUIQwenForwardWrapper,
        ComfyUISD3ForwardWrapper,
    )
    from fastdm_tpu.models.qwenimage import QwenImageConfig, qwen_init_random
    from fastdm_tpu.models.sd35 import SD3Config, sd3_init_random

    n = 6
    sigmas = torch.linspace(1.0, 0.0, n + 1)

    cfg3 = SD3Config(sample_size=16, patch_size=2, in_channels=4, out_channels=4,
                     num_layers=4, attention_head_dim=16, num_attention_heads=4,
                     joint_attention_dim=32, caption_projection_dim=64,
                     pooled_projection_dim=24, pos_embed_max_size=24,
                     num_dual_layers=2, quant=None)
    w3 = ComfyUISD3ForwardWrapper(
        sd3_init_random(jax.random.key(0), cfg3), cfg3,
        cache=AutoCache.from_dict({
            "cache_algorithm": "fbcache", "enable_caching": True,
            "threshold": 0.3, "warmup_steps": 1,
        }))
    x3, c3, y3 = _t((1, 4, 16, 16), 1), _t((1, 6, 32), 2), _t((1, 24), 3)
    for i in range(n):
        out = w3(x3, timestep=sigmas[i : i + 1], context=c3, y=y3,
                 transformer_options=_sigma_options(sigmas, i))
        assert torch.isfinite(out).all()
    assert w3.cache.skips == n - 2  # warmup_steps=1 -> steps 0,1 forced

    cfgq = QwenImageConfig(num_layers=2, attention_head_dim=32,
                           num_attention_heads=2, joint_attention_dim=24,
                           in_channels=8, out_channels=2,
                           axes_dims_rope=(8, 12, 12), quant=None)
    wq = ComfyUIQwenForwardWrapper(
        qwen_init_random(jax.random.key(0), cfgq), cfgq,
        cache=AutoCache.from_dict({
            "cache_algorithm": "teacache", "enable_caching": True,
            "threshold": 0.5, "coefficients": [1.0, 0.0],
        }))
    xq, cq = _t((1, 2, 6, 8), 1), _t((1, 5, 24), 2)
    for i in range(n):
        out = wq(xq, timestep=sigmas[i : i + 1], context=cq,
                 transformer_options=_sigma_options(sigmas, i))
        assert torch.isfinite(out).all()
    assert wq.cache.skips == n - 1  # teacache forces step 0 only


def test_sdxl_controlnet_wrapper_residual_dict():
    from fastdm_tpu.comfyui_entry import ComfyUISDXLControlnetForwardWrapper
    from fastdm_tpu.models.controlnets import sdxl_controlnet_init_random
    from fastdm_tpu.models.sdxl import SDXLConfig

    cfg = SDXLConfig(block_channels=(8, 16, 32), cross_attention_dim=16,
                     attn_layers=(0, 1, 2), head_dim=8,
                     addition_time_embed_dim=4, time_embed_dim=16,
                     add_embedding_in_dim=8 + 6 * 4, norm_groups=4, quant=None)
    params = sdxl_controlnet_init_random(jax.random.key(0), cfg,
                                         cond_channels=(4, 8, 8, 8))
    w = ComfyUISDXLControlnetForwardWrapper(params, cfg)
    h = wd = 16
    out = w(_t((1, 4, h, wd), 1), hint=torch.rand(1, 3, 8 * h, 8 * wd),
            timesteps=torch.tensor([400.0]), context=_t((1, 6, 16), 3),
            y=_t((1, 32), 4))
    assert set(out) == {"middle", "output"}
    assert len(out["middle"]) == 1
    assert all(isinstance(o, torch.Tensor) for o in out["output"])
    # residuals are NCHW like ComfyUI applies them
    assert out["middle"][0].shape[1] == cfg.block_channels[-1]


def test_flux_controlnet_wrapper_residual_dict():
    from fastdm_tpu.comfyui_entry import ComfyUIFluxControlnetForwardWrapper
    from fastdm_tpu.models.controlnets import (
        FluxControlNetConfig,
        flux_controlnet_init_random,
    )

    cfg = FluxControlNetConfig(num_layers=2, num_single_layers=0,
                               attention_head_dim=32, num_attention_heads=2,
                               joint_attention_dim=24, pooled_projection_dim=16,
                               in_channels=8, out_channels=8,
                               axes_dims_rope=(8, 12, 12), quant=None)
    params = flux_controlnet_init_random(jax.random.key(0), cfg)
    w = ComfyUIFluxControlnetForwardWrapper(params, cfg)
    x = _t((1, 2, 8, 8), 1)
    out = w(x, hint=_t((1, 2, 8, 8), 2), timesteps=torch.tensor([0.4]),
            context=_t((1, 5, 24), 3), y=_t((1, 16), 4))
    assert "input" in out and len(out["input"]) == cfg.num_layers
    assert all(isinstance(o, torch.Tensor) for o in out["input"])


def test_host_step_cache_new_run_detection():
    """begin() resets on every detectable new-run signature: backward step,
    forward jump > 1, changed schedule length. Within a run, repeats pick
    slot 1 (all later cond chunks) and slot 0 stays the positive stream."""
    from fastdm_tpu.caching.config import DiCacheConfig
    from fastdm_tpu.comfyui_entry import HostStepCache

    cfg = DiCacheConfig(cache_algorithm="dicache", enable_caching=True,
                        threshold=0.2, probe_depth=1, ret_ratio=0.2)
    c = HostStepCache(cfg)
    assert c.begin(0, 10) == 0
    c.states[0] = {"skips": jnp.int32(3)}
    assert c.begin(0, 10) == 1          # CFG second forward, same step
    c.states[1] = {"skips": jnp.int32(2)}
    assert c.begin(0, 10) == 1          # third cond chunk stays in slot 1
    assert c.begin(1, 10) == 0          # next step -> positive slot
    assert c.states[0] is not None      # still the same run: state kept

    # forward jump (new run with denoise<1 starting past the old last step)
    assert c.begin(5, 10) == 0
    assert c.states[0] is None and c.states[1] is None

    c.states[0] = {"skips": jnp.int32(1)}
    # same step index but a different schedule length -> new run
    assert c.begin(6, 25) == 0
    assert c.states[0] is None

    c.states[0] = {"skips": jnp.int32(1)}
    # backward move -> new run (the round-2 behavior, still covered)
    assert c.begin(2, 25) == 0
    assert c.states[0] is None


def test_host_step_cache_cond_or_uncond_marker():
    """ComfyUI's cond execution order is NOT guaranteed: when the sampler
    labels the call via transformer_options['cond_or_uncond'], that label
    must pick the slot — an uncond-first step must not steal the positive
    slot from the skip-driving conditioned trajectory (ADVICE r3). The chunk
    heuristic remains the unlabeled fallback."""
    import torch

    from fastdm_tpu.caching.config import DiCacheConfig
    from fastdm_tpu.comfyui_entry import HostStepCache

    cfg = DiCacheConfig(cache_algorithm="dicache", enable_caching=True,
                        threshold=0.2, probe_depth=1, ret_ratio=0.2)
    c = HostStepCache(cfg)

    # marker extraction: list ints, torch scalars, mixed batch, junk
    m = HostStepCache.marker_from_options
    assert m({"cond_or_uncond": [0]}) == 0
    assert m({"cond_or_uncond": [1]}) == 1
    assert m({"cond_or_uncond": [torch.tensor(1)]}) == 1
    assert m({"cond_or_uncond": [0, 1]}) == 0   # batched: positive drives
    assert m({"cond_or_uncond": [1, 0]}) == 0
    assert m({}) is None
    assert m({"cond_or_uncond": []}) is None
    assert m({"cond_or_uncond": ["x"]}) is None
    assert m({"cond_or_uncond": [2]}) is None   # unrecognised labels ignored

    # uncond runs FIRST at step 0: must land in slot 1, and the following
    # cond call (same step, chunk 1) must still get the positive slot 0
    assert c.begin(0, 10, marker=1) == 1
    assert c.begin(0, 10, marker=0) == 0
    assert c.begin(1, 10, marker=1) == 1
    assert c.begin(1, 10, marker=0) == 0
    # unlabeled call falls back to the chunk heuristic (3rd chunk -> slot 1)
    assert c.begin(1, 10) == 1
    # new-run detection still applies with markers
    c.states[0] = {"skips": jnp.int32(1)}
    assert c.begin(0, 10, marker=1) == 1
    assert c.states[0] is None


def test_sdxl_wrapper_ip_adapter_sigma_gated():
    """ComfyUI IPAdapter attn2 patch: embeds routed by cond_or_uncond and
    gated on sigma in [sigma_end, sigma_start]; outside the window the
    forward must equal the no-patch forward (ref: fastdm/comfyui_entry.py
    47-101 + fastdm/layer/unetblock.py:70-127)."""
    from fastdm_tpu.comfyui_entry import ComfyUISDXLForwardWrapper
    from fastdm_tpu.models.sdxl import SDXLConfig, sdxl_init_random

    cfg = SDXLConfig(block_channels=(8, 16, 32), cross_attention_dim=16,
                     attn_layers=(0, 1, 2), head_dim=8,
                     addition_time_embed_dim=4, time_embed_dim=16,
                     add_embedding_in_dim=8 + 6 * 4, norm_groups=4, quant=None,
                     ip_adapter=True)
    params = sdxl_init_random(jax.random.key(1), cfg)
    w = ComfyUISDXLForwardWrapper(params, cfg)
    x = _t((2, 4, 16, 16), 1)
    y = _t((2, 8 + 24), 4)
    ctx = _t((2, 6, 16), 3)
    t = torch.tensor([500.0, 500.0])

    class _Patch:
        kwargs = [{
            "cond": _t((1, 4, 16), 5),
            "uncond": _t((1, 4, 16), 6),
            "weight": 0.8, "sigma_start": 999.0, "sigma_end": 1.0,
        }]

    base = {"patches_replace": {"attn2": {("input", 4, 0): _Patch()}},
            "cond_or_uncond": [0, 1]}
    opts_in = dict(base, sigmas=torch.tensor([10.0]))     # inside window
    opts_out = dict(base, sigmas=torch.tensor([0.5]))     # below sigma_end
    out_ip = w(x, timesteps=t, context=ctx, y=y, transformer_options=opts_in)
    out_gated = w(x, timesteps=t, context=ctx, y=y, transformer_options=opts_out)
    out_plain = w(x, timesteps=t, context=ctx, y=y)
    assert torch.isfinite(out_ip).all()
    # gated-out == no patch at all; in-window differs
    assert torch.equal(out_gated, out_plain)
    assert (out_ip - out_plain).abs().max().item() > 1e-5
    # cond/uncond routing: flipping the marker order changes the halves
    opts_flip = dict(base, sigmas=torch.tensor([10.0]),
                     cond_or_uncond=[1, 0])
    out_flip = w(x, timesteps=t, context=ctx, y=y, transformer_options=opts_flip)
    assert (out_flip - out_ip).abs().max().item() > 1e-6
