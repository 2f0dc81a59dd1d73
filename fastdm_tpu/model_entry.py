"""Model factory (ref: fastdm/model_entry.py create_model / ModelWrapperFactory).

The reference wraps cores in fake-diffusers nn.Modules; here a model is just
(config, params, forward_fn) — `create_model` resolves the triple by
architecture name, loading + quantizing a checkpoint when given one, else
random weights (profiling). The engine (fastdm_tpu/engine.py) builds on the
same registry.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax


def _flux():
    from fastdm_tpu.models import flux as m

    return m.FluxConfig, m.flux_load, m.flux_init_random, m.flux_forward


def _sd35():
    from fastdm_tpu.models import sd35 as m

    return m.SD3Config, m.sd3_load, m.sd3_init_random, m.sd3_forward


def _sdxl():
    from fastdm_tpu.models import sdxl as m

    return m.SDXLConfig, m.sdxl_load, m.sdxl_init_random, m.sdxl_forward


def _qwen():
    from fastdm_tpu.models import qwenimage as m

    return m.QwenImageConfig, m.qwen_load, m.qwen_init_random, m.qwen_forward


def _wan():
    from fastdm_tpu.models import wan as m

    return m.WanConfig, m.wan_load, m.wan_init_random, m.wan_forward


def _sdxl_controlnet():
    from fastdm_tpu.models import controlnets as m
    from fastdm_tpu.models.sdxl import SDXLConfig

    return SDXLConfig, m.sdxl_controlnet_load, None, m.sdxl_controlnet_forward


def _flux_controlnet():
    from fastdm_tpu.models import controlnets as m

    return m.FluxControlNetConfig, m.flux_controlnet_load, None, m.flux_controlnet_forward


MODEL_REGISTRY: Dict[str, Callable] = {
    "flux": _flux, "flux-dev": _flux, "flux-krea": _flux, "flux-kontext": _flux,
    "sd35": _sd35, "sd3.5": _sd35,
    "sdxl": _sdxl,
    "qwen-image": _qwen, "qwen-image-edit": _qwen,
    "wan": _wan, "wan2.2-t2v": _wan, "wan2.2-i2v": _wan, "wan2.2-ti2v": _wan,
    "sdxl-controlnet": _sdxl_controlnet,
    "flux-controlnet": _flux_controlnet,
}


def create_model(
    architecture: str,
    ckpt_path: Optional[str] = None,
    quant: Optional[str] = "int8",
    seed: int = 0,
    **cfg_overrides: Any,
) -> Tuple[Any, Any, Callable]:
    """Returns (cfg, params, forward_fn) for the named architecture
    (ref: create_model, fastdm/model_entry.py:500)."""
    if architecture not in MODEL_REGISTRY:
        raise ValueError(
            f"unknown architecture {architecture!r}; have {sorted(MODEL_REGISTRY)}"
        )
    cfg_cls, load_fn, init_fn, forward_fn = MODEL_REGISTRY[architecture]()
    cfg = cfg_cls(quant=quant, **cfg_overrides)
    if ckpt_path is not None:
        from fastdm_tpu.models.loader import TensorSource

        params = load_fn(TensorSource.from_path(ckpt_path), cfg)
    else:
        if init_fn is None:
            raise ValueError(f"{architecture} requires a checkpoint")
        params = jax.jit(lambda k: init_fn(k, cfg))(jax.random.key(seed))
    return cfg, params, forward_fn
