"""ComfyUI loader nodes (ref: comfyui/nodes.py).

Register fastdm_tpu-backed models inside a ComfyUI install: each loader node
builds a quantized JAX core from a checkpoint file and wraps it in the
torch-facing forward wrapper. Requires a ComfyUI runtime (imports gated).
"""

from __future__ import annotations

import os


def _load_state_dict(ckpt_path):
    from fastdm_tpu.models.loader import TensorSource

    return TensorSource.from_path(ckpt_path)


def _build_cache(use_cache: bool, cache_threshold: float):
    """Node-level cache controls -> AutoCache, exactly the reference's DiCache
    construction (ref: comfyui/nodes.py:144-184 — dicache, probe depth 1,
    ret_ratio 0.2). Returns None when caching is off."""
    if not use_cache:
        return None
    from fastdm_tpu.caching.xcaching import AutoCache

    return AutoCache.from_dict({
        "cache_algorithm": "dicache",
        "enable_caching": True,
        "threshold": cache_threshold,
        "probe_depth": 1,
        "ret_ratio": 0.2,
    })


_CACHE_INPUTS = {
    "use_cache": ("BOOLEAN", {"default": False}),
    "cache_threshold": ("FLOAT", {"default": 0.2, "min": 0.0, "max": 1.0,
                                  "step": 0.01}),
}


class FastdmTpuFluxLoader:
    """(ref: FastdmFluxLoader, comfyui/nodes.py:154-217)"""

    @classmethod
    def INPUT_TYPES(cls):
        import folder_paths

        return {
            "required": {
                "ckpt_name": (folder_paths.get_filename_list("diffusion_models"),),
                "quant": (["int8", "fp8", "bf16"],),
                **_CACHE_INPUTS,
            }
        }

    RETURN_TYPES = ("MODEL",)
    FUNCTION = "load_model"
    CATEGORY = "fastdm_tpu"

    def load_model(self, ckpt_name, quant, use_cache=False, cache_threshold=0.2):
        import comfy.model_patcher
        import comfy.model_base
        import comfy.supported_models
        import folder_paths
        import torch

        from fastdm_tpu.comfyui_entry import ComfyUIFluxForwardWrapper
        from fastdm_tpu.models.flux import FluxConfig, flux_load

        ckpt_path = folder_paths.get_full_path("diffusion_models", ckpt_name)
        cfg = FluxConfig(quant=None if quant == "bf16" else quant,
                         quant_mods=quant != "bf16")
        params = flux_load(_load_state_dict(ckpt_path), cfg)

        model_conf = comfy.supported_models.Flux({})
        model = comfy.model_base.Flux(model_conf)
        model.diffusion_model = ComfyUIFluxForwardWrapper(
            params, cfg, cache=_build_cache(use_cache, cache_threshold))
        return (comfy.model_patcher.ModelPatcher(model, torch.device("cpu"),
                                                 torch.device("cpu")),)


class FastdmTpuSDXLLoader:
    @classmethod
    def INPUT_TYPES(cls):
        import folder_paths

        return {
            "required": {
                "ckpt_name": (folder_paths.get_filename_list("diffusion_models"),),
                "quant": (["int8", "fp8", "bf16"],),
            }
        }

    RETURN_TYPES = ("MODEL",)
    FUNCTION = "load_model"
    CATEGORY = "fastdm_tpu"

    def load_model(self, ckpt_name, quant):
        import comfy.model_patcher
        import comfy.model_base
        import comfy.supported_models
        import folder_paths
        import torch

        from fastdm_tpu.comfyui_entry import ComfyUISDXLForwardWrapper
        from fastdm_tpu.models.sdxl import SDXLConfig, sdxl_load

        ckpt_path = folder_paths.get_full_path("diffusion_models", ckpt_name)
        cfg = SDXLConfig(quant=None if quant == "bf16" else quant)
        params = sdxl_load(_load_state_dict(ckpt_path), cfg)
        model_conf = comfy.supported_models.SDXL({})
        model = comfy.model_base.SDXL(model_conf)
        model.diffusion_model = ComfyUISDXLForwardWrapper(params, cfg)
        return (comfy.model_patcher.ModelPatcher(model, torch.device("cpu"),
                                                 torch.device("cpu")),)


class FastdmTpuSD35Loader:
    """(ref: FastdmSD35Loader, comfyui/nodes.py:260-328)"""

    @classmethod
    def INPUT_TYPES(cls):
        import folder_paths

        return {
            "required": {
                "ckpt_name": (folder_paths.get_filename_list("diffusion_models"),),
                "quant": (["int8", "fp8", "bf16"],),
                **_CACHE_INPUTS,
            }
        }

    RETURN_TYPES = ("MODEL",)
    FUNCTION = "load_model"
    CATEGORY = "fastdm_tpu"

    def load_model(self, ckpt_name, quant, use_cache=False, cache_threshold=0.2):
        import comfy.model_base
        import comfy.model_patcher
        import comfy.supported_models
        import folder_paths
        import torch

        from fastdm_tpu.comfyui_entry import ComfyUISD3ForwardWrapper
        from fastdm_tpu.models.sd35 import SD3Config, sd3_load

        ckpt_path = folder_paths.get_full_path("diffusion_models", ckpt_name)
        cfg = SD3Config(quant=None if quant == "bf16" else quant)
        params = sd3_load(_load_state_dict(ckpt_path), cfg)
        model_conf = comfy.supported_models.SD3({})
        model = comfy.model_base.SD3(model_conf)
        model.diffusion_model = ComfyUISD3ForwardWrapper(
            params, cfg, cache=_build_cache(use_cache, cache_threshold))
        return (comfy.model_patcher.ModelPatcher(model, torch.device("cpu"),
                                                 torch.device("cpu")),)


class FastdmTpuQwenImageLoader:
    """(ref: FastdmQwenImageLoader, comfyui/nodes.py:330-398)"""

    @classmethod
    def INPUT_TYPES(cls):
        import folder_paths

        return {
            "required": {
                "ckpt_name": (folder_paths.get_filename_list("diffusion_models"),),
                "quant": (["int8", "fp8", "bf16"],),
                **_CACHE_INPUTS,
            }
        }

    RETURN_TYPES = ("MODEL",)
    FUNCTION = "load_model"
    CATEGORY = "fastdm_tpu"

    def load_model(self, ckpt_name, quant, use_cache=False, cache_threshold=0.2):
        import comfy.model_base
        import comfy.model_patcher
        import comfy.supported_models
        import folder_paths
        import torch

        from fastdm_tpu.comfyui_entry import ComfyUIQwenForwardWrapper
        from fastdm_tpu.models.qwenimage import QwenImageConfig, qwen_load

        ckpt_path = folder_paths.get_full_path("diffusion_models", ckpt_name)
        cfg = QwenImageConfig(quant=None if quant == "bf16" else quant,
                              quant_mods=quant != "bf16")
        params = qwen_load(_load_state_dict(ckpt_path), cfg)
        model_conf = comfy.supported_models.QwenImage({})
        model = comfy.model_base.QwenImage(model_conf)
        model.diffusion_model = ComfyUIQwenForwardWrapper(
            params, cfg, cache=_build_cache(use_cache, cache_threshold))
        return (comfy.model_patcher.ModelPatcher(model, torch.device("cpu"),
                                                 torch.device("cpu")),)


class FastdmTpuSDXLControlnetLoader:
    """(ref: FastdmSDXLContolnetLoader, comfyui/nodes.py:96-129)"""

    @classmethod
    def INPUT_TYPES(cls):
        import folder_paths

        return {
            "required": {
                "controlnet_name": (folder_paths.get_filename_list("controlnet"),),
                "quant": (["int8", "fp8", "bf16"],),
            }
        }

    RETURN_TYPES = ("CONTROL_NET",)
    FUNCTION = "load_model"
    CATEGORY = "fastdm_tpu"

    def load_model(self, controlnet_name, quant):
        import folder_paths
        import torch
        from comfy.controlnet import ControlNet

        from fastdm_tpu.comfyui_entry import ComfyUISDXLControlnetForwardWrapper
        from fastdm_tpu.models.controlnets import sdxl_controlnet_load
        from fastdm_tpu.models.sdxl import SDXLConfig

        ckpt_path = folder_paths.get_full_path("controlnet", controlnet_name)
        cfg = SDXLConfig(quant=None if quant == "bf16" else quant)
        params = sdxl_controlnet_load(_load_state_dict(ckpt_path), cfg)
        wrapper = ComfyUISDXLControlnetForwardWrapper(params, cfg)
        return (ControlNet(control_model=wrapper, global_average_pooling=False,
                           load_device=torch.device("cpu"), manual_cast_dtype=None),)


class FastdmTpuFluxControlnetLoader:
    """(ref: FastdmFLuxControlnetLoader, comfyui/nodes.py:219-258)"""

    @classmethod
    def INPUT_TYPES(cls):
        import folder_paths

        return {
            "required": {
                "controlnet_name": (folder_paths.get_filename_list("controlnet"),),
                "quant": (["int8", "fp8", "bf16"],),
            }
        }

    RETURN_TYPES = ("CONTROL_NET",)
    FUNCTION = "load_model"
    CATEGORY = "fastdm_tpu"

    def load_model(self, controlnet_name, quant):
        import comfy.latent_formats
        import folder_paths
        import torch
        from comfy.controlnet import ControlNet

        from fastdm_tpu.comfyui_entry import ComfyUIFluxControlnetForwardWrapper
        from fastdm_tpu.models.controlnets import (
            FluxControlNetConfig, flux_controlnet_load,
        )

        ckpt_path = folder_paths.get_full_path("controlnet", controlnet_name)
        cfg = FluxControlNetConfig(quant=None if quant == "bf16" else quant,
                                   guidance_embeds=True)
        params = flux_controlnet_load(_load_state_dict(ckpt_path), cfg)
        wrapper = ComfyUIFluxControlnetForwardWrapper(params, cfg)
        return (ControlNet(wrapper, compression_ratio=1,
                           latent_format=comfy.latent_formats.Flux(),
                           concat_mask=False, load_device=torch.device("cpu"),
                           manual_cast_dtype=None, extra_conds=["y", "guidance"]),)


NODE_CLASS_MAPPINGS = {
    "FastdmTpuFluxLoader": FastdmTpuFluxLoader,
    "FastdmTpuSDXLLoader": FastdmTpuSDXLLoader,
    "FastdmTpuSD35Loader": FastdmTpuSD35Loader,
    "FastdmTpuQwenImageLoader": FastdmTpuQwenImageLoader,
    "FastdmTpuSDXLControlnetLoader": FastdmTpuSDXLControlnetLoader,
    "FastdmTpuFluxControlnetLoader": FastdmTpuFluxControlnetLoader,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "FastdmTpuFluxLoader": "FastDM-TPU Flux Loader",
    "FastdmTpuSDXLLoader": "FastDM-TPU SDXL Loader",
    "FastdmTpuSD35Loader": "FastDM-TPU SD3.5 Loader",
    "FastdmTpuQwenImageLoader": "FastDM-TPU Qwen-Image Loader",
    "FastdmTpuSDXLControlnetLoader": "FastDM-TPU SDXL ControlNet Loader",
    "FastdmTpuFluxControlnetLoader": "FastDM-TPU Flux ControlNet Loader",
}
