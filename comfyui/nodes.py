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


class FastdmTpuFluxLoader:
    """(ref: FastdmFluxLoader, comfyui/nodes.py:154-217)"""

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
        model.diffusion_model = ComfyUIFluxForwardWrapper(params, cfg)
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


NODE_CLASS_MAPPINGS = {
    "FastdmTpuFluxLoader": FastdmTpuFluxLoader,
    "FastdmTpuSDXLLoader": FastdmTpuSDXLLoader,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "FastdmTpuFluxLoader": "FastDM-TPU Flux Loader",
    "FastdmTpuSDXLLoader": "FastDM-TPU SDXL Loader",
}
