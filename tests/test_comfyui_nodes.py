"""ComfyUI loader-node tests against a stubbed ComfyUI runtime.

The nodes defer every ComfyUI import to call time; stubbing folder_paths and
the comfy.* modules lets load_model run for real — synthetic checkpoint ->
quantized core -> forward wrapper -> ModelPatcher — which is exactly the
wiring a live ComfyUI exercises (and what caught the missing
comfy.supported_models import).
"""

import json
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


class _Patcher:
    def __init__(self, model, load_device, offload_device):
        self.model = model
        self.load_device = load_device
        self.offload_device = offload_device


def _install_comfy_stubs(monkeypatch, ckpt_dir):
    def mk(name):
        m = types.ModuleType(name)
        monkeypatch.setitem(sys.modules, name, m)
        return m

    fp = mk("folder_paths")
    fp.get_filename_list = lambda kind: sorted(os.listdir(ckpt_dir))
    fp.get_full_path = lambda kind, name: os.path.join(ckpt_dir, name)

    comfy = mk("comfy")
    mp = mk("comfy.model_patcher")
    mp.ModelPatcher = _Patcher
    mb = mk("comfy.model_base")
    sm = mk("comfy.supported_models")
    for arch in ("Flux", "SDXL", "SD3", "QwenImage"):
        setattr(sm, arch, lambda cfg, _a=arch: {"arch": _a, **cfg})
        setattr(mb, arch, type(arch, (), {"__init__": lambda self, conf: setattr(self, "model_config", conf)}))
    comfy.model_patcher, comfy.model_base, comfy.supported_models = mp, mb, sm
    lf = mk("comfy.latent_formats")
    lf.SDXL = lf.Flux = type("LF", (), {})
    cn = mk("comfy.controlnet")
    cn.ControlNet = lambda *a, **k: {"control_model": a[0] if a else k.get("control_model")}
    comfy.latent_formats, comfy.controlnet = lf, cn


def test_flux_loader_builds_patcher(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.dirname(__file__))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "comfyui"))
    from test_engine_e2e import _write_st
    from test_golden_flux import _synthetic_state_dict

    tiny = dict(
        num_layers=1, num_single_layers=1, attention_head_dim=32,
        num_attention_heads=2, joint_attention_dim=24,
        pooled_projection_dim=16, in_channels=8, out_channels=8,
        axes_dims_rope=(8, 12, 12), guidance_embeds=True, patch_size=1,
    )
    rng = np.random.default_rng(0)
    ckpt = str(tmp_path / "flux.safetensors")
    _write_st(ckpt, _synthetic_state_dict(tiny, rng))
    _install_comfy_stubs(monkeypatch, str(tmp_path))

    # the node builds the full-size FluxConfig; steer it to the tiny dims
    import fastdm_tpu.models.flux as flux_mod

    real_cfg = flux_mod.FluxConfig
    monkeypatch.setattr(
        flux_mod, "FluxConfig",
        lambda quant=None, quant_mods=False, **kw: real_cfg(
            quant=quant, **{k: v for k, v in tiny.items()}),
    )
    import nodes as tpu_nodes

    (patcher,) = tpu_nodes.FastdmTpuFluxLoader().load_model(
        "flux.safetensors", "int8")
    assert isinstance(patcher, _Patcher)
    wrapper = patcher.model.diffusion_model

    # drive the wrapped model the way ComfyUI's sampler does
    x = torch.from_numpy(rng.standard_normal((1, 2, 8, 8)).astype(np.float32))
    out = wrapper(
        x, timestep=torch.tensor([0.5]),
        context=torch.from_numpy(rng.standard_normal((1, 5, 24)).astype(np.float32)),
        y=torch.from_numpy(rng.standard_normal((1, 16)).astype(np.float32)),
    )
    assert out.shape == x.shape and torch.isfinite(out).all()
    # int8 quantization took place at load
    import jax.numpy as jnp

    assert wrapper.params["dual_blocks"]["attn"]["qkv"]["w"].dtype == jnp.int8


def test_node_mappings_complete(tmp_path, monkeypatch):
    _install_comfy_stubs(monkeypatch, str(tmp_path))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "comfyui"))
    import nodes as tpu_nodes

    assert set(tpu_nodes.NODE_CLASS_MAPPINGS) == set(
        tpu_nodes.NODE_DISPLAY_NAME_MAPPINGS)
    for name, cls in tpu_nodes.NODE_CLASS_MAPPINGS.items():
        assert cls.FUNCTION == "load_model"
        assert cls.RETURN_TYPES in (("MODEL",), ("CONTROL_NET",))
        spec = cls.INPUT_TYPES()
        assert "required" in spec and "quant" in spec["required"]
