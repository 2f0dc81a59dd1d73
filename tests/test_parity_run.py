"""Smoke test for the real-checkpoint parity harness
(examples/evaluation/parity_run.py) on synthetic weights: every stage —
multi-config engine builds, seeded generation, PSNR/fidelity table, report
JSON — runs end to end, so the harness is one command away the moment real
checkpoints are reachable (ref: examples/evaluation/README.md workflow)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples",
                                "evaluation"))


def test_parity_run_synthetic_flux(tmp_path, monkeypatch):
    import jax.numpy as jnp

    import fastdm_tpu.engine as engine_mod
    from fastdm_tpu.pipeline.vae import VAEConfig
    from test_engine_e2e import TINY, _flux_transformer_sd, _vae_sd, _write_st

    import parity_run

    rng = np.random.default_rng(0)
    root = str(tmp_path / "flux-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _flux_transformer_sd(rng))
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(TINY, f)
    _write_st(os.path.join(root, "vae", "model.safetensors"), _vae_sd(rng))
    monkeypatch.setitem(
        engine_mod.VAE_CONFIGS, "flux",
        VAEConfig(latent_channels=4, block_out_channels=(8, 8, 8, 8),
                  layers_per_block=1, norm_num_groups=4,
                  scaling_factor=0.5, shift_factor=0.0))

    class _FakeTE:
        def encode(self, prompt, n=1):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return (
                jnp.asarray(r.standard_normal(
                    (1, 12, TINY["joint_attention_dim"])), jnp.bfloat16),
                jnp.asarray(r.standard_normal(
                    (1, TINY["pooled_projection_dim"])), jnp.bfloat16),
            )

    ns = type("NS", (), {})()
    ns.model_path = root
    ns.architecture = "flux"
    ns.prompts = None
    ns.num_prompts = 1
    ns.configs = "bf16,int8,int8+cache"
    ns.cache_config = None
    ns.height = 64
    ns.width = 64
    ns.steps = 2
    ns.num_frames = 5
    ns.seed = 7
    ns.save_dir = str(tmp_path / "out")
    ns.reference_dir = None
    ns.clip_path = "openai/clip-vit-large-patch14"
    ns.skip_clip = True
    report = parity_run.run_parity(
        ns, post_init=lambda eng: setattr(eng, "text_encoder", _FakeTE()))

    assert set(report["configs"]) == {"bf16", "int8", "int8+cache"}
    for name in ("int8", "int8+cache"):
        entry = report["configs"][name]
        assert "psnr_vs_bf16" in entry and entry["psnr_vs_bf16"] > 5.0
        assert entry["seconds_per_image"] > 0
    # saved artifacts per config
    assert os.path.isdir(os.path.join(ns.save_dir, "int8_cache"))
    # int8 quantization error is small but NOT zero (a zero diff would mean
    # the configs silently shared an engine)
    assert report["configs"]["int8"]["max_abs_diff_vs_bf16"] > 0


def test_parity_run_reference_dir_metric(tmp_path, monkeypatch):
    """PSNR vs a directory of reference-generated pngs ({i}.png) is wired."""
    pytest.importorskip("PIL")
    from PIL import Image

    import parity_run

    ref = tmp_path / "refs"
    ref.mkdir()
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (16, 16, 3), np.uint8)
    Image.fromarray(img).save(ref / "0.png")
    # direct metric check (run_parity integration covered above)
    assert parity_run.psnr(img, img) == float("inf")
    noisy = np.clip(img.astype(int) + rng.integers(-3, 3, img.shape), 0,
                    255).astype(np.uint8)
    p = parity_run.psnr(img, noisy)
    assert 35.0 < p < 60.0


def test_check_index_flux_roundtrip(tmp_path):
    """--check-index: a synthetic flux checkpoint's key list must diff clean
    against the loader's expected set; a renamed key must be flagged both
    ways (missing + unexpected)."""
    from test_engine_e2e import TINY, _flux_transformer_sd, _write_st

    import parity_run

    rng = np.random.default_rng(0)
    root = str(tmp_path / "flux-tiny")
    sd = _flux_transformer_sd(rng)
    _write_st(os.path.join(root, "transformer", "model.safetensors"), sd)
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(TINY, f)

    rep = parity_run.check_index(root, "flux")
    assert rep["ok"], (rep["missing_in_checkpoint"][:5],
                       rep["unexpected_in_checkpoint"][:5])
    assert rep["checkpoint_keys"] == rep["expected_keys"] == len(sd)

    # corrupt one key name -> flagged in both directions
    bad = dict(sd)
    bad["x_embedder.weight_TYPO"] = bad.pop("x_embedder.weight")
    root2 = str(tmp_path / "flux-bad")
    _write_st(os.path.join(root2, "transformer", "model.safetensors"), bad)
    with open(os.path.join(root2, "transformer", "config.json"), "w") as f:
        json.dump(TINY, f)
    rep2 = parity_run.check_index(root2, "flux")
    assert not rep2["ok"]
    assert rep2["missing_in_checkpoint"] == ["x_embedder.weight"]
    assert rep2["unexpected_in_checkpoint"] == ["x_embedder.weight_TYPO"]


def test_check_index_prefers_index_json(tmp_path):
    """A sharded checkpoint's *.safetensors.index.json weight_map is enough —
    no tensor bytes needed (the Kontext/Krea/Edit pre-download check)."""
    from test_golden_wan import TINY as WAN_TINY, _state_dict as _wan_sd

    import parity_run

    rng = np.random.default_rng(0)
    sd = _wan_sd(rng)
    root = str(tmp_path / "wan-tiny")
    os.makedirs(os.path.join(root, "transformer"))
    index = {"weight_map": {k: "diffusion_pytorch_model-00001-of-00001.safetensors"
                            for k in sd}}
    with open(os.path.join(root, "transformer",
                           "diffusion_pytorch_model.safetensors.index.json"),
              "w") as f:
        json.dump(index, f)
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump({"num_layers": WAN_TINY["num_layers"]}, f)
    rep = parity_run.check_index(root, "wan2.2-t2v")
    assert rep["ok"], (rep["missing_in_checkpoint"][:5],
                       rep["unexpected_in_checkpoint"][:5])
    assert "index.json" in rep["source"]


def test_check_index_sdxl_and_controlnets(tmp_path):
    """--check-index round-trips for the heavy name-map loaders added in
    round 4 (VERDICT r3 item 6): sdxl UNet, sdxl ControlNet, flux ControlNet.
    The expected sets come from the same synthetic generators the engine e2e
    tests load, at tiny dims (key NAMES depend only on counts/flags)."""
    from test_engine_e2e import _flux_cn_sd, _sdxl_sd, _write_st
    from test_golden_flux import TINY as FLUX_TINY

    import parity_run

    rng = np.random.default_rng(0)

    # sdxl UNet (subdir 'unet', transformer_layers_per_block drives counts)
    root = str(tmp_path / "sdxl")
    sd = _sdxl_sd(rng, n1=1, n2=2)
    _write_st(os.path.join(root, "unet", "model.safetensors"), sd)
    with open(os.path.join(root, "unet", "config.json"), "w") as f:
        json.dump({"transformer_layers_per_block": [1, 1, 2]}, f)
    rep = parity_run.check_index(root, "sdxl")
    assert rep["ok"], (rep["missing_in_checkpoint"][:5],
                       rep["unexpected_in_checkpoint"][:5])
    assert rep["checkpoint_keys"] == len(sd)

    # sdxl ControlNet (flat dir)
    cn = str(tmp_path / "sdxl-cn")
    sd_cn = _sdxl_sd(rng, n1=1, n2=2, cn=True)
    _write_st(os.path.join(cn, "model.safetensors"), sd_cn)
    with open(os.path.join(cn, "config.json"), "w") as f:
        json.dump({"transformer_layers_per_block": [1, 1, 2]}, f)
    rep = parity_run.check_index(cn, "sdxl-controlnet")
    assert rep["ok"], (rep["missing_in_checkpoint"][:5],
                       rep["unexpected_in_checkpoint"][:5])

    # flux ControlNet (num_mode -> union mode embedder)
    fcn = str(tmp_path / "flux-cn")
    sd_f = _flux_cn_sd(rng, FLUX_TINY, n_layers=2, n_single=1, union=True)
    _write_st(os.path.join(fcn, "model.safetensors"), sd_f)
    with open(os.path.join(fcn, "config.json"), "w") as f:
        json.dump({"num_layers": 2, "num_single_layers": 1, "num_mode": 10,
                   "guidance_embeds": True}, f)
    rep = parity_run.check_index(fcn, "flux-controlnet")
    assert rep["ok"], (rep["missing_in_checkpoint"][:5],
                       rep["unexpected_in_checkpoint"][:5])

    # a renamed CN key is flagged both ways
    bad = dict(sd_cn)
    bad["controlnet_mid_block_RENAMED.weight"] = bad.pop("controlnet_mid_block.weight")
    cn2 = str(tmp_path / "sdxl-cn-bad")
    _write_st(os.path.join(cn2, "model.safetensors"), bad)
    with open(os.path.join(cn2, "config.json"), "w") as f:
        json.dump({"transformer_layers_per_block": [1, 1, 2]}, f)
    rep = parity_run.check_index(cn2, "sdxl-controlnet")
    assert not rep["ok"]
    assert rep["missing_in_checkpoint"] == ["controlnet_mid_block.weight"]


def test_sdxl_cn_generator_matches_loader():
    """The synthetic SDXL-CN layout is EXACTLY what sdxl_controlnet_load
    consumes (assert_consumed passes, no missing keys) — the generator is a
    faithful stand-in for a real checkpoint's key map."""
    from test_engine_e2e import _sdxl_sd

    from fastdm_tpu.models.controlnets import sdxl_controlnet_load
    from fastdm_tpu.models.loader import TensorSource
    from fastdm_tpu.models.sdxl import SDXLConfig

    rng = np.random.default_rng(3)
    sd = _sdxl_sd(rng, n1=1, n2=2, cn=True)
    cfg = SDXLConfig(
        block_channels=(8, 16, 32), cross_attention_dim=16,
        attn_layers=(0, 1, 2), head_dim=8, addition_time_embed_dim=4,
        time_embed_dim=16, add_embedding_in_dim=8 + 6 * 4, norm_groups=4,
        quant="int8")
    params = sdxl_controlnet_load(TensorSource(sd), cfg)  # asserts consumed
    assert "controlnet_down_blocks" in params and "cond_embedding" in params


def test_check_index_ip_adapter_layouts(tmp_path):
    """--check-index for the official SDXL IP-Adapter layouts: plain
    ImageProjection and the Plus perceiver resampler (variant picked from
    the checkpoint's own keys; optional attention biases tolerated — the
    loader's src.linear claims them when present)."""
    from test_engine_e2e import _write_st

    import parity_run

    rng = np.random.default_rng(1)
    tlpb = {"transformer_layers_per_block": [1, 1, 2]}

    def proc_keys():
        sd, idx = {}, 0
        for nl, cnt in ((1, 2), (2, 2), (2, 3), (1, 3), (2, 1)):
            for _ in range(cnt):
                for _ in range(nl):
                    idx += 1
                    for n in ("to_k_ip", "to_v_ip"):
                        sd[f"ip_adapter.{idx}.{n}.weight"] = (
                            rng.standard_normal((8, 16)).astype(np.float32))
                    idx += 1
        return sd

    # plain
    sd = proc_keys()
    sd["image_proj.proj.weight"] = np.zeros((64, 24), np.float32)
    sd["image_proj.proj.bias"] = np.zeros((64,), np.float32)
    sd["image_proj.norm.weight"] = np.ones((16,), np.float32)
    sd["image_proj.norm.bias"] = np.zeros((16,), np.float32)
    d = str(tmp_path / "ip-plain")
    _write_st(os.path.join(d, "ip-adapter.safetensors"), sd)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(tlpb, f)
    rep = parity_run.check_index(d, "sdxl-ip-adapter")
    assert rep["ok"] and rep["image_proj_variant"] == "plain", rep

    # plus (depth 2, inferred from keys; to_q carries a bias -> tolerated)
    sd = proc_keys()
    sd["image_proj.latents"] = np.zeros((1, 4, 32), np.float32)
    for n in ("proj_in", "proj_out"):
        sd[f"image_proj.{n}.weight"] = np.zeros((32, 32), np.float32)
    sd["image_proj.norm_out.weight"] = np.ones((32,), np.float32)
    sd["image_proj.norm_out.bias"] = np.zeros((32,), np.float32)
    for i in range(2):
        p = f"image_proj.layers.{i}"
        for nm in ("0.norm1", "0.norm2", "1.0"):
            sd[f"{p}.{nm}.weight"] = np.ones((32,), np.float32)
            sd[f"{p}.{nm}.bias"] = np.zeros((32,), np.float32)
        for nm in ("0.to_q", "0.to_kv", "0.to_out", "1.1", "1.3"):
            sd[f"{p}.{nm}.weight"] = np.zeros((32, 32), np.float32)
        sd[f"{p}.0.to_q.bias"] = np.zeros((32,), np.float32)
    d = str(tmp_path / "ip-plus")
    _write_st(os.path.join(d, "ip-adapter.safetensors"), sd)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(tlpb, f)
    rep = parity_run.check_index(d, "sdxl-ip-adapter")
    assert rep["ok"] and rep["image_proj_variant"] == "plus", rep

    # a renamed processor key is still flagged
    sd.pop("ip_adapter.1.to_k_ip.weight")
    d = str(tmp_path / "ip-bad")
    _write_st(os.path.join(d, "ip-adapter.safetensors"), sd)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(tlpb, f)
    rep = parity_run.check_index(d, "sdxl-ip-adapter")
    assert not rep["ok"]
    assert rep["missing_in_checkpoint"] == ["ip_adapter.1.to_k_ip.weight"]
