"""End-to-end FastDMEngine drive on a synthetic FLUX checkpoint directory:
ctor (config.json overrides -> loader -> VAE) + generate() with precomputed
embeddings (text encoders stay lazy/unloaded)."""

import json
import os

import numpy as np
import pytest


def _write_st(path, sd):
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_file(sd, path)


TINY = dict(
    num_layers=2, num_single_layers=2, attention_head_dim=32,
    num_attention_heads=4, joint_attention_dim=64, pooled_projection_dim=48,
    in_channels=16, out_channels=16, axes_dims_rope=(8, 12, 12),
    guidance_embeds=True, patch_size=1,
)


def _flux_transformer_sd(rng):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_flux import _synthetic_state_dict

    return _synthetic_state_dict(TINY, rng)


def _vae_sd(rng, latent_channels=4, chans=(8, 8, 8, 8), layers=1, groups=4):
    sd = {}

    def conv(name, cin, cout, k=3):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def lin(name, cin, cout):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = np.ones((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)

    def resnet(name, cin, cout):
        norm(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cin, cout)
        norm(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            conv(f"{name}.conv_shortcut", cin, cout, k=1)

    rev = list(reversed(chans))
    top = rev[0]
    conv("decoder.conv_in", latent_channels, top)
    resnet("decoder.mid_block.resnets.0", top, top)
    resnet("decoder.mid_block.resnets.1", top, top)
    norm("decoder.mid_block.attentions.0.group_norm", top)
    for n in ("to_q", "to_k", "to_v", "to_out.0"):
        lin(f"decoder.mid_block.attentions.0.{n}", top, top)
    prev = top
    for i, c in enumerate(rev):
        for r in range(layers + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{r}", prev if r == 0 else c, c)
        if i < len(rev) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c)
        prev = c
    norm("decoder.conv_norm_out", rev[-1])
    conv("decoder.conv_out", rev[-1], 3)
    conv("post_quant_conv", latent_channels, latent_channels, k=1)
    # encoder (i2i / edit paths)
    conv("encoder.conv_in", 3, chans[0])
    prev = chans[0]
    for i, c in enumerate(chans):
        for r in range(layers):
            resnet(f"encoder.down_blocks.{i}.resnets.{r}", prev if r == 0 else c, c)
        if i < len(chans) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c)
        prev = c
    resnet("encoder.mid_block.resnets.0", prev, prev)
    resnet("encoder.mid_block.resnets.1", prev, prev)
    norm("encoder.mid_block.attentions.0.group_norm", prev)
    for n in ("to_q", "to_k", "to_v", "to_out.0"):
        lin(f"encoder.mid_block.attentions.0.{n}", prev, prev)
    norm("encoder.conv_norm_out", prev)
    conv("encoder.conv_out", prev, 2 * latent_channels)
    conv("quant_conv", 2 * latent_channels, 2 * latent_channels, k=1)
    return sd


def test_flux_engine_end_to_end(tmp_path, monkeypatch):
    import jax.numpy as jnp

    import fastdm_tpu.engine as engine_mod
    from fastdm_tpu.engine import FastDMEngine
    from fastdm_tpu.pipeline.vae import VAEConfig

    rng = np.random.default_rng(0)
    root = str(tmp_path / "flux-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _flux_transformer_sd(rng))
    # checkpoint-variant hyperparams come from config.json (the new override
    # path): tiny dims + guidance_embeds
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(TINY, f)
    _write_st(os.path.join(root, "vae", "model.safetensors"), _vae_sd(rng))

    # tiny VAE config in place of the full-size FLUX one (4ch latents: the
    # packed 16-channel stream unpacks to 4 latent channels at 2x2)
    monkeypatch.setitem(
        engine_mod.VAE_CONFIGS, "flux",
        VAEConfig(latent_channels=4, block_out_channels=(8, 8, 8, 8),
                  layers_per_block=1, norm_num_groups=4,
                  scaling_factor=0.5, shift_factor=0.0),
    )

    eng = FastDMEngine(root, architecture="flux", use_int8=True, verbose=False,
                       cache_config={"cache_algorithm": "teacache",
                                     "enable_caching": True, "threshold": 0.3,
                                     "coefficients": [1.0, 0.0]})
    assert eng.cfg.num_layers == 2 and eng.cfg.guidance_embeds  # overrides took

    b, txt = 1, 12
    embeds = jnp.asarray(rng.standard_normal((b, txt, TINY["joint_attention_dim"])),
                         jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((b, TINY["pooled_projection_dim"])),
                         jnp.bfloat16)
    images = eng.generate(
        prompt_embeds=embeds, pooled_prompt_embeds=pooled,
        height=64, width=64, num_inference_steps=2, seed=1,
    )
    # 4-stage tiny VAE = real 8x scale: 64/16 tokens -> 8x8 latent -> 64x64
    assert images.shape == (1, 64, 64, 3) and images.dtype == np.uint8
    # cache skip counter surfaced through the engine
    assert 0 <= eng.last_cache_skips < 2


def test_sd35_engine_end_to_end(tmp_path, monkeypatch):
    import jax.numpy as jnp

    import fastdm_tpu.engine as engine_mod
    from fastdm_tpu.engine import FastDMEngine
    from fastdm_tpu.pipeline.vae import VAEConfig

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_sd35 import DUAL, TINY as SD35_TINY, _state_dict

    rng = np.random.default_rng(1)
    root = str(tmp_path / "sd35-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    cfg_json = dict(SD35_TINY)
    cfg_json["dual_attention_layers"] = list(DUAL)
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg_json, f)
    _write_st(os.path.join(root, "vae", "model.safetensors"),
              _vae_sd(rng, latent_channels=SD35_TINY["in_channels"]))

    monkeypatch.setitem(
        engine_mod.VAE_CONFIGS, "sd35",
        VAEConfig(latent_channels=SD35_TINY["in_channels"],
                  block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                  norm_num_groups=4, scaling_factor=1.0, shift_factor=0.0),
    )

    class _FakeTE:
        def encode(self, prompt, n=1):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return (
                jnp.asarray(r.standard_normal(
                    (1, 6, SD35_TINY["joint_attention_dim"])), jnp.bfloat16),
                jnp.asarray(r.standard_normal(
                    (1, SD35_TINY["pooled_projection_dim"])), jnp.bfloat16),
            )

    eng = FastDMEngine(root, architecture="sd35", use_int8=True, verbose=False)
    assert eng.cfg.num_dual_layers == len(DUAL)  # config.json override took
    eng.text_encoder = _FakeTE()
    images = eng.generate(prompt="a cat", negative_prompt="blurry",
                          height=64, width=64, num_inference_steps=2, seed=3)
    # 64/8 = 8x8 latent -> 4-stage tiny VAE 8x -> 64x64 pixels
    assert images.shape == (1, 64, 64, 3) and images.dtype == np.uint8

    # SDEdit img2img (VERDICT r4 #10): image engages the i2i path, output
    # well-formed and different from t2i at the same seed
    src = (np.random.default_rng(9).random((64, 64, 3)) * 255).astype(np.uint8)
    i2i = eng.generate(prompt="a cat", negative_prompt="blurry",
                       height=64, width=64, num_inference_steps=2, seed=3,
                       image=src, strength=0.5)
    assert i2i.shape == (1, 64, 64, 3)
    assert np.abs(i2i.astype(int) - images.astype(int)).max() > 0


def test_wan_engine_end_to_end_latent(tmp_path):
    """Wan t2v through the engine: config.json hyperparams, quantized load,
    CFG denoise loop, latent output (the Wan VAE loader is pending real
    checkpoints and the engine degrades to latents)."""
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_wan import TINY as WAN_TINY, _state_dict

    rng = np.random.default_rng(2)
    root = str(tmp_path / "wan-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    cfg_json = dict(WAN_TINY)
    cfg_json["patch_size"] = [1, 2, 2]
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg_json, f)

    class _FakeTE:
        def encode(self, prompt):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 8, WAN_TINY["text_dim"])), jnp.bfloat16)

    eng = FastDMEngine(root, architecture="wan2.2-t2v", use_int8=True, verbose=False)
    assert eng.vae_params is None  # wan VAE pending -> degraded mode
    eng.text_encoder = _FakeTE()
    eng.cfg = __import__("dataclasses").replace(eng.cfg, text_len=8)
    lat = eng.generate(prompt="a river", negative_prompt="static",
                       height=32, width=32, num_frames=5,
                       num_inference_steps=2, output_type="latent", seed=4)
    # lf = (5-1)/4+1 = 2 latent frames; 32/8 = 4x4 spatial
    assert lat.shape == (1, WAN_TINY["in_channels"], 2, 4, 4)
    assert np.isfinite(lat).all()

    # i2v without a VAE: clear error, not a crash in the encode path
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="Wan VAE"):
        eng._wan_i2v_latents(np.zeros((32, 32, 3), np.uint8), 2, 4, 4, 5)


def test_wan_engine_i2v_cond_path(tmp_path, monkeypatch):
    """i2v wiring: conditioning channels concat into the model input each
    step (VAE encode stubbed — the Wan VAE loader is pending checkpoints)."""
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import test_golden_wan as gw

    i2v_tiny = dict(gw.TINY)
    i2v_tiny["in_channels"] = gw.TINY["out_channels"] + 4  # z + 4 cond ch
    rng = np.random.default_rng(3)
    monkeypatch.setattr(gw, "TINY", i2v_tiny)
    sd = gw._state_dict(rng)

    root = str(tmp_path / "wan-i2v-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"), sd)
    cfg_json = dict(i2v_tiny)
    cfg_json["patch_size"] = [1, 2, 2]
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg_json, f)

    eng = FastDMEngine(root, architecture="wan2.2-i2v", use_int8=True, verbose=False)

    class _FakeTE:
        def encode(self, prompt):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 8, i2v_tiny["text_dim"])), jnp.bfloat16)

    eng.text_encoder = _FakeTE()
    import dataclasses

    eng.cfg = dataclasses.replace(eng.cfg, text_len=8)
    # stub the VAE-encode-based conditioning (4 channels here)
    monkeypatch.setattr(
        eng, "_wan_i2v_latents",
        lambda image, lf, lh, lw, nf: jnp.ones((1, 4, lf, lh, lw), jnp.float32),
    )
    lat = eng.generate(prompt="a duck", negative_prompt="still", task="i2v",
                       image=np.zeros((32, 32, 3), np.uint8),
                       height=32, width=32, num_frames=5,
                       num_inference_steps=2, output_type="latent", seed=5)
    assert lat.shape == (1, i2v_tiny["out_channels"], 2, 4, 4)
    assert np.isfinite(lat).all()


def _tiny_flux_engine(tmp_path, monkeypatch, arch="flux"):
    import fastdm_tpu.engine as engine_mod
    from fastdm_tpu.engine import FastDMEngine
    from fastdm_tpu.pipeline.vae import VAEConfig

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
                  scaling_factor=0.5, shift_factor=0.0),
    )
    return FastDMEngine(root, architecture=arch, use_int8=True, verbose=False), rng


def test_flux_engine_i2i_and_kontext(tmp_path, monkeypatch):
    """SDEdit img2img + Kontext editing through the engine, incl. the VAE
    encoder path (full synthetic AutoencoderKL)."""
    import jax.numpy as jnp

    eng, rng = _tiny_flux_engine(tmp_path, monkeypatch, arch="flux-kontext")
    b, txt = 1, 12
    embeds = jnp.asarray(rng.standard_normal((b, txt, TINY["joint_attention_dim"])),
                         jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((b, TINY["pooled_projection_dim"])),
                         jnp.bfloat16)
    # tiny VAE downsamples 2x, engine tokens use /16: give it a 64x64 source
    src = (rng.random((64, 64, 3)) * 255).astype(np.uint8)

    # Kontext: reference tokens appended (flux-kontext arch + i2i)
    img = eng.generate(prompt_embeds=embeds, pooled_prompt_embeds=pooled,
                       task="i2i", image=src, num_inference_steps=2, seed=7)
    assert img.dtype == np.uint8 and img.shape[0] == 1

    # Kontext multi-reference: two differently-sized sources, each on its
    # own rope id-plane
    src2 = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    multi = eng.generate(prompt_embeds=embeds, pooled_prompt_embeds=pooled,
                         task="i2i", image=[src, src2],
                         num_inference_steps=2, seed=7)
    assert multi.shape == img.shape  # output sized from image[0]
    assert np.abs(multi.astype(int) - img.astype(int)).max() > 0

    # SDEdit i2i on the plain flux alias (same checkpoint)
    eng.architecture_full = "flux-dev"
    img2 = eng.generate(prompt_embeds=embeds, pooled_prompt_embeds=pooled,
                        task="i2i", image=src, strength=0.5,
                        num_inference_steps=2, seed=7)
    assert img2.dtype == np.uint8 and img2.shape[0] == 1


def test_qwen_engine_t2i_and_edit(tmp_path, monkeypatch):
    """Qwen-Image t2i + qwen-image-edit through the engine (true CFG, source
    tokens appended, VAE encoder path)."""
    import jax.numpy as jnp

    import fastdm_tpu.engine as engine_mod
    from fastdm_tpu.engine import FastDMEngine
    from fastdm_tpu.pipeline.vae import VAEConfig

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_qwen import TINY as Q_TINY, _state_dict

    rng = np.random.default_rng(4)
    root = str(tmp_path / "qwen-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    # engine requires in == patch^2 * out for the packed latent stream
    cfg_json = dict(Q_TINY)
    cfg_json["out_channels"] = Q_TINY["in_channels"] // 4
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg_json, f)
    lat_ch = Q_TINY["in_channels"] // 4
    _write_st(os.path.join(root, "vae", "model.safetensors"),
              _vae_sd(rng, latent_channels=lat_ch))
    monkeypatch.setitem(
        engine_mod.VAE_CONFIGS, "qwen",
        VAEConfig(latent_channels=lat_ch, block_out_channels=(8, 8, 8, 8),
                  layers_per_block=1, norm_num_groups=4,
                  scaling_factor=1.0, shift_factor=0.0),
    )

    class _FakeTE:
        def encode(self, prompt, n=1):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 6, Q_TINY["joint_attention_dim"])), jnp.bfloat16)

        def encode_with_image(self, prompt, image, n=1):
            imgs = image if isinstance(image, (list, tuple)) else [image]
            tot = sum(int(np.asarray(i).sum()) for i in imgs)
            r = np.random.default_rng((abs(hash(str(prompt))) + tot) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 6, Q_TINY["joint_attention_dim"])), jnp.bfloat16)

    eng = FastDMEngine(root, architecture="qwen-image-edit", use_int8=True,
                       verbose=False)
    eng.text_encoder = _FakeTE()

    img = eng.generate(prompt="a fox", negative_prompt="blurry",
                       height=64, width=64, num_inference_steps=2,
                       true_cfg_scale=3.0, seed=6)
    assert img.shape == (1, 64, 64, 3) and img.dtype == np.uint8

    src = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    edited = eng.generate(prompt="make it red", src_image=src,
                          num_inference_steps=2, true_cfg_scale=3.0, seed=6)
    assert edited.shape == (1, 64, 64, 3) and edited.dtype == np.uint8
    # different source -> different edit (tokens + VL conditioning both shift)
    edited2 = eng.generate(prompt="make it red", src_image=255 - src,
                           num_inference_steps=2, true_cfg_scale=3.0, seed=6)
    assert np.abs(edited.astype(int) - edited2.astype(int)).max() > 0

    # multi-image edit (EditPlus / api_server blend_mode="list"): a list of
    # differently-sized sources, each contributing its own token block +
    # rope frame entry
    src2 = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    multi = eng.generate(prompt="combine them", src_image=[src, src2],
                         num_inference_steps=2, true_cfg_scale=3.0, seed=6)
    assert multi.shape == (1, 64, 64, 3)  # output sized from image[0]
    assert np.abs(multi.astype(int) - edited.astype(int)).max() > 0


def _sdxl_sd(rng, c=(8, 16, 32), ctx=16, te=16, add_in=32, n1=1, n2=2,
             cn=False):
    """Synthetic diffusers SDXL UNet state dict at tiny dims. cn=True emits
    the SDXL ControlNet layout instead (same down/mid trunk, no up blocks,
    plus controlnet_cond_embedding / controlnet_down_blocks.{0..8} /
    controlnet_mid_block — exactly the keys sdxl_controlnet_load consumes)."""
    sd = {}

    def conv(name, cin, cout, k=3):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def lin(name, cin, cout, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin)).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def norm(name, ch):
        sd[f"{name}.weight"] = np.ones((ch,), np.float32)
        sd[f"{name}.bias"] = np.zeros((ch,), np.float32)

    def resnet(name, cin, cout):
        norm(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cin, cout)
        lin(f"{name}.time_emb_proj", te, cout)
        norm(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            conv(f"{name}.conv_shortcut", cin, cout, k=1)

    def t2d(name, ch, n_layers):
        norm(f"{name}.norm", ch)
        lin(f"{name}.proj_in", ch, ch)
        for j in range(n_layers):
            p = f"{name}.transformer_blocks.{j}"
            for nm in ("norm1", "norm2", "norm3"):
                norm(f"{p}.{nm}", ch)
            for nm in ("to_q", "to_k", "to_v"):
                lin(f"{p}.attn1.{nm}", ch, ch, bias=False)
            lin(f"{p}.attn1.to_out.0", ch, ch)
            lin(f"{p}.attn2.to_q", ch, ch, bias=False)
            for nm in ("to_k", "to_v"):
                lin(f"{p}.attn2.{nm}", ctx, ch, bias=False)
            lin(f"{p}.attn2.to_out.0", ch, ch)
            lin(f"{p}.ff.net.0.proj", ch, 8 * ch)
            lin(f"{p}.ff.net.2", 4 * ch, ch)
        lin(f"{name}.proj_out", ch, ch)

    c0, c1, c2 = c
    conv("conv_in", 4, c0)
    lin("time_embedding.linear_1", c0, te)
    lin("time_embedding.linear_2", te, te)
    lin("add_embedding.linear_1", add_in, te)
    lin("add_embedding.linear_2", te, te)
    resnet("down_blocks.0.resnets.0", c0, c0)
    resnet("down_blocks.0.resnets.1", c0, c0)
    conv("down_blocks.0.downsamplers.0.conv", c0, c0)
    for i, (cin, cc, nl) in (((1), (c0, c1, n1)), ((2), (c1, c2, n2))):
        resnet(f"down_blocks.{i}.resnets.0", cin, cc)
        resnet(f"down_blocks.{i}.resnets.1", cc, cc)
        t2d(f"down_blocks.{i}.attentions.0", cc, nl)
        t2d(f"down_blocks.{i}.attentions.1", cc, nl)
        if i == 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv", cc, cc)
    resnet("mid_block.resnets.0", c2, c2)
    resnet("mid_block.resnets.1", c2, c2)
    t2d("mid_block.attentions.0", c2, n2)
    if cn:
        # ControlNet heads (diffusers ControlNetModel; ref layout consumed
        # by fastdm_tpu/models/controlnets.py sdxl_controlnet_load)
        cond_c = (c0 // 2, c0 // 2, c0, c0, c1, c1)
        conv("controlnet_cond_embedding.conv_in", 3, c0 // 2)
        prev = c0 // 2
        for i, cc in enumerate(cond_c):
            conv(f"controlnet_cond_embedding.blocks.{i}", prev, cc)
            prev = cc
        conv("controlnet_cond_embedding.conv_out", prev, c0)
        for i, cc in enumerate((c0, c0, c0, c0, c1, c1, c1, c2, c2)):
            conv(f"controlnet_down_blocks.{i}", cc, cc, k=1)
        conv("controlnet_mid_block", c2, c2, k=1)
        return sd
    for j, cin in enumerate((c2 + c2, c2 + c2, c2 + c1)):
        resnet(f"up_blocks.0.resnets.{j}", cin, c2)
        t2d(f"up_blocks.0.attentions.{j}", c2, n2)
    conv("up_blocks.0.upsamplers.0.conv", c2, c2)
    for j, cin in enumerate((c2 + c1, c1 + c1, c1 + c0)):
        resnet(f"up_blocks.1.resnets.{j}", cin, c1)
        t2d(f"up_blocks.1.attentions.{j}", c1, n1)
    conv("up_blocks.1.upsamplers.0.conv", c1, c1)
    for j, cin in enumerate((c1 + c0, c0 + c0, c0 + c0)):
        resnet(f"up_blocks.2.resnets.{j}", cin, c0)
    norm("conv_norm_out", c0)
    conv("conv_out", c0, 4)
    return sd


def test_sdxl_engine_end_to_end(tmp_path, monkeypatch):
    import jax.numpy as jnp

    import fastdm_tpu.engine as engine_mod
    from fastdm_tpu.engine import FastDMEngine
    from fastdm_tpu.models.sdxl import SDXLConfig
    from fastdm_tpu.pipeline.vae import VAEConfig

    rng = np.random.default_rng(5)
    root = str(tmp_path / "sdxl-tiny")
    _write_st(os.path.join(root, "unet", "model.safetensors"), _sdxl_sd(rng))
    _write_st(os.path.join(root, "vae", "model.safetensors"),
              _vae_sd(rng, latent_channels=4))
    monkeypatch.setitem(
        engine_mod.VAE_CONFIGS, "sdxl",
        VAEConfig(latent_channels=4, block_out_channels=(8, 8, 8, 8),
                  layers_per_block=1, norm_num_groups=4,
                  scaling_factor=0.5, shift_factor=0.0),
    )

    # engine has no sdxl config.json path (diffusers UNets keep theirs in the
    # unet dir but our tiny dims need the dataclass); patch the default cfg
    tiny_cfg = SDXLConfig(
        block_channels=(8, 16, 32), cross_attention_dim=16, attn_layers=(0, 1, 2),
        head_dim=8, addition_time_embed_dim=4, time_embed_dim=16,
        add_embedding_in_dim=8 + 6 * 4, norm_groups=4, quant="int8",
    )
    monkeypatch.setattr(
        "fastdm_tpu.models.sdxl.SDXLConfig",
        lambda quant=None, **kw: tiny_cfg,
    )

    class _FakeTE:
        def encode(self, prompt, n=1):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return (jnp.asarray(r.standard_normal((1, 6, 16)), jnp.bfloat16),
                    jnp.asarray(r.standard_normal((1, 8)), jnp.bfloat16))

    eng = FastDMEngine(root, architecture="sdxl", use_int8=True, verbose=False)
    eng.text_encoder = _FakeTE()
    img = eng.generate(prompt="a boat", negative_prompt="fog",
                       height=64, width=64, num_inference_steps=2,
                       guidance_scale=5.0, seed=8)
    # 64/8 latent -> 4-stage VAE 8x -> 64x64
    assert img.shape == (1, 64, 64, 3) and img.dtype == np.uint8

    # SDEdit img2img (VERDICT r4 #10): z_image + noise*sigma[start]
    src = (np.random.default_rng(10).random((64, 64, 3)) * 255).astype(np.uint8)
    i2i = eng.generate(prompt="a boat", negative_prompt="fog",
                       height=64, width=64, num_inference_steps=2,
                       guidance_scale=5.0, seed=8, image=src, strength=0.5)
    assert i2i.shape == (1, 64, 64, 3)
    assert np.abs(i2i.astype(int) - img.astype(int)).max() > 0


def test_flux_engine_mesh_tp(tmp_path, monkeypatch):
    """mesh_shape TP-shards the engine weights over the virtual device mesh
    and generate() runs under GSPMD (conftest provides 8 CPU devices)."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 2:
        import pytest as _pytest

        _pytest.skip("needs multiple devices")

    import fastdm_tpu.engine as engine_mod
    from fastdm_tpu.engine import FastDMEngine
    from fastdm_tpu.pipeline.vae import VAEConfig

    rng = np.random.default_rng(0)
    root = str(tmp_path / "flux-tp")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _flux_transformer_sd(rng))
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(TINY, f)
    _write_st(os.path.join(root, "vae", "model.safetensors"), _vae_sd(rng))
    monkeypatch.setitem(
        engine_mod.VAE_CONFIGS, "flux",
        VAEConfig(latent_channels=4, block_out_channels=(8, 8, 8, 8),
                  layers_per_block=1, norm_num_groups=4,
                  scaling_factor=0.5, shift_factor=0.0),
    )
    eng = FastDMEngine(root, architecture="flux", use_int8=True, verbose=False,
                       mesh_shape=(1, 1, 2))
    assert eng.mesh is not None

    embeds = jnp.asarray(rng.standard_normal((1, 12, TINY["joint_attention_dim"])),
                         jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, TINY["pooled_projection_dim"])),
                         jnp.bfloat16)
    img = eng.generate(prompt_embeds=embeds, pooled_prompt_embeds=pooled,
                       height=64, width=64, num_inference_steps=2, seed=1)
    assert img.shape == (1, 64, 64, 3) and img.dtype == np.uint8

    # same weights unsharded -> numerically close (sharding is layout only)
    eng1 = FastDMEngine(root, architecture="flux", use_int8=True, verbose=False)
    img1 = eng1.generate(prompt_embeds=embeds, pooled_prompt_embeds=pooled,
                         height=64, width=64, num_inference_steps=2, seed=1)
    assert np.abs(img.astype(int) - img1.astype(int)).max() <= 5


def test_qwen_engine_mesh_tp(tmp_path, monkeypatch):
    """Qwen (the >16GB model that NEEDS TP on v5e) generates under a TP mesh
    with mod projections sharded; matches the unsharded run."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 2:
        import pytest as _pytest

        _pytest.skip("needs multiple devices")

    import fastdm_tpu.engine as engine_mod
    from fastdm_tpu.engine import FastDMEngine
    from fastdm_tpu.pipeline.vae import VAEConfig

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_qwen import TINY as Q_TINY, _state_dict

    rng = np.random.default_rng(6)
    root = str(tmp_path / "qwen-tp")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    cfg_json = dict(Q_TINY)
    cfg_json["out_channels"] = Q_TINY["in_channels"] // 4
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg_json, f)
    lat_ch = Q_TINY["in_channels"] // 4
    _write_st(os.path.join(root, "vae", "model.safetensors"),
              _vae_sd(rng, latent_channels=lat_ch))
    monkeypatch.setitem(
        engine_mod.VAE_CONFIGS, "qwen",
        VAEConfig(latent_channels=lat_ch, block_out_channels=(8, 8, 8, 8),
                  layers_per_block=1, norm_num_groups=4,
                  scaling_factor=1.0, shift_factor=0.0),
    )

    class _FakeTE:
        def encode(self, prompt, n=1):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 6, Q_TINY["joint_attention_dim"])), jnp.bfloat16)

    outs = {}
    for mesh in (None, (1, 1, 2)):
        eng = FastDMEngine(root, architecture="qwen-image", use_int8=True,
                           verbose=False, mesh_shape=mesh)
        eng.text_encoder = _FakeTE()
        if mesh is not None:
            spec = eng.params["blocks"]["img_mod"]["w"].sharding.spec
            assert "tp" in str(spec)  # mod projections sharded
        outs[mesh] = eng.generate(prompt="a fox", negative_prompt="x",
                                  height=64, width=64, num_inference_steps=2,
                                  true_cfg_scale=3.0, seed=6)
    # bf16 reduction-order differences under GSPMD can move individual uint8
    # pixels several counts (observed up to ~6 depending on process history);
    # pin semantics with a tight MEAN bound plus a loose per-pixel bound — a
    # real sharding bug produces O(100) diffs across the image
    diff = np.abs(outs[None].astype(int) - outs[(1, 1, 2)].astype(int))
    assert diff.mean() <= 1.0 and diff.max() <= 12, (diff.mean(), diff.max())


def _flux_cn_sd(rng, cfg_dict, n_layers=1, n_single=1, union=False):
    """Synthetic FLUX ControlNet checkpoint (diffusers layout)."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_flux import _synthetic_state_dict

    tiny = dict(cfg_dict)
    tiny["num_layers"], tiny["num_single_layers"] = n_layers, n_single
    sd = _synthetic_state_dict(tiny, rng)
    d = tiny["num_attention_heads"] * tiny["attention_head_dim"]
    del sd["norm_out.linear.weight"], sd["norm_out.linear.bias"]
    del sd["proj_out.weight"], sd["proj_out.bias"]
    sd["controlnet_x_embedder.weight"] = rng.standard_normal(
        (d, tiny["in_channels"])).astype(np.float32) * 0.04
    sd["controlnet_x_embedder.bias"] = np.zeros((d,), np.float32)
    for i in range(n_layers):
        sd[f"controlnet_blocks.{i}.weight"] = rng.standard_normal((d, d)).astype(np.float32) * 0.02
        sd[f"controlnet_blocks.{i}.bias"] = np.zeros((d,), np.float32)
    for i in range(n_single):
        sd[f"controlnet_single_blocks.{i}.weight"] = rng.standard_normal((d, d)).astype(np.float32) * 0.02
        sd[f"controlnet_single_blocks.{i}.bias"] = np.zeros((d,), np.float32)
    if union:
        sd["controlnet_mode_embedder.weight"] = rng.standard_normal((10, d)).astype(np.float32) * 0.1
    return sd


def test_flux_engine_controlnet_path(tmp_path, monkeypatch):
    """controlnet_path end-to-end: CN checkpoint dir -> engine ->
    generate(control_image=...) conditions the output."""
    import jax.numpy as jnp

    eng, rng = _tiny_flux_engine(tmp_path, monkeypatch)  # base engine first
    # build the CN checkpoint next to it and reload with controlnet_path
    from fastdm_tpu.engine import FastDMEngine

    root = str(tmp_path / "flux-tiny")
    cn_dir = str(tmp_path / "flux-cn")
    _write_st(os.path.join(cn_dir, "model.safetensors"),
              _flux_cn_sd(rng, TINY))
    cn_cfg_json = dict(TINY)
    cn_cfg_json.update(num_layers=1, num_single_layers=1, guidance_embeds=True)
    with open(os.path.join(cn_dir, "config.json"), "w") as f:
        json.dump(cn_cfg_json, f)

    eng_cn = FastDMEngine(root, architecture="flux", use_int8=True, verbose=False,
                          controlnet_path=cn_dir)
    b, txt = 1, 12
    embeds = jnp.asarray(np.random.default_rng(1).standard_normal(
        (b, txt, TINY["joint_attention_dim"])), jnp.bfloat16)
    pooled = jnp.asarray(np.random.default_rng(2).standard_normal(
        (b, TINY["pooled_projection_dim"])), jnp.bfloat16)
    hintA = (np.random.default_rng(3).random((64, 64, 3)) * 255).astype(np.uint8)

    imgA = eng_cn.generate(prompt_embeds=embeds, pooled_prompt_embeds=pooled,
                           height=64, width=64, num_inference_steps=2, seed=1,
                           control_image=hintA, controlnet_conditioning_scale=1.0)
    img0 = eng_cn.generate(prompt_embeds=embeds, pooled_prompt_embeds=pooled,
                           height=64, width=64, num_inference_steps=2, seed=1)
    assert imgA.shape == img0.shape == (1, 64, 64, 3)
    # the hint conditions the output
    assert np.abs(imgA.astype(int) - img0.astype(int)).max() > 0


def test_sdxl_engine_ip_adapter_path(tmp_path, monkeypatch):
    """ip_adapter_path end-to-end: attach from checkpoint dir, encode the
    style image with a real (tiny) CLIP vision tower, condition generate()."""
    import jax.numpy as jnp

    import fastdm_tpu.engine as engine_mod
    from fastdm_tpu.engine import FastDMEngine
    from fastdm_tpu.models.sdxl import SDXLConfig
    from fastdm_tpu.pipeline.vae import VAEConfig

    rng = np.random.default_rng(9)
    root = str(tmp_path / "sdxl-ip")
    _write_st(os.path.join(root, "unet", "model.safetensors"), _sdxl_sd(rng))
    _write_st(os.path.join(root, "vae", "model.safetensors"),
              _vae_sd(rng, latent_channels=4))
    monkeypatch.setitem(
        engine_mod.VAE_CONFIGS, "sdxl",
        VAEConfig(latent_channels=4, block_out_channels=(8, 8, 8, 8),
                  layers_per_block=1, norm_num_groups=4,
                  scaling_factor=0.5, shift_factor=0.0),
    )
    tiny_cfg = SDXLConfig(
        block_channels=(8, 16, 32), cross_attention_dim=16, attn_layers=(0, 1, 2),
        head_dim=8, addition_time_embed_dim=4, time_embed_dim=16,
        add_embedding_in_dim=8 + 6 * 4, norm_groups=4, quant="int8",
    )
    monkeypatch.setattr("fastdm_tpu.models.sdxl.SDXLConfig",
                        lambda quant=None, **kw: tiny_cfg)

    # tiny REAL CLIP vision tower saved in diffusers layout
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    clip_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_attention_heads=2,
        num_hidden_layers=2, image_size=32, patch_size=8, projection_dim=24,
    )
    import torch

    torch.manual_seed(0)
    clip = CLIPVisionModelWithProjection(clip_cfg)
    clip.save_pretrained(os.path.join(root, "image_encoder"))

    # IP-Adapter checkpoint (plain layout, embed_dim = projection_dim 24)
    sd, idx = {}, 0
    # processor order = diffusers registration order: down, up, MID LAST
    for ch, nl, cnt in ((16, 1, 2), (32, 2, 2), (32, 2, 3), (16, 1, 3), (32, 2, 1)):
        for _ in range(cnt):
            for _ in range(nl):
                idx += 1
                for n in ("to_k_ip", "to_v_ip"):
                    sd[f"ip_adapter.{idx}.{n}.weight"] = (
                        rng.standard_normal((ch, 16)).astype(np.float32) * 0.1)
                idx += 1
    sd["image_proj.proj.weight"] = rng.standard_normal((4 * 16, 24)).astype(np.float32) * 0.1
    sd["image_proj.proj.bias"] = np.zeros(64, np.float32)
    sd["image_proj.norm.weight"] = np.ones(16, np.float32)
    sd["image_proj.norm.bias"] = np.zeros(16, np.float32)
    ip_dir = str(tmp_path / "ip-adapter")
    _write_st(os.path.join(ip_dir, "ip-adapter.safetensors"), sd)

    class _FakeTE:
        def encode(self, prompt, n=1):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return (jnp.asarray(r.standard_normal((1, 6, 16)), jnp.bfloat16),
                    jnp.asarray(r.standard_normal((1, 8)), jnp.bfloat16))

    eng = FastDMEngine(root, architecture="sdxl", use_int8=True, verbose=False,
                       ip_adapter_path=ip_dir, ip_adapter_scale=0.8)
    eng.text_encoder = _FakeTE()

    style = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    img_ip = eng.generate(prompt="a boat", negative_prompt="fog",
                          height=64, width=64, num_inference_steps=2, seed=8,
                          ip_adapter_image=style)
    img_0 = eng.generate(prompt="a boat", negative_prompt="fog",
                         height=64, width=64, num_inference_steps=2, seed=8)
    assert img_ip.shape == (1, 64, 64, 3)
    assert np.abs(img_ip.astype(int) - img_0.astype(int)).max() > 0


def test_wan_engine_end_to_end_pixels(tmp_path):
    """Wan t2v through the engine WITH a (synthetic, diffusers-layout)
    AutoencoderKLWan checkpoint: the engine loads the 3D VAE, denoises, and
    decodes to pixel frames (1 + 4(lf-1) frames at 8x latent scale)."""
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_wan import TINY as WAN_TINY, _state_dict
    from test_wan_vae import TINY as VAE_TINY, _mk_diffusers_state_dict

    rng = np.random.default_rng(7)
    root = str(tmp_path / "wan-tiny-vae")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    cfg_json = dict(WAN_TINY)
    cfg_json["patch_size"] = [1, 2, 2]
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg_json, f)
    _write_st(os.path.join(root, "vae", "model.safetensors"),
              _mk_diffusers_state_dict(VAE_TINY))
    with open(os.path.join(root, "vae", "config.json"), "w") as f:
        json.dump({
            "base_dim": VAE_TINY.base_dim, "z_dim": VAE_TINY.z_dim,
            "num_res_blocks": VAE_TINY.num_res_blocks,
            "dim_mult": list(VAE_TINY.dim_mult),
            "temperal_downsample": list(VAE_TINY.temporal_downsample),
            "latents_mean": list(VAE_TINY.latents_mean),
            "latents_std": list(VAE_TINY.latents_std),
        }, f)

    class _FakeTE:
        def encode(self, prompt):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 8, WAN_TINY["text_dim"])), jnp.bfloat16)

    eng = FastDMEngine(root, architecture="wan2.2-t2v", use_int8=True, verbose=False)
    assert eng.vae_params is not None  # the VAE checkpoint loaded
    assert eng.vae_cfg.z_dim == VAE_TINY.z_dim
    eng.text_encoder = _FakeTE()
    eng.cfg = __import__("dataclasses").replace(eng.cfg, text_len=8)
    video = eng.generate(prompt="a river", negative_prompt="static",
                         height=32, width=32, num_frames=5,
                         num_inference_steps=2, seed=4)
    # lf = 2 latent frames -> 1 + 4*(2-1) = 5 output frames, 32x32 px
    assert video.shape == (1, 5, 32, 32, 3)
    assert video.dtype == np.uint8


def test_wan_engine_dual_expert_cached(tmp_path):
    """A14B-style dual expert + FBCache through the engine: transformer_2
    loads, model_index.json's boundary_ratio drives the expert switch, and
    the cached dual loop runs end-to-end."""
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_wan import TINY as WAN_TINY, _state_dict

    rng = np.random.default_rng(11)
    root = str(tmp_path / "wan-a14b-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    _write_st(os.path.join(root, "transformer_2", "model.safetensors"),
              _state_dict(np.random.default_rng(12)))
    cfg_json = dict(WAN_TINY)
    cfg_json["patch_size"] = [1, 2, 2]
    for sub in ("transformer", "transformer_2"):
        with open(os.path.join(root, sub, "config.json"), "w") as f:
            json.dump(cfg_json, f)
    with open(os.path.join(root, "model_index.json"), "w") as f:
        json.dump({"boundary_ratio": 0.5}, f)

    class _FakeTE:
        def encode(self, prompt):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 8, WAN_TINY["text_dim"])), jnp.bfloat16)

    eng = FastDMEngine(
        root, architecture="wan2.2-t2v", use_int8=True, verbose=False,
        cache_config={"cache_algorithm": "fbcache", "enable_caching": True,
                      "threshold": 100.0, "warmup_steps": 1,
                      "negtive_cache": True},
    )
    assert eng.params_2 is not None and eng.boundary_ratio == 0.5
    eng.text_encoder = _FakeTE()
    eng.cfg = __import__("dataclasses").replace(eng.cfg, text_len=8)
    lat = eng.generate(prompt="a storm", negative_prompt="calm",
                       height=32, width=32, num_frames=5,
                       num_inference_steps=4, output_type="latent", seed=4)
    assert lat.shape == (1, WAN_TINY["in_channels"], 2, 4, 4)
    assert np.isfinite(lat).all()
    # huge threshold + warmup 1 -> the cached loop must report skips
    assert eng.last_cache_skips > 0


def test_wan_engine_sp_mesh_matches_single(tmp_path):
    """Wan t2v through the engine with a sequence-parallel mesh (sp=2): ring
    attention engages via the registry auto policy and the latents match the
    unsharded run."""
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine
    from fastdm_tpu.parallel import cp_state

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_wan import TINY as WAN_TINY, _state_dict

    rng = np.random.default_rng(21)
    root = str(tmp_path / "wan-sp-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    cfg_json = dict(WAN_TINY)
    cfg_json["patch_size"] = [1, 2, 2]
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg_json, f)

    class _FakeTE:
        def encode(self, prompt):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 8, WAN_TINY["text_dim"])), jnp.bfloat16)

    kwargs = dict(prompt="waves", negative_prompt="still", height=32, width=32,
                  num_frames=5, num_inference_steps=2, output_type="latent",
                  seed=4)

    eng = FastDMEngine(root, architecture="wan2.2-t2v", use_int8=True,
                       verbose=False)
    eng.text_encoder = _FakeTE()
    eng.cfg = __import__("dataclasses").replace(eng.cfg, text_len=8)
    ref = eng.generate(**kwargs)

    eng_sp = FastDMEngine(root, architecture="wan2.2-t2v", use_int8=True,
                          verbose=False, mesh_shape=(1, 2, 1))
    # routing is scoped to generate(): inactive between calls
    assert cp_state.get_cp_mesh() is None
    eng_sp.text_encoder = _FakeTE()
    eng_sp.cfg = __import__("dataclasses").replace(eng_sp.cfg, text_len=8)
    out = eng_sp.generate(**kwargs)
    assert cp_state.get_cp_mesh() is None  # restored after the call

    assert out.shape == ref.shape
    # same math, ring online-softmax reduction order in bf16
    assert np.abs(out - ref).max() < 0.1


def test_flux_engine_dp_mesh_batches(tmp_path, monkeypatch):
    """dp-mesh batch parallelism: num_images_per_prompt=2 on a (2,1,1) mesh
    shards the batch; outputs match the unsharded run."""
    import jax.numpy as jnp

    import fastdm_tpu.engine as engine_mod
    from fastdm_tpu.engine import FastDMEngine
    from fastdm_tpu.pipeline.vae import VAEConfig

    rng = np.random.default_rng(13)
    root = str(tmp_path / "flux-dp-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _flux_transformer_sd(rng))
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(TINY, f)
    _write_st(os.path.join(root, "vae", "model.safetensors"), _vae_sd(rng))
    monkeypatch.setitem(
        engine_mod.VAE_CONFIGS, "flux",
        VAEConfig(latent_channels=4, block_out_channels=(8, 8, 8, 8),
                  layers_per_block=1, norm_num_groups=4,
                  scaling_factor=0.5, shift_factor=0.0),
    )

    b, txt = 2, 12
    embeds = jnp.asarray(rng.standard_normal((b, txt, TINY["joint_attention_dim"])),
                         jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((b, TINY["pooled_projection_dim"])),
                         jnp.bfloat16)
    kwargs = dict(prompt_embeds=embeds, pooled_prompt_embeds=pooled,
                  height=64, width=64, num_inference_steps=2, seed=1)

    ref = FastDMEngine(root, architecture="flux", use_int8=True,
                       verbose=False).generate(**kwargs)
    out = FastDMEngine(root, architecture="flux", use_int8=True, verbose=False,
                       mesh_shape=(2, 1, 1)).generate(**kwargs)
    assert out.shape == ref.shape == (2, 64, 64, 3)
    d = np.abs(out.astype(int) - ref.astype(int))
    # bf16 reduction-order drift through 2 denoise steps + VAE: a few pixels
    # move by ~10/255, the image as a whole stays put
    assert d.mean() < 1.0 and d.max() <= 20


def test_qwen_engine_wan_style_vae(tmp_path):
    """Real Qwen-Image checkpoints ship AutoencoderKLQwenImage — a Wan-style
    3D causal VAE. The engine must detect it (base_dim in vae/config.json),
    load via the wan codec, and wrap decode/encode with a singleton frame
    axis (regression: the 2D AutoencoderKL loader KeyError'd on it)."""
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_qwen import TINY as Q_TINY, _state_dict
    from test_wan_vae import TINY as VAE_TINY, _mk_diffusers_state_dict

    rng = np.random.default_rng(9)
    root = str(tmp_path / "qwen-3dvae")
    # transformer latent channels (in/4) must equal the VAE z_dim
    cfg_json = dict(Q_TINY)
    cfg_json["in_channels"] = VAE_TINY.z_dim * 4
    cfg_json["out_channels"] = VAE_TINY.z_dim

    import test_golden_qwen as gq

    old = gq.TINY
    gq.TINY = cfg_json
    try:
        sd = _state_dict(rng)
    finally:
        gq.TINY = old
    _write_st(os.path.join(root, "transformer", "model.safetensors"), sd)
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg_json, f)
    _write_st(os.path.join(root, "vae", "model.safetensors"),
              _mk_diffusers_state_dict(VAE_TINY))
    with open(os.path.join(root, "vae", "config.json"), "w") as f:
        json.dump({
            "base_dim": VAE_TINY.base_dim, "z_dim": VAE_TINY.z_dim,
            "num_res_blocks": VAE_TINY.num_res_blocks,
            "dim_mult": list(VAE_TINY.dim_mult),
            "temperal_downsample": list(VAE_TINY.temporal_downsample),
            "latents_mean": list(VAE_TINY.latents_mean),
            "latents_std": list(VAE_TINY.latents_std),
        }, f)

    class _FakeTE:
        def encode(self, prompt, n=1):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 6, cfg_json["joint_attention_dim"])),
                jnp.bfloat16)

        def encode_with_image(self, prompt, image, n=1):
            return self.encode(prompt)

    eng = FastDMEngine(root, architecture="qwen-image-edit", use_int8=True,
                       verbose=False)
    from fastdm_tpu.pipeline.wan_vae import WanVAEConfig

    assert isinstance(eng.vae_cfg, WanVAEConfig)  # 3D route taken
    eng.text_encoder = _FakeTE()
    # t2i exercises decode; edit additionally exercises encode
    # (wan VAE 8x spatial; qwen tokens are /16 of pixels)
    img = eng.generate(prompt="a fox", negative_prompt="y", height=64,
                       width=64, num_inference_steps=2, true_cfg_scale=3.0,
                       seed=2)
    assert img.shape == (1, 64, 64, 3) and img.dtype == np.uint8
    src = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    edited = eng.generate(prompt="edit", src_image=src, num_inference_steps=2,
                          true_cfg_scale=3.0, seed=2)
    assert edited.dtype == np.uint8


def test_wan_engine_dual_expert_offload_matches_resident(tmp_path):
    """offload_inactive_expert=True keeps both A14B experts in HOST RAM and
    transfers only the active one per phase (EP residency — the TPU answer to
    the reference's both-resident 96 GB H20 load, model_entry.py:673-690).
    The latents must match the both-resident engine bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_wan import TINY as WAN_TINY, _state_dict

    rng = np.random.default_rng(21)
    root = str(tmp_path / "wan-a14b-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    _write_st(os.path.join(root, "transformer_2", "model.safetensors"),
              _state_dict(np.random.default_rng(22)))
    cfg_json = dict(WAN_TINY)
    cfg_json["patch_size"] = [1, 2, 2]
    for sub in ("transformer", "transformer_2"):
        with open(os.path.join(root, sub, "config.json"), "w") as f:
            json.dump(cfg_json, f)
    with open(os.path.join(root, "model_index.json"), "w") as f:
        json.dump({"boundary_ratio": 0.5}, f)

    class _FakeTE:
        def encode(self, prompt):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 8, WAN_TINY["text_dim"])), jnp.bfloat16)

    outs = {}
    for offload in (False, True):
        eng = FastDMEngine(root, architecture="wan2.2-t2v", use_int8=True,
                           verbose=False, offload_inactive_expert=offload)
        eng.text_encoder = _FakeTE()
        eng.cfg = __import__("dataclasses").replace(eng.cfg, text_len=8)
        if offload:
            # both experts must live on host until their phase runs
            leaves = jax.tree_util.tree_leaves(eng.params)
            assert all(
                list(l.devices())[0].platform == "cpu" for l in leaves
                if hasattr(l, "devices")
            )
        outs[offload] = eng.generate(
            prompt="a storm", negative_prompt="calm", height=32, width=32,
            num_frames=5, num_inference_steps=4, output_type="latent", seed=4)
    np.testing.assert_array_equal(outs[False], outs[True])


def test_wan_engine_offload_composes_with_tp_mesh(tmp_path):
    """offload + mesh: experts stay in host RAM and the phase denoiser places
    the ACTIVE expert straight onto its tp shards (offload + tp=2 is the
    minimal A14B slice per the BENCH_NOTES residency math). Latents must
    match the single-device offload run."""
    import jax
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_wan import TINY as WAN_TINY, _state_dict

    rng = np.random.default_rng(25)
    root = str(tmp_path / "wan-a14b-tiny-tp")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    _write_st(os.path.join(root, "transformer_2", "model.safetensors"),
              _state_dict(np.random.default_rng(26)))
    cfg_json = dict(WAN_TINY)
    cfg_json["patch_size"] = [1, 2, 2]
    for sub in ("transformer", "transformer_2"):
        with open(os.path.join(root, sub, "config.json"), "w") as f:
            json.dump(cfg_json, f)
    with open(os.path.join(root, "model_index.json"), "w") as f:
        json.dump({"boundary_ratio": 0.5}, f)

    class _FakeTE:
        def encode(self, prompt):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 8, WAN_TINY["text_dim"])), jnp.bfloat16)

    outs = {}
    for mesh_shape in (None, (1, 1, 2)):
        eng = FastDMEngine(root, architecture="wan2.2-t2v", use_int8=True,
                           verbose=False, offload_inactive_expert=True,
                           mesh_shape=mesh_shape)
        eng.text_encoder = _FakeTE()
        eng.cfg = __import__("dataclasses").replace(eng.cfg, text_len=8)
        # masters stay host-resident either way
        leaves = jax.tree_util.tree_leaves(eng.params_2)
        assert all(list(l.devices())[0].platform == "cpu" for l in leaves
                   if hasattr(l, "devices"))
        if mesh_shape is not None:
            assert eng._place_params is not jax.device_put  # tp placer took
        outs[mesh_shape] = eng.generate(
            prompt="a storm", negative_prompt="calm", height=32, width=32,
            num_frames=5, num_inference_steps=4, output_type="latent", seed=4)
    # TP reorders partial-sum reductions; tolerance, not bit equality
    np.testing.assert_allclose(outs[None], outs[(1, 1, 2)], atol=2e-2,
                               rtol=2e-2)


def test_wan_engine_sparse_fine_gather(tmp_path, monkeypatch):
    """Radial sparse through the engine's default FINE gather path
    (FASTDM_SPARSE_GATHER=fine): block_lists_fine tables at the mask's own
    block_size flow as a 3-tuple into the denoiser and sdpa_gather_fine, and
    the result stays close to the dense run (dense warmup step included)."""
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_wan import TINY as WAN_TINY, _state_dict

    rng = np.random.default_rng(31)
    root = str(tmp_path / "wan-tiny-sparse")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    cfg_json = dict(WAN_TINY)
    cfg_json["patch_size"] = [1, 2, 2]
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg_json, f)

    class _FakeTE:
        def encode(self, prompt):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 8, WAN_TINY["text_dim"])), jnp.bfloat16)

    sparse = {"sparse_algorithm": "radial", "block_size": 16,
              "decay_factor": 1.0, "model_type": "wan", "dense_steps": 1}
    # on CPU the auto backend routes sparse ops to jnp, which would force
    # gather_mode to "mask" for BOTH iterations (a vacuous comparison) —
    # force pallas (interpret mode via conftest) so the fine path is real
    # the ctor writes FASTDM_KERNEL_BACKEND to os.environ; setenv first so
    # monkeypatch teardown restores the pre-test value
    monkeypatch.setenv("FASTDM_KERNEL_BACKEND", "pallas")
    outs = {}
    for mode in ("fine", "mask"):
        monkeypatch.setenv("FASTDM_SPARSE_GATHER", mode)
        eng = FastDMEngine(root, architecture="wan2.2-t2v", use_int8=True,
                           verbose=False, sparse_attn_config=dict(sparse),
                           kernel_backend="pallas")
        eng.text_encoder = _FakeTE()
        eng.cfg = __import__("dataclasses").replace(eng.cfg, text_len=8)
        # 13 output frames -> lf=4 latent frames; 64x64 px -> 8x8 latent ->
        # 4x4 patched = 16 tokens/frame, 64 tokens total = 4 fine blocks
        outs[mode] = eng.generate(
            prompt="a storm", negative_prompt="calm", height=64, width=64,
            num_frames=13, num_inference_steps=2, output_type="latent",
            seed=4)
        assert np.isfinite(outs[mode]).all()
    # decay 1.0 keeps the mask wide at this tiny shape; fine vs token-mask
    # paths see the same attention pattern, so results agree closely
    np.testing.assert_allclose(outs["fine"], outs["mask"], atol=5e-2)


def test_wan_engine_dual_cached_sparse_offload(tmp_path):
    """The reference's full A14B serving configuration — two temporal experts
    + step cache + radial sparse (ref: model_entry.py:673-690 + xcaching +
    xsparse) — through the phase-split HOST-offload path on one device: the
    inactive 14B expert never occupies HBM, cache states stay per expert per
    CFG branch, sparse engages after the dense warmup step."""
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_wan import TINY as WAN_TINY, _state_dict

    rng = np.random.default_rng(23)
    root = str(tmp_path / "wan-a14b-tiny-cs")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    _write_st(os.path.join(root, "transformer_2", "model.safetensors"),
              _state_dict(np.random.default_rng(24)))
    cfg_json = dict(WAN_TINY)
    cfg_json["patch_size"] = [1, 2, 2]
    for sub in ("transformer", "transformer_2"):
        with open(os.path.join(root, sub, "config.json"), "w") as f:
            json.dump(cfg_json, f)
    with open(os.path.join(root, "model_index.json"), "w") as f:
        json.dump({"boundary_ratio": 0.5}, f)

    class _FakeTE:
        def encode(self, prompt):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 8, WAN_TINY["text_dim"])), jnp.bfloat16)

    eng = FastDMEngine(
        root, architecture="wan2.2-t2v", use_int8=True, verbose=False,
        offload_inactive_expert=True,
        cache_config={"cache_algorithm": "fbcache", "enable_caching": True,
                      "threshold": 100.0, "warmup_steps": 1,
                      "negtive_cache": True},
        sparse_attn_config={"sparse_algorithm": "radial", "block_size": 16,
                            "decay_factor": 1.0, "model_type": "wan",
                            "dense_steps": 1})
    eng.text_encoder = _FakeTE()
    eng.cfg = __import__("dataclasses").replace(eng.cfg, text_len=8)
    lat = eng.generate(
        prompt="a storm", negative_prompt="calm", height=64, width=64,
        num_frames=13, num_inference_steps=4, output_type="latent", seed=4)
    assert np.isfinite(lat).all()
    # threshold 100 forces skips on every non-warmup step of both experts
    assert eng.last_cache_skips > 0


def test_wan21_i2v_clip_conditioning(tmp_path, monkeypatch):
    """Wan2.1-style I2V: a checkpoint with image_embedder + add_k/add_v gets
    CLIP image tokens through the cross-attention image-KV branch (the
    reference rides diffusers WanImageToVideoPipeline, model_entry.py:617).
    The CLIP tower itself is stubbed; the wiring under test is engine ->
    denoiser -> wan_forward(encoder_hidden_states_image=...)."""
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import test_golden_wan as gw

    image_dim = 16
    tiny = dict(gw.TINY)
    tiny["in_channels"] = gw.TINY["out_channels"] + 4
    d = tiny["num_attention_heads"] * tiny["attention_head_dim"]
    rng = np.random.default_rng(7)
    monkeypatch.setattr(gw, "TINY", tiny)
    sd = gw._state_dict(rng)

    def lin(name, k, n):
        sd[f"{name}.weight"] = rng.standard_normal((n, k)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rng.standard_normal((n,)).astype(np.float32) * 0.02

    ie = "condition_embedder.image_embedder"
    sd[f"{ie}.norm1.weight"] = np.ones((image_dim,), np.float32)
    sd[f"{ie}.norm1.bias"] = np.zeros((image_dim,), np.float32)
    lin(f"{ie}.ff.net.0.proj", image_dim, image_dim)
    lin(f"{ie}.ff.net.2", image_dim, d)
    sd[f"{ie}.norm2.weight"] = np.ones((d,), np.float32)
    sd[f"{ie}.norm2.bias"] = np.zeros((d,), np.float32)
    for i in range(tiny["num_layers"]):
        lin(f"blocks.{i}.attn2.add_k_proj", d, d)
        lin(f"blocks.{i}.attn2.add_v_proj", d, d)
        sd[f"blocks.{i}.attn2.norm_added_k.weight"] = np.ones((d,), np.float32)

    root = str(tmp_path / "wan21-i2v-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"), sd)
    cfg_json = dict(tiny)
    cfg_json["patch_size"] = [1, 2, 2]
    cfg_json["image_dim"] = image_dim
    cfg_json["added_kv_proj_dim"] = d
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg_json, f)

    eng = FastDMEngine(root, architecture="wan-i2v", use_int8=True, verbose=False)
    assert eng.wan_image_encoder is not None  # checkpoint carries the branch

    class _FakeTE:
        def encode(self, prompt):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 8, tiny["text_dim"])), jnp.bfloat16)

    calls = []

    class _FakeCLIP:
        def encode(self, image, num_images_per_prompt=1, hidden_states=False):
            calls.append(hidden_states)
            r = np.random.default_rng(11)
            return jnp.asarray(
                r.standard_normal((1, 5, image_dim)), jnp.bfloat16)

    eng.text_encoder = _FakeTE()
    eng.wan_image_encoder = _FakeCLIP()
    import dataclasses

    eng.cfg = dataclasses.replace(eng.cfg, text_len=8)
    monkeypatch.setattr(
        eng, "_wan_i2v_latents",
        lambda image, lf, lh, lw, nf: jnp.ones((1, 4, lf, lh, lw), jnp.float32),
    )
    lat = eng.generate(prompt="a cat", negative_prompt="blur", task="i2v",
                       image=np.zeros((32, 32, 3), np.uint8),
                       height=32, width=32, num_frames=5,
                       num_inference_steps=2, output_type="latent", seed=9)
    assert calls == [True]  # penultimate hidden states, encoded once
    assert lat.shape == (1, tiny["out_channels"], 2, 4, 4)
    assert np.isfinite(lat).all()


def test_wan_engine_gather_mode_flip_rebuilds_denoiser(tmp_path, monkeypatch):
    """Flipping FASTDM_SPARSE_GATHER between generates on ONE engine must not
    reuse the denoiser jitted for the other mode: the gather mode and tile
    geometry live in the closure's cfg, and fine tables fed to the super
    kernel would read valid-counts as sub-block bitmasks (silent garbage).
    The cache key carries a sparse signature (engine.py sparse_sig)."""
    import jax.numpy as jnp

    from fastdm_tpu.engine import FastDMEngine

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_wan import TINY as WAN_TINY, _state_dict

    rng = np.random.default_rng(31)
    root = str(tmp_path / "wan-tiny-sparse-flip")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    cfg_json = dict(WAN_TINY)
    cfg_json["patch_size"] = [1, 2, 2]
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg_json, f)

    class _FakeTE:
        def encode(self, prompt):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 8, WAN_TINY["text_dim"])), jnp.bfloat16)

    sparse = {"sparse_algorithm": "radial", "block_size": 16,
              "decay_factor": 1.0, "model_type": "wan", "dense_steps": 1}
    # force pallas (interpret) so the gather modes are actually distinct on
    # CPU — under the auto backend all three would degrade to "mask"; setenv
    # first so monkeypatch restores the ctor-written env var on teardown
    monkeypatch.setenv("FASTDM_KERNEL_BACKEND", "pallas")
    eng = FastDMEngine(root, architecture="wan2.2-t2v", use_int8=True,
                       verbose=False, sparse_attn_config=dict(sparse),
                       kernel_backend="pallas")
    eng.text_encoder = _FakeTE()
    eng.cfg = __import__("dataclasses").replace(eng.cfg, text_len=8)
    gen = dict(prompt="a storm", negative_prompt="calm", height=64, width=64,
               num_frames=13, num_inference_steps=2, output_type="latent",
               seed=4)
    outs = {}
    for mode in ("super", "fine", "mask"):
        monkeypatch.setenv("FASTDM_SPARSE_GATHER", mode)
        outs[mode] = eng.generate(**gen)
        assert np.isfinite(outs[mode]).all()
    # one denoiser per gather mode — no silent reuse across modes
    assert len(eng._denoisers) == 3
    # all three consume the identical wide radial mask at this tiny shape
    np.testing.assert_allclose(outs["super"], outs["mask"], atol=5e-2)
    np.testing.assert_allclose(outs["fine"], outs["mask"], atol=5e-2)


def test_qwen_engine_mesh_pp(tmp_path, monkeypatch):
    """Qwen engine under a pp=2 mesh: block stacks layer-sharded, the GPipe
    route (models/qwenimage.py _qwen_run_blocks_pp) produces the same image
    as the unsharded engine — the deployable form of PP for the 13.6 GB
    weights-don't-fit family."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 2:
        import pytest as _pytest

        _pytest.skip("needs multiple devices")

    import fastdm_tpu.engine as engine_mod
    from fastdm_tpu.engine import FastDMEngine
    from fastdm_tpu.pipeline.vae import VAEConfig

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_qwen import TINY as Q_TINY, _state_dict

    rng = np.random.default_rng(6)
    root = str(tmp_path / "qwen-pp")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    cfg_json = dict(Q_TINY)
    cfg_json["out_channels"] = Q_TINY["in_channels"] // 4
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg_json, f)
    lat_ch = Q_TINY["in_channels"] // 4
    _write_st(os.path.join(root, "vae", "model.safetensors"),
              _vae_sd(rng, latent_channels=lat_ch))
    monkeypatch.setitem(
        engine_mod.VAE_CONFIGS, "qwen",
        VAEConfig(latent_channels=lat_ch, block_out_channels=(8, 8, 8, 8),
                  layers_per_block=1, norm_num_groups=4,
                  scaling_factor=1.0, shift_factor=0.0),
    )

    class _FakeTE:
        def encode(self, prompt, n=1):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 6, Q_TINY["joint_attention_dim"])), jnp.bfloat16)

    outs = {}
    for mesh in (None, (1, 1, 1, 2)):
        eng = FastDMEngine(root, architecture="qwen-image", use_int8=True,
                           verbose=False, mesh_shape=mesh)
        eng.text_encoder = _FakeTE()
        if mesh is not None:
            spec = eng.params["blocks"]["img_mod"]["w"].sharding.spec
            assert "pp" in str(spec)  # layer axis sharded over pp
        outs[mesh] = eng.generate(prompt="a fox", negative_prompt="x",
                                  height=64, width=64, num_inference_steps=2,
                                  true_cfg_scale=3.0, seed=6)
    diff = np.abs(outs[None].astype(int) - outs[(1, 1, 1, 2)].astype(int))
    assert diff.mean() <= 1.0 and diff.max() <= 12, (diff.mean(), diff.max())


def test_wan_ffn_chunk_auto_recomputed_per_shape(tmp_path, monkeypatch):
    """Auto-derived ffn_chunk_tokens must be recomputed per generate shape:
    a stale value from a previous shape that does not divide the new token
    count silently disabled chunking (advisor r4). User-set values persist."""
    import jax.numpy as jnp

    from fastdm_tpu import engine as engine_mod
    from fastdm_tpu.engine import FastDMEngine

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_wan import TINY as WAN_TINY, _state_dict

    rng = np.random.default_rng(3)
    root = str(tmp_path / "wan-tiny")
    _write_st(os.path.join(root, "transformer", "model.safetensors"),
              _state_dict(rng))
    cfg_json = dict(WAN_TINY)
    cfg_json["patch_size"] = [1, 2, 2]
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg_json, f)

    class _FakeTE:
        def encode(self, prompt):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return jnp.asarray(
                r.standard_normal((1, 8, WAN_TINY["text_dim"])), jnp.bfloat16)

    # tiny threshold so the tiny latents trip the auto path
    monkeypatch.setattr(engine_mod, "_FFN_CHUNK_MIN_TOKENS", 16)
    eng = FastDMEngine(root, architecture="wan2.2-t2v", use_int8=True,
                       verbose=False)
    eng.text_encoder = _FakeTE()
    eng.cfg = __import__("dataclasses").replace(eng.cfg, text_len=8)

    # shape A: 2 frames x 2x4 patches -> 16 tokens -> auto chunk 16//8 = 2
    eng.generate(prompt="a", height=64, width=32, num_frames=5,
                 num_inference_steps=1, output_type="latent", seed=1)
    assert eng.cfg.ffn_chunk_tokens == 2 and eng._ffn_chunk_auto

    # shape B: 3 frames -> 24 tokens; stale 2 divides 24 but the correct
    # auto value is 3 — must be RE-derived, not kept
    eng.generate(prompt="a", height=64, width=32, num_frames=9,
                 num_inference_steps=1, output_type="latent", seed=1)
    assert eng.cfg.ffn_chunk_tokens == 3

    # shape C: below threshold -> auto value cleared
    monkeypatch.setattr(engine_mod, "_FFN_CHUNK_MIN_TOKENS", 10_000)
    eng.generate(prompt="a", height=64, width=32, num_frames=5,
                 num_inference_steps=1, output_type="latent", seed=1)
    assert eng.cfg.ffn_chunk_tokens == 0

    # user-set value is never touched by the auto logic
    eng.cfg = __import__("dataclasses").replace(eng.cfg, ffn_chunk_tokens=16)
    eng._ffn_chunk_auto = False
    eng.generate(prompt="a", height=64, width=32, num_frames=5,
                 num_inference_steps=1, output_type="latent", seed=1)
    assert eng.cfg.ffn_chunk_tokens == 16
