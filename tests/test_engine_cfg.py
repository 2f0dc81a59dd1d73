"""Engine config.json overrides (checkpoint-variant hyperparams)."""

import json
import os


def _engine_with(tmp_path, cfg_json):
    from fastdm_tpu.engine import FastDMEngine

    eng = FastDMEngine.__new__(FastDMEngine)
    eng.model_path = str(tmp_path)
    os.makedirs(tmp_path / "transformer", exist_ok=True)
    with open(tmp_path / "transformer" / "config.json", "w") as f:
        json.dump(cfg_json, f)
    return eng


def test_flux_schnell_overrides(tmp_path):
    eng = _engine_with(tmp_path, {
        "guidance_embeds": False, "num_layers": 19, "num_single_layers": 38,
        "out_channels": None, "axes_dims_rope": [16, 56, 56],
    })
    kw = eng._cfg_overrides(
        "transformer",
        ("patch_size", "in_channels", "out_channels", "num_layers",
         "num_single_layers", "attention_head_dim", "num_attention_heads",
         "joint_attention_dim", "pooled_projection_dim", "guidance_embeds"),
        {"axes_dims_rope": lambda v: {"axes_dims_rope": tuple(v)}},
    )
    assert kw["guidance_embeds"] is False            # schnell
    assert "out_channels" not in kw                  # null filtered
    assert kw["axes_dims_rope"] == (16, 56, 56)      # tuple-converted


def test_sd35_large_overrides(tmp_path):
    eng = _engine_with(tmp_path, {
        "num_layers": 38, "attention_head_dim": 64, "num_attention_heads": 38,
        "dual_attention_layers": list(range(12)), "pos_embed_max_size": 192,
    })
    kw = eng._cfg_overrides(
        "transformer",
        ("num_layers", "attention_head_dim", "num_attention_heads",
         "pos_embed_max_size"),
        {"dual_attention_layers": lambda v: {"num_dual_layers": len(v)}},
    )
    assert kw["num_layers"] == 38 and kw["num_dual_layers"] == 12


def test_missing_config_is_empty(tmp_path):
    from fastdm_tpu.engine import FastDMEngine

    eng = FastDMEngine.__new__(FastDMEngine)
    eng.model_path = str(tmp_path)
    assert eng._cfg_overrides("transformer", ("num_layers",)) == {}


def test_generate_kwarg_aliases(monkeypatch):
    """Reference spellings (steps/gen_seed/gen_width/...) map onto ours."""
    from fastdm_tpu.engine import FastDMEngine

    eng = FastDMEngine.__new__(FastDMEngine)
    eng.architecture = "flux"
    captured = {}

    def fake(prompt, task="t2i", **kw):
        captured.update(kw, prompt=prompt, task=task)

    eng._generate_flux = fake
    eng.generate("hi", steps=7, gen_seed=9, gen_width=256, gen_height=128,
                 src_image=None)
    assert captured["num_inference_steps"] == 7
    assert captured["seed"] == 9 and captured["width"] == 256
    assert captured["height"] == 128 and captured["image"] is None

    import pytest as _pytest

    with _pytest.raises(TypeError, match="both"):
        eng.generate("hi", steps=7, num_inference_steps=8)

    # src_image presence engages i2i like the reference
    import numpy as np

    eng.generate("hi", src_image=np.zeros((8, 8, 3), np.uint8))
    assert captured["task"] == "i2i"
