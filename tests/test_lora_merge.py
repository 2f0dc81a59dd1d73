"""LoRA merge tool: W' = W + s * alpha/rank * (B @ A), sharding preserved."""

import importlib.util
import os
import sys

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "lora_merge",
    os.path.join(os.path.dirname(__file__), "..", "examples", "lora-gen", "lora_merge.py"),
)
lora_merge = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(lora_merge)


def _write_safetensors(path, tensors):
    from safetensors.numpy import save_file

    save_file(tensors, path)


def test_merge_peft_layout(tmp_path):
    rng = np.random.default_rng(0)
    base_dir = tmp_path / "model" / "transformer"
    base_dir.mkdir(parents=True)
    w = rng.standard_normal((8, 16)).astype(np.float32)
    other = rng.standard_normal((4,)).astype(np.float32)
    _write_safetensors(str(base_dir / "model.safetensors"),
                       {"blocks.0.attn.to_q.weight": w, "blocks.0.norm.weight": other})

    rank = 2
    down = rng.standard_normal((rank, 16)).astype(np.float32)
    up = rng.standard_normal((8, rank)).astype(np.float32)
    lora_dir = tmp_path / "lora"
    lora_dir.mkdir()
    _write_safetensors(str(lora_dir / "lora.safetensors"), {
        "transformer.blocks.0.attn.to_q.lora_A.default.weight": down,
        "transformer.blocks.0.attn.to_q.lora_B.default.weight": up,
        "transformer.blocks.0.attn.to_q.alpha": np.asarray(4.0, np.float32),
    })

    out_dir = tmp_path / "merged"
    lora_merge.merge(str(tmp_path / "model"), str(lora_dir), str(out_dir),
                     lora_scale=0.5)

    from safetensors import safe_open

    with safe_open(str(out_dir / "model.safetensors"), framework="numpy") as f:
        merged = f.get_tensor("blocks.0.attn.to_q.weight")
        untouched = f.get_tensor("blocks.0.norm.weight")
    expected = w + 0.5 * (4.0 / rank) * (up @ down)
    np.testing.assert_allclose(merged, expected, rtol=1e-5)
    np.testing.assert_allclose(untouched, other)


def test_merge_diffusers_layout_preserves_shards(tmp_path):
    rng = np.random.default_rng(1)
    base_dir = tmp_path / "model" / "transformer"
    base_dir.mkdir(parents=True)
    w1 = rng.standard_normal((4, 6)).astype(np.float32)
    w2 = rng.standard_normal((6, 4)).astype(np.float32)
    _write_safetensors(str(base_dir / "model-00001-of-00002.safetensors"), {"a.weight": w1})
    _write_safetensors(str(base_dir / "model-00002-of-00002.safetensors"), {"b.weight": w2})

    lora_dir = tmp_path / "lora"
    lora_dir.mkdir()
    _write_safetensors(str(lora_dir / "l.safetensors"), {
        "a.lora.down.weight": rng.standard_normal((2, 6)).astype(np.float32),
        "a.lora.up.weight": rng.standard_normal((4, 2)).astype(np.float32),
    })

    out_dir = tmp_path / "merged"
    lora_merge.merge(str(tmp_path / "model"), str(lora_dir), str(out_dir))
    assert sorted(os.listdir(out_dir)) == [
        "model-00001-of-00002.safetensors", "model-00002-of-00002.safetensors",
    ]


def test_merge_wan_lightning_layout(tmp_path):
    """Wan2.2-Lightning LoRAs use diffusion_model. prefix + lora_down/lora_up
    (ref: examples/lora-gen/wan_lightning_merge.py naming)."""
    rng = np.random.default_rng(2)
    base_dir = tmp_path / "model" / "transformer"
    base_dir.mkdir(parents=True)
    w = rng.standard_normal((8, 16)).astype(np.float32)
    _write_safetensors(str(base_dir / "model.safetensors"),
                       {"blocks.0.attn.to_q.weight": w})

    rank = 2
    down = rng.standard_normal((rank, 16)).astype(np.float32)
    up = rng.standard_normal((8, rank)).astype(np.float32)
    lora_dir = tmp_path / "lora"
    lora_dir.mkdir()
    _write_safetensors(str(lora_dir / "lora.safetensors"), {
        "diffusion_model.blocks.0.attn.to_q.lora_down.weight": down,
        "diffusion_model.blocks.0.attn.to_q.lora_up.weight": up,
        "diffusion_model.blocks.0.attn.to_q.alpha": np.asarray(2.0, np.float32),
    })

    out_dir = tmp_path / "merged"
    lora_merge.merge(str(tmp_path / "model"), str(lora_dir), str(out_dir))

    from safetensors import safe_open

    with safe_open(str(out_dir / "model.safetensors"), framework="numpy") as f:
        merged = f.get_tensor("blocks.0.attn.to_q.weight")
    np.testing.assert_allclose(merged, w + (2.0 / rank) * (up @ down), rtol=1e-5)
