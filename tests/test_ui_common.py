"""UI-independent front-end logic (examples/serve/ui_common.py + the router's
backend discovery): task classification, generation-info panel, persistent
history store — testable without gradio (optional in this image, like the
reference's serve extras)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples",
                                "serve"))

from ui_common import GenerationHistory, classify_model_task, format_gen_info


@pytest.mark.parametrize("name,arch,expected", [
    ("flux", "flux", ["t2i"]),
    ("sdxl-base", None, ["t2i"]),
    ("qwen-image", "qwen", ["t2i"]),
    ("qwen-image-edit", None, ["edit"]),
    ("flux-kontext", None, ["edit"]),
    ("wan2.2-t2v-a14b", "wan", ["t2v"]),
    ("wan2.2-i2v-a14b", None, ["i2v"]),
    ("wan2.2-ti2v-5b", None, ["t2v", "i2v"]),
])
def test_classify_model_task(name, arch, expected):
    assert classify_model_task(name, arch) == expected


def test_format_gen_info_order_and_truncation():
    info = format_gen_info(prompt="x" * 200, steps=25, seed=7, model="flux",
                           seconds=1.234, negative_prompt=None)
    lines = info.splitlines()
    # canonical ordering: model before prompt before steps before seed
    keys = [l.split(":")[0] for l in lines]
    assert keys.index("model") < keys.index("prompt") < keys.index("steps")
    assert "seconds: 1.23 s" in info
    assert "negative_prompt" not in info  # empty params dropped
    assert any(l.endswith("...") for l in lines)  # long prompt truncated


def test_history_roundtrip_and_prune(tmp_path):
    h = GenerationHistory(str(tmp_path / "hist"), limit=3)
    img = np.zeros((8, 8, 3), np.uint8)
    for i in range(5):
        h.add(image=img, prompt=f"p{i}", steps=i)
    entries = h.entries()
    assert len(entries) == 3  # pruned to limit, oldest dropped
    assert [e["params"]["prompt"] for e in entries] == ["p4", "p3", "p2"]
    for e in entries:
        assert os.path.exists(e["artifact"])
    gal = h.gallery()
    assert len(gal) == 3 and all(os.path.exists(p) for p, _ in gal)
    assert "p4" in gal[0][1]


def test_history_video_artifact(tmp_path):
    src = tmp_path / "v.mp4"
    src.write_bytes(b"\x00fakevideo")
    h = GenerationHistory(str(tmp_path / "hist"), limit=2)
    path = h.add(video_path=str(src), prompt="vid", num_frames=5)
    assert path.endswith(".mp4") and os.path.getsize(path) == 10


def test_router_discovery_classifies_and_survives_down_backends(monkeypatch):
    import multi_model_gradio as mmg

    def fake_get_json(url, timeout=10):
        if "9000" in url and url.endswith("get_model_info"):
            return {"model_name": "wan2.2-ti2v-5b"}
        if "9000" in url and url.endswith("health"):
            return {"status": "ok", "architecture": "wan"}
        raise OSError("connection refused")

    monkeypatch.setattr(mmg, "get_json", fake_get_json)
    by_task, routes = mmg.discover_backends(
        {"video": "http://h:9000", "flux": "http://h:9001"},
        {"video": "video", "flux": "flux"})
    assert by_task["t2v"] == ["video"] and by_task["i2v"] == ["video"]
    assert by_task["t2i"] == ["flux"]  # down backend classified by CLI name
    assert routes["video"] == ("http://h:9000", "wan2.2-ti2v-5b")
    assert routes["flux"] == ("http://h:9001", "flux")
