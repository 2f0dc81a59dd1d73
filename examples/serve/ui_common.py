"""UI-independent helpers shared by the Gradio front-ends (gradio_launch.py,
multi_model_gradio.py). Kept gradio-free so the session history, generation
info and model routing logic are unit-testable in this image (gradio itself
is an optional dependency, like the reference's serve extras).

Feature parity targets: the reference's single-model UI keeps a processed-
input preview + generation-info panel (ref: examples/serve/gradio_launch.py
update_gen_info/preview_processed_image) and its multi-model router
classifies backends into task tabs and re-queries them on refresh
(ref: examples/serve/multi_model_gradio.py fetch_all_models/refresh_*)."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional


# task tags for the router tabs (ref: multi_model_gradio.py model_type)
TASKS = ("t2i", "t2v", "edit", "i2v")

_EDIT_HINTS = ("edit", "kontext")
_VIDEO_HINTS = ("wan", "t2v", "i2v", "ti2v", "video")


def classify_model_task(name: str, architecture: Optional[str] = None) -> List[str]:
    """Which task tabs a served model belongs on, from its name/architecture
    (the reference routes by model_type strings from /get_model_info;
    ref: multi_model_gradio.py:68-143)."""
    s = f"{name} {architecture or ''}".lower()
    if any(h in s for h in _EDIT_HINTS):
        return ["edit"]
    if any(h in s for h in _VIDEO_HINTS):
        if "ti2v" in s:
            return ["t2v", "i2v"]  # wan2.2-ti2v serves both
        if "i2v" in s:
            return ["i2v"]
        return ["t2v"]
    return ["t2i"]


def format_gen_info(**kw) -> str:
    """Human-readable generation-parameter panel (the reference shows the
    exact settings next to every result; ref: gradio_launch.py
    update_gen_info)."""
    order = ("model", "prompt", "negative_prompt", "blend_mode",
             "concat_direction", "steps", "guidance", "true_cfg", "sampler",
             "strength", "width", "height", "num_frames", "fps", "seed",
             "seconds")
    lines = []
    for key in order:
        if key in kw and kw[key] not in (None, ""):
            val = kw[key]
            if key == "prompt" and isinstance(val, str) and len(val) > 120:
                val = val[:117] + "..."
            if key == "seconds":
                val = f"{float(val):.2f} s"
            lines.append(f"{key}: {val}")
    for key in sorted(set(kw) - set(order)):
        if kw[key] not in (None, ""):
            lines.append(f"{key}: {kw[key]}")
    return "\n".join(lines)


class GenerationHistory:
    """Bounded on-disk session history: every result is saved under
    `root/` with a JSON sidecar of its parameters, newest first (the
    reference's UI keeps a result gallery per session; this also survives a
    UI restart)."""

    def __init__(self, root: Optional[str] = None, limit: int = 50):
        self.root = root or os.path.join(
            os.path.expanduser("~"), ".cache", "fastdm_tpu", "ui_history")
        self.limit = int(limit)
        self._seq = 0  # disambiguates same-second saves
        os.makedirs(self.root, exist_ok=True)

    def _meta_path(self, stem: str) -> str:
        return os.path.join(self.root, stem + ".json")

    def add(self, image=None, video_path: Optional[str] = None,
            **params) -> str:
        """Persist one result (PIL image / numpy array or a video file path)
        + its parameters; returns the saved artifact path."""
        self._seq += 1
        stem = time.strftime("%Y%m%d-%H%M%S") + f"-{self._seq:04d}"
        if video_path is not None:
            path = os.path.join(self.root, stem + ".mp4")
            with open(video_path, "rb") as src, open(path, "wb") as dst:
                dst.write(src.read())
        else:
            path = os.path.join(self.root, stem + ".png")
            if hasattr(image, "save"):
                image.save(path)
            else:
                from PIL import Image
                import numpy as np

                Image.fromarray(np.asarray(image)).save(path)
        with open(self._meta_path(stem), "w") as f:
            json.dump({"artifact": path, "params": params,
                       "time": time.time()}, f)
        self._prune()
        return path

    def entries(self) -> List[Dict]:
        """Newest-first [(artifact path, params dict)] for gallery display."""
        out = []
        for name in sorted(os.listdir(self.root), reverse=True):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(self.root, name)) as f:
                    meta = json.load(f)
                if os.path.exists(meta.get("artifact", "")):
                    out.append(meta)
            except (json.JSONDecodeError, OSError):
                continue
        return out

    def gallery(self) -> List[tuple]:
        """(path, caption) pairs for gr.Gallery."""
        return [
            (m["artifact"],
             format_gen_info(**m.get("params", {})).replace("\n", " | "))
            for m in self.entries()
        ]

    def _prune(self) -> None:
        metas = sorted(
            n for n in os.listdir(self.root) if n.endswith(".json"))
        while len(metas) > self.limit:
            stem = metas.pop(0)[:-5]
            for ext in (".json", ".png", ".mp4"):
                p = os.path.join(self.root, stem + ext)
                if os.path.exists(p):
                    os.remove(p)
