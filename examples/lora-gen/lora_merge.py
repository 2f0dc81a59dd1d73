"""Offline LoRA -> base merge, preserving safetensors sharding
(ref: examples/lora-gen/lora_merge.py — same CLI; re-implemented with pure
numpy/safetensors instead of a GPU diffusers pipeline: W' = W + s * (B @ A)).

Handles both LoRA layouts:
  * PEFT:      {prefix}.lora_A.{adapter}.weight / lora_B.{adapter}.weight
  * diffusers: {prefix}.lora.down.weight / lora.up.weight
with optional `alpha` tensors (scale = alpha / rank).

Usage:
  python lora_merge.py --model-path <dir> --lora-path <file|dir> \
      [--merged-model-path <dir>] [--lora-scale 1.0]
"""

import argparse
import json
import os
import re
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def _to_np(x):
    arr = np.asarray(x)
    if arr.dtype == np.dtype("V2"):
        import ml_dtypes

        arr = arr.view(ml_dtypes.bfloat16)
    return arr


def find_safetensors(path):
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".safetensors")]
    return sorted(out)


def load_lora(lora_path):
    """Returns {base_weight_name: (down (r,in), up (out,r), scale)}."""
    from safetensors import safe_open

    tensors = {}
    for f in find_safetensors(lora_path):
        with safe_open(f, framework="numpy") as sf:
            for k in sf.keys():
                tensors[k] = sf.get_tensor(k)

    pairs = {}
    alphas = {}
    for k, v in tensors.items():
        k2 = k
        for prefix in ("transformer.", "diffusion_model."):
            if k2.startswith(prefix):
                k2 = k2[len(prefix):]
        # naming covers diffusers (lora_A/lora_B), kohya (lora.down/lora.up)
        # and Wan2.2-Lightning (lora_down/lora_up; ref: wan_lightning_merge.py)
        m = re.match(r"(.*)\.(?:lora_A(?:\.[^.]+)?|lora[._]down)\.weight$", k2)
        if m:
            pairs.setdefault(m.group(1), {})["down"] = _to_np(v)
            continue
        m = re.match(r"(.*)\.(?:lora_B(?:\.[^.]+)?|lora[._]up)\.weight$", k2)
        if m:
            pairs.setdefault(m.group(1), {})["up"] = _to_np(v)
            continue
        m = re.match(r"(.*)\.alpha$", k2)
        if m:
            alphas[m.group(1)] = float(_to_np(v))
            continue
        print(f"warning: {k} is not a lora weight, skipping")

    out = {}
    for prefix, duo in pairs.items():
        if "down" not in duo or "up" not in duo:
            print(f"warning: incomplete lora pair for {prefix}, skipping")
            continue
        rank = duo["down"].shape[0]
        scale = alphas.get(prefix, rank) / rank
        out[f"{prefix}.weight"] = (duo["down"], duo["up"], scale)
    return out


def merge(model_path, lora_path, out_path, lora_scale=1.0, subfolder="transformer"):
    from safetensors import safe_open
    from safetensors.numpy import save_file

    lora = load_lora(lora_path)
    print(f"loaded {len(lora)} lora pairs")

    src_dir = os.path.join(model_path, subfolder)
    if not os.path.isdir(src_dir):
        src_dir = model_path
    os.makedirs(out_path, exist_ok=True)

    merged_names = set()
    for f in find_safetensors(src_dir):
        out_tensors = {}
        with safe_open(f, framework="numpy") as sf:
            for name in sf.keys():
                w = sf.get_tensor(name)
                if name in lora:
                    down, up, scale = lora[name]
                    w32 = _to_np(w).astype(np.float32)
                    delta = (up.astype(np.float32) @ down.astype(np.float32))
                    w32 += lora_scale * scale * delta
                    w = w32.astype(_to_np(w).dtype)
                    merged_names.add(name)
                out_tensors[name] = np.ascontiguousarray(_to_np(w))
        dst = os.path.join(out_path, os.path.basename(f))
        save_file(out_tensors, dst)
        print(f"wrote {dst} ({len(out_tensors)} tensors)")

    # copy sidecar files (config.json, index) so the dir stays loadable
    for name in os.listdir(src_dir):
        if name.endswith((".json",)):
            shutil.copy(os.path.join(src_dir, name), os.path.join(out_path, name))

    unmatched = set(lora) - merged_names
    if unmatched:
        print(f"warning: {len(unmatched)} lora weights had no base tensor, e.g. "
              f"{sorted(unmatched)[:5]}")
    print(f"merged {len(merged_names)}/{len(lora)} lora weights")


def main():
    parser = argparse.ArgumentParser("merge lora into base safetensors",
                                     conflict_handler="resolve")
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--lora-path", required=True)
    parser.add_argument("--merged-model-path", default=None)
    parser.add_argument("--lora-scale", type=float, default=1.0)
    parser.add_argument("--subfolder", default="transformer",
                        help="model subdir holding the denoiser weights")
    args = parser.parse_args()
    out = args.merged_model_path or f"{args.model_path}-lora-merged"
    merge(args.model_path, args.lora_path, out, args.lora_scale, args.subfolder)


if __name__ == "__main__":
    main()
