"""Quantized-snapshot save/load: persist the POST-quantization param pytree.

The reference re-runs checkpoint parsing + qkv fusion + quantization on every
engine start (ref: fastdm/layer/qlinear.py:18-54 inside every
BaseModelCore.weight_loading, basemodel.py:88) — minutes of host work at
FLUX/Wan scale. A snapshot stores the EXACT arrays the denoiser consumes
(int8/fp8/int4 carriers, per-channel scales, colsums, SVDQuant low-rank
branches, packed int4 nibbles, stacked block layouts) as ONE safetensors
file plus a JSON skeleton that rebuilds the pytree bit-identically, so a
reload is a straight mmap -> device copy. TPU-native extension; no reference
counterpart.

Layout of a snapshot directory:
  fastdm_snapshot.json        manifest: arch, quant, config dataclass, and
                              the tree skeleton per saved tree
  <name>.safetensors          tensors for tree <name> ("transformer", ...)

The skeleton mirrors the pytree with dict/list/tuple/None nodes kept as-is
and array leaves replaced by references into the safetensors file, so
load_tree reconstructs the identical structure (jax.tree equality holds).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

MANIFEST = "fastdm_snapshot.json"
_FORMAT_VERSION = 1


def _encode(node, tensors: Dict[str, np.ndarray], path: str):
    """Tree -> JSON skeleton; array leaves land in `tensors` keyed by path."""
    if node is None:
        return {"t": "none"}
    if isinstance(node, dict):
        enc = {}
        for k in sorted(node):
            if not isinstance(k, str) or "/" in k:
                raise ValueError(f"snapshot dict keys must be /-free strings, got {k!r}")
            enc[k] = _encode(node[k], tensors, f"{path}/{k}" if path else k)
        return {"t": "dict", "v": enc}
    if isinstance(node, (list, tuple)):
        return {
            "t": "list" if isinstance(node, list) else "tuple",
            "v": [_encode(x, tensors, f"{path}/{i}") for i, x in enumerate(node)],
        }
    if isinstance(node, (bool, int, float, str)):
        return {"t": "scalar", "v": node}
    if isinstance(node, (jax.Array, np.ndarray)) or np.isscalar(node):
        arr = np.asarray(node)
        if arr.ndim == 0:
            # 0-d shapes don't roundtrip reliably through every safetensors
            # reader; store as (1,) and restore the rank on load
            tensors[path] = arr.reshape(1)
            return {"t": "array0", "name": path}
        tensors[path] = arr
        return {"t": "array", "name": path}
    raise ValueError(f"unsupported snapshot node type {type(node)} at {path!r}")


def _decode(skel, tensors: Dict[str, np.ndarray]):
    t = skel["t"]
    if t == "none":
        return None
    if t == "dict":
        return {k: _decode(v, tensors) for k, v in skel["v"].items()}
    if t in ("list", "tuple"):
        seq = [_decode(v, tensors) for v in skel["v"]]
        return seq if t == "list" else tuple(seq)
    if t == "scalar":
        return skel["v"]
    if t in ("array", "array0"):
        # jnp.asarray places on the current default device (host in the wan
        # offload path, accelerator otherwise) preserving dtype exactly
        arr = tensors[skel["name"]]
        if t == "array0":
            arr = np.asarray(arr).reshape(())
        return jnp.asarray(arr)
    raise ValueError(f"bad snapshot skeleton node {t!r}")


# Config fields that tune RUNTIME execution only — they never change the
# weight tree a snapshot stores, so they must not invalidate it (the engine
# replaces them per-generate: sparse tile shapes, dense warmup, FFN chunking).
_RUNTIME_ONLY_FIELDS = frozenset({
    "dense_layers", "sparse_gather_blocks", "sparse_gather_fine_blocks",
    "sparse_gather_superblock", "ffn_chunk_tokens", "split_qkv_proj",
})


def _cfg_fingerprint(cfg) -> Any:
    """JSON-normalized dataclass dict (tuples -> lists) for exact compare,
    minus runtime-only tuning fields (see _RUNTIME_ONLY_FIELDS)."""
    if cfg is None:
        return None
    d = {k: v for k, v in dataclasses.asdict(cfg).items()
         if k not in _RUNTIME_ONLY_FIELDS}
    return json.loads(json.dumps(d))


def save_snapshot(
    dir_path: str,
    trees: Dict[str, Any],
    *,
    architecture: Optional[str] = None,
    quant: Optional[str] = None,
    cfg=None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Write `trees` ({"transformer": params, ...}) + manifest to dir_path."""
    from fastdm_tpu.native.safetensors_io import write_safetensors

    os.makedirs(dir_path, exist_ok=True)
    manifest = {
        "format_version": _FORMAT_VERSION,
        "architecture": architecture,
        "quant": quant,
        "config_class": type(cfg).__name__ if cfg is not None else None,
        "config": _cfg_fingerprint(cfg),
        "extra": extra or {},
        "trees": {},
    }
    for name, tree in trees.items():
        tensors: Dict[str, np.ndarray] = {}
        skel = _encode(tree, tensors, "")
        manifest["trees"][name] = skel
        write_safetensors(
            os.path.join(dir_path, f"{name}.safetensors"), tensors,
            metadata={"fastdm_snapshot": name},
        )
    tmp = os.path.join(dir_path, MANIFEST + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(dir_path, MANIFEST))


def source_fingerprint(model_path: Optional[str]):
    """Cheap content fingerprint of a checkpoint dir's weight files:
    sorted [[relpath, size, mtime_ns], ...]. Recorded in the snapshot
    manifest at save time and re-checked at load time so a snapshot built
    from different weights (or a checkpoint updated in place at the same
    path) is rejected instead of silently served. None when model_path is
    not a directory or holds no weight files (synthetic/in-memory sources)."""
    if not model_path or not os.path.isdir(model_path):
        return None
    out = []
    for root, _, names in os.walk(model_path):
        for n in names:
            if n.endswith((".safetensors", ".bin")):
                p = os.path.join(root, n)
                st = os.stat(p)
                out.append([os.path.relpath(p, model_path).replace(os.sep, "/"),
                            st.st_size, st.st_mtime_ns])
    return sorted(out) or None


def is_snapshot(dir_path: str) -> bool:
    return os.path.isfile(os.path.join(dir_path, MANIFEST))


def load_manifest(dir_path: str) -> Dict[str, Any]:
    with open(os.path.join(dir_path, MANIFEST), "r", encoding="utf-8") as f:
        m = json.load(f)
    if m.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"snapshot format {m.get('format_version')} != {_FORMAT_VERSION}")
    return m


def load_tree(dir_path: str, name: str, manifest: Optional[Dict] = None):
    """Rebuild one saved tree; arrays land on the current default device."""
    from fastdm_tpu.native.safetensors_io import read_safetensors

    manifest = manifest or load_manifest(dir_path)
    if name not in manifest["trees"]:
        raise KeyError(
            f"snapshot has no tree {name!r}; available: "
            f"{sorted(manifest['trees'])}")
    tensors = read_safetensors(os.path.join(dir_path, f"{name}.safetensors"))
    return _decode(manifest["trees"][name], tensors)


def check_compatible(manifest: Dict[str, Any], *, architecture: str,
                     quant: Optional[str], cfg) -> None:
    """Raise if a snapshot was built for a different arch/quant/config —
    a stale snapshot must never silently serve wrong weights."""
    want = {
        "architecture": architecture,
        "quant": quant,
        "config_class": type(cfg).__name__ if cfg is not None else None,
        "config": _cfg_fingerprint(cfg),
    }
    have = {k: manifest.get(k) for k in want}
    if isinstance(have.get("config"), dict):
        # manifests written before a runtime-only field existed (or with its
        # old value) stay valid — the weights are identical either way
        have["config"] = {k: v for k, v in have["config"].items()
                          if k not in _RUNTIME_ONLY_FIELDS}
    if have != want:
        diffs = []
        for k in want:
            if have[k] != want[k]:
                if k == "config" and isinstance(want[k], dict) and isinstance(have[k], dict):
                    fields = sorted(set(want[k]) | set(have[k]))
                    inner = [f"{f}: snapshot={have[k].get(f)!r} vs engine={want[k].get(f)!r}"
                             for f in fields if have[k].get(f) != want[k].get(f)]
                    diffs.append(f"config[{', '.join(inner)}]")
                else:
                    diffs.append(f"{k}: snapshot={have[k]!r} vs engine={want[k]!r}")
        raise ValueError(
            "quantized snapshot is incompatible with this engine config — "
            "rebuild it (delete the snapshot dir) or fix the flags: "
            + "; ".join(diffs))
