"""Sparse-attention configs, JSON-compatible with the reference
(ref: fastdm/sparse/config.py — same keys, e.g. examples/sparse/radial_attn_wan.json)."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Type


@dataclasses.dataclass(frozen=True)
class SparseConfig:
    sparse_algorithm: str = "radial"
    block_size: int = 128
    dense_layers: int = 0
    dense_steps: int = 0

    _registry: Dict[str, Type["SparseConfig"]] = None

    @classmethod
    def register(cls, name: str):
        def deco(sub):
            if SparseConfig._registry is None:
                SparseConfig._registry = {}
            SparseConfig._registry[name.lower()] = sub
            return sub

        return deco

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "SparseConfig":
        algo = data.get("sparse_algorithm", "radial")
        target = (SparseConfig._registry or {}).get(algo.lower(), cls)
        names = {f.name for f in dataclasses.fields(target) if not f.name.startswith("_")}
        return target(**{k: v for k, v in data.items() if k in names})

    @classmethod
    def from_json(cls, path: str) -> "SparseConfig":
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))


@SparseConfig.register("radial")
@dataclasses.dataclass(frozen=True)
class RadialAttnConfig(SparseConfig):
    """(ref: fastdm/sparse/config.py RadialAttnConfig)"""

    decay_factor: float = 1.0
    model_type: str = "wan"  # wan | hunyuan
