"""Checkpoint loading utilities (ref: fastdm/model/basemodel.py).

Loads diffusers-format safetensors (or an in-memory dict of arrays) into
QLinear/raw-tensor pytrees, with the reference's two key behaviors preserved:

  * fused projections: qkv / kv weights are concatenated along the output
    dimension before quantization (ref: fastdm/layer/qlinear.py:18-31),
  * exhaustive consumption: every checkpoint tensor must be claimed exactly
    once; leftovers raise (ref: fastdm/model/basemodel.py:127-138).

Checkpoint Linear weights are (out_features, in_features); we transpose to
(in, out) once at load (ref: basemodel.py:51).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.layers.qlinear import fuse_and_quantize

Array = jax.Array


class TensorSource:
    """Dict-like view over checkpoint tensors with consumption tracking."""

    def __init__(self, tensors: Dict[str, np.ndarray]):
        self._tensors = dict(tensors)
        self._unclaimed = set(self._tensors)

    @classmethod
    def from_path(cls, path: str) -> "TensorSource":
        """Load from a .safetensors file or a directory of them.

        Uses the native mmap reader (zero-copy views, no per-tensor copy —
        fastdm_tpu/native/safetensors_reader.cpp); falls back to the
        `safetensors` package when the native library can't build."""
        from fastdm_tpu.native.safetensors_io import read_safetensors

        return cls(read_safetensors(path))

    def __contains__(self, name: str) -> bool:
        return name in self._tensors

    def keys(self):
        return self._tensors.keys()

    def take(self, name: str) -> np.ndarray:
        if name not in self._tensors:
            raise KeyError(f"checkpoint tensor {name!r} not found")
        self._unclaimed.discard(name)
        return self._tensors[name]

    def tensor(self, name: str, dtype=jnp.bfloat16) -> Array:
        """Claim a raw (norm/conv/table) tensor."""
        return jnp.asarray(_to_np(self.take(name)), dtype)

    def linear(self, prefix: str, quant: Optional[str]) -> Dict[str, Array]:
        """Claim '{prefix}.weight' (+ optional bias) as a QLinear param dict."""
        return self.fused_linear([prefix], quant)

    def fused_linear(self, prefixes: Sequence[str], quant: Optional[str]) -> Dict[str, Array]:
        """Claim several projections and fuse them along the output dim.

        int8/fp8 weights are quantized HOST-SIDE by the native C++ kernels
        (fastdm_tpu/native) so only 1 byte/param crosses the host->device
        link; falls back to on-device quantization when the native lib is
        unavailable."""
        raw_ws, bs = [], []
        for p in prefixes:
            raw_ws.append(_to_np(self.take(f"{p}.weight")))  # (out, in)
            bname = f"{p}.bias"
            bs.append(
                jnp.asarray(_to_np(self.take(bname)), jnp.float32)
                if bname in self else None
            )
        if any(b is None for b in bs):
            assert all(b is None for b in bs), f"mixed bias presence in {prefixes}"
            bias = None
        else:
            bias = bs[0] if len(bs) == 1 else jnp.concatenate(bs, axis=0)

        if quant in ("int8", "fp8"):
            try:
                from fastdm_tpu import native

                if native.get_lib() is not None:
                    w_ck = raw_ws[0] if len(raw_ws) == 1 else np.concatenate(raw_ws, 0)
                    params: Dict[str, Array] = {}
                    if quant == "int8":
                        q, scale, colsum = native.quantize_int8_percol(w_ck)
                        params["w"] = jnp.asarray(np.ascontiguousarray(q.T))
                        params["scale"] = jnp.asarray(scale)
                        params["colsum"] = jnp.asarray(colsum)
                    else:
                        import ml_dtypes

                        if w_ck.dtype != ml_dtypes.bfloat16:
                            w_ck = w_ck.astype(ml_dtypes.bfloat16)
                        qb, scale = native.quantize_fp8_percol(w_ck)
                        params["w"] = jnp.asarray(
                            np.ascontiguousarray(qb.T).view(ml_dtypes.float8_e4m3fn)
                        )
                        params["scale"] = jnp.asarray(scale)
                    if bias is not None:
                        params["bias"] = bias.astype(jnp.bfloat16)
                    return params
            except Exception:
                pass  # fall through to the on-device path

        ws = [jnp.asarray(w.T, jnp.float32) for w in raw_ws]
        bs2 = [bias] if bias is not None else [None]
        return fuse_and_quantize(ws, bs2, quant)

    def assert_consumed(self) -> None:
        """Every checkpoint tensor must have been claimed (ref: basemodel.py:138)."""
        if self._unclaimed:
            sample = sorted(self._unclaimed)[:10]
            raise ValueError(
                f"{len(self._unclaimed)} checkpoint tensors were never consumed, "
                f"e.g. {sample}"
            )


def _to_np(x) -> np.ndarray:
    arr = np.asarray(x)
    if arr.dtype == np.dtype("V2"):  # bfloat16 void view from safetensors-numpy
        import ml_dtypes

        arr = arr.view(ml_dtypes.bfloat16)
    return arr


def stack_blocks(blocks: Sequence) -> object:
    """Stack N identical per-block pytrees into one pytree with a leading
    layer axis — the lax.scan-ready layout for the transformer block stack.

    Stacks leaf-by-leaf and DELETES the source buffers as it goes: naive
    jax.tree.map(stack) holds sources + stacked copies simultaneously (2x the
    model, 22GB for FLUX int8 — observed OOM on a 16GB v5e). Consumes the
    input blocks; callers must not reuse them."""
    treedef = jax.tree.structure(blocks[0])
    per_block_leaves = [jax.tree.leaves(b) for b in blocks]
    n_leaves = len(per_block_leaves[0])
    # an array object may back several leaves (e.g. shared rmsnorm ones);
    # only delete it after its LAST use
    last_use = {}
    for i in range(n_leaves):
        for leaves in per_block_leaves:
            last_use[id(leaves[i])] = i
    stacked = []
    concrete = not any(
        isinstance(l, jax.core.Tracer) for l in per_block_leaves[0]
    )
    for i in range(n_leaves):
        srcs = [leaves[i] for leaves in per_block_leaves]
        out = jnp.stack(srcs, axis=0)
        if concrete:  # skip the eager free dance under tracing
            out.block_until_ready()
            for s in srcs:
                if last_use[id(s)] == i and not s.is_deleted():
                    s.delete()
        stacked.append(out)
    return jax.tree.unflatten(treedef, stacked)
