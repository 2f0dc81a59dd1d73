"""Kernel registry: op-name -> {backend-name -> impl}.

Plays the role of the reference registry (fastdm/kernel/registry.py:5-59) but for
JAX: backends are selected at *trace time* (everything downstream is jitted), so
the selection knob is an env var / set_global_backend call read when the op is
traced, not a per-call device dispatch.

Backends:
  "jnp"    — pure jax.numpy implementations compiled by XLA. Runs anywhere
             (CPU/TPU); serves as the numerical oracle for tests, like the
             reference's torch backend.
  "pallas" — hand-written Pallas TPU kernels for the hot ops.
  "auto"   — (default) pallas on TPU, jnp elsewhere; per-op fallback to jnp
             when no pallas impl is registered.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Dict

import jax

_ENV_KEY = "FASTDM_KERNEL_BACKEND"
_VALID = ("jnp", "pallas", "auto")


class KernelRegistry:
    def __init__(self) -> None:
        self._ops: Dict[str, Dict[str, Callable]] = {}

    def register(self, op_name: str, backend: str) -> Callable:
        def deco(fn: Callable) -> Callable:
            self._ops.setdefault(op_name, {})[backend] = fn
            return fn

        return deco

    # Measured-on-TPU auto policy (examples/profiling/tpu_kernel_smoke.py):
    # XLA's native int8 dot beats the pallas matmul at flux shapes (154 vs
    # 112 TOPS) and fuses the dequant epilogue itself, while pallas flash
    # attention is 2.4x XLA's unfused attention. "auto" routes accordingly;
    # FASTDM_KERNEL_BACKEND=pallas forces pallas everywhere (for benchmarks).
    # qk_norm_rope: composed XLA-side, the rope interleave is a fusion
    # boundary that materializes full-tensor f32 q/k in HBM (the A14B
    # compile-OOM, 2026-08-20) and triples the q/k elementwise HBM traffic;
    # the fused VMEM kernel removes both.
    _AUTO_PALLAS_OPS = ("sdpa", "sdpa_sparse", "sdpa_gather",
                        "sdpa_gather_fine", "sdpa_gather_super",
                        "qk_norm_rope", "qk_norm_rope2")

    def backend_for(self, op_name: str, force_backend: str | None = None) -> str:
        choice = force_backend or os.environ.get(_ENV_KEY, "auto")
        if choice not in _VALID:
            raise ValueError(f"invalid kernel backend {choice!r}; expected one of {_VALID}")
        impls = self._ops.get(op_name, {})
        if choice == "auto":
            if op_name == "sdpa" and "ring" in impls:
                # an active sequence-parallel mesh overrides the single-chip
                # choice: attention must run as a ring over the sp axis
                # (engine sets this when mesh_shape has sp > 1)
                try:
                    from fastdm_tpu.parallel import cp_state

                    if cp_state.get_cp_mesh() is not None:
                        return "ring"
                except ImportError:
                    pass
            if (
                "pallas" in impls
                and jax.default_backend() == "tpu"
                and op_name in self._AUTO_PALLAS_OPS
            ):
                return "pallas"
            return "jnp"
        if choice == "pallas" and "pallas" not in impls:
            return "jnp"  # graceful degradation, mirrors reference fallback-to-torch
        return choice

    def select(self, op_name: str, force_backend: str | None = None) -> Callable:
        impls = self._ops.get(op_name)
        if not impls:
            raise KeyError(f"no implementations registered for op {op_name!r}")
        backend = self.backend_for(op_name, force_backend)
        try:
            return impls[backend]
        except KeyError:
            raise KeyError(
                f"op {op_name!r} has no {backend!r} backend (have {sorted(impls)})"
            ) from None

    def dispatch(self, op_name: str, force_backend: str | None = None) -> Callable:
        """Decorator turning an interface stub into a dispatching call."""

        def deco(stub: Callable) -> Callable:
            @functools.wraps(stub)
            def wrapper(*args, **kwargs):
                return self.select(op_name, force_backend)(*args, **kwargs)

            wrapper.op_name = op_name
            return wrapper

        return deco


kernel_registry = KernelRegistry()


def set_global_backend(backend: str) -> None:
    """Set the process-wide kernel backend (ref: fastdm/kernel/utils.py:11-15)."""
    if backend not in _VALID:
        raise ValueError(f"invalid kernel backend {backend!r}; expected one of {_VALID}")
    os.environ[_ENV_KEY] = backend


def get_global_backend() -> str:
    return os.environ.get(_ENV_KEY, "auto")
