"""Shared harness for golden-parity tests against the torch reference.

Stubs the reference's cuda/triton dependencies so its torch backend runs on
CPU, and repoints its hardcoded "cuda" device fields at the cpu.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def stub_reference_deps():
    import torch

    # pre-import transformers BEFORE the fake triton lands in sys.modules:
    # its import-time probe (importlib.util.find_spec("triton")) raises
    # ValueError on a stub with __spec__=None, and advertising a spec sends
    # torch._inductor chasing real triton submodules — so let the probe run
    # against the true environment once, then stub freely
    try:
        import transformers  # noqa: F401
    except Exception:
        pass

    if "triton" not in sys.modules:
        class _Anything:
            def __call__(self, *a, **k):
                if len(a) == 1 and callable(a[0]) and not k:
                    return a[0]
                return _Anything()

            def __getattr__(self, name):
                return _Anything()

        triton = types.ModuleType("triton")
        triton.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
        triton.autotune = lambda *a, **k: (lambda f: f)
        triton.heuristics = lambda *a, **k: (lambda f: f)

        def _config(*a, **k):
            c = _Anything()
            c.kwargs = a[0] if a and isinstance(a[0], dict) else dict(k)
            return c

        triton.Config = _config
        triton.cdiv = lambda a, b: -(-a // b)
        triton.__path__ = []

        def _mod_getattr(name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _Anything()

        triton.__getattr__ = _mod_getattr
        tl = types.ModuleType("triton.language")
        tl.constexpr = int
        tl.__getattr__ = _mod_getattr
        triton.language = tl
        sys.modules["triton"] = triton
        sys.modules["triton.language"] = tl
        # torch._inductor probes has_triton_package() lazily; with the stub
        # importable it returns True and then chases triton.backends.* —
        # pin torch's answer to False before inductor modules import it
        try:
            import torch.utils._triton as _tu

            _tu.has_triton_package = lambda: False
            _tu.has_triton = lambda *a, **k: False
        except Exception:
            pass
    if "fastdm.cuda_ops" not in sys.modules:
        sys.modules["fastdm.cuda_ops"] = types.ModuleType("fastdm.cuda_ops")
    torch.cuda.get_device_capability = lambda *a, **k: (8, 0)
    torch.cuda.get_device_properties = lambda *a, **k: types.SimpleNamespace(
        total_memory=1 << 36
    )
    torch.cuda.device_count = lambda: 0
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import os

    os.environ["KERNEL_BACKEND"] = "torch"

    # the reference force-pins gelu_and_mul to its triton backend
    # (operators_set.py:54); alias the torch impl under the 'triton' slot so
    # SDXL FeedForward runs on CPU
    try:
        from fastdm.kernel.registry import kernel_registry as _reg
        import fastdm.kernel.torch_ops  # noqa: F401  (registers torch impls)
    except Exception:
        try:
            from fastdm.kernel.registry import kernel_registry as _reg
            import fastdm.kernel.torch  # noqa: F401
        except Exception:
            _reg = None
    if _reg is not None:
        gm = _reg._registry.get("gelu_and_mul", {})
        if "torch" in gm:
            gm["triton"] = gm["torch"]


def to_cpu(obj, seen=None):
    """Repoint every .device field in a reference core at the cpu."""
    import torch

    seen = set() if seen is None else seen
    if id(obj) in seen:
        return
    seen.add(id(obj))
    if isinstance(obj, (list, tuple)):
        for x in obj:
            to_cpu(x, seen)
        return
    if not hasattr(obj, "__dict__"):
        return
    if hasattr(obj, "device"):
        obj.device = "cpu"
    for v in list(vars(obj).values()):
        if isinstance(v, (list, tuple)) or (
            hasattr(v, "__dict__") and not isinstance(v, torch.Tensor)
        ):
            to_cpu(v, seen)


def lin(sd: dict, rng, name: str, k: int, n: int, bias: bool = True, std=0.04):
    sd[f"{name}.weight"] = rng.standard_normal((n, k)).astype(np.float32) * std
    if bias:
        sd[f"{name}.bias"] = rng.standard_normal((n,)).astype(np.float32) * 0.02


def rel_err(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.abs(a - b).mean() / max(np.abs(b).mean(), 1e-3))
