"""Process-wide context-parallel state.

When an engine (or test) activates a mesh whose "sp" axis is > 1, the kernel
registry's auto policy routes dense sdpa to the ring-attention backend
(parallel/context_parallel.py) so attention over the sequence-sharded
activations runs as a ring over ICI instead of forcing a gather. Kept in its
own tiny module to avoid an import cycle between kernels/ and parallel/.
"""

from __future__ import annotations

from typing import Optional

_mesh = None
_axis = "sp"


def set_cp_mesh(mesh, axis_name: str = "sp") -> None:
    """Activate (or with None, deactivate) sequence-parallel attention."""
    global _mesh, _axis
    if mesh is not None:
        # registering the ring backend happens on import
        from fastdm_tpu.parallel import context_parallel  # noqa: F401
    _mesh = mesh
    _axis = axis_name


def get_cp_mesh():
    return _mesh


def get_cp_axis() -> str:
    return _axis
