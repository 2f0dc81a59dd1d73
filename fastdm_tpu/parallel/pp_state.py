"""Process-wide pipeline-parallel state.

When an engine activates a mesh whose "pp" axis is > 1, the model cores'
block runners (models/flux.py flux_run_blocks, ...) route the stacked-layer
scan through the GPipe schedule (parallel/pipeline.py gpipe_run_blocks)
instead of the sequential `lax.scan`. Mirrors parallel/cp_state.py: a tiny
module of its own so models/ need not import parallel/ at module load.

Scoping: the engine sets the mesh only for the duration of its own
generate() (save/restore), so a second, unsharded engine in the same
process is unaffected.
"""

from __future__ import annotations

_mesh = None
_axis = "pp"


def set_pp_mesh(mesh, axis_name: str = "pp") -> None:
    """Activate (or with None, deactivate) pipeline-parallel block runs."""
    global _mesh, _axis
    _mesh = mesh
    _axis = axis_name


def get_pp_mesh():
    return _mesh


def get_pp_axis() -> str:
    return _axis
