"""Block-sparse attention subsystems (radial attention for long video)."""

from fastdm_tpu.sparse.config import RadialAttnConfig, SparseConfig  # noqa: F401
from fastdm_tpu.sparse.xsparse import SparseAttn, radial_block_mask  # noqa: F401
