"""Pallas TPU kernel backend.

Hand-written TPU kernels for the hot ops, registered as backend "pallas".
Ops without a pallas implementation fall back to the jnp backend (the
registry handles this), so this package only registers what it accelerates.
"""

from fastdm_tpu.kernels.pallas import attention  # noqa: F401
from fastdm_tpu.kernels.pallas import matmul  # noqa: F401
from fastdm_tpu.kernels.pallas import elementwise  # noqa: F401
