"""Pure jax.numpy kernel backend — the numerical oracle.

Compiled by XLA; runs on CPU and TPU. Plays the role of the reference's torch
backend (ref: fastdm/kernel/torch/*.py): every pallas kernel is tested against
these implementations with real-model shapes.
"""

from fastdm_tpu.kernels.jnp_backend import impl  # noqa: F401  (registers ops)
