"""Kernel layer: registry + dispatched ops + backends."""

from fastdm_tpu.kernels.registry import (  # noqa: F401
    get_global_backend,
    kernel_registry,
    set_global_backend,
)

# Importing backends registers their implementations.
import fastdm_tpu.kernels.jnp_backend  # noqa: F401, E402

try:  # pallas backend needs a TPU-capable jaxlib; import is best-effort
    import fastdm_tpu.kernels.pallas  # noqa: F401, E402
except ImportError:  # pragma: no cover
    pass

from fastdm_tpu.kernels.ops import (  # noqa: F401, E402
    fp8_matmul,
    gelu_and_mul,
    int4_matmul,
    int8_matmul,
    quantize_to_fp8,
    quantize_to_int4,
    quantize_to_int8,
    qk_norm_rope,
    qk_norm_rope2,
    rms_norm,
    rotary_pos_embedding,
    scaled_dot_product_attention,
    gather_fine_attention,
    gather_sparse_attention,
    gather_super_attention,
    sparse_scaled_dot_product_attention,
)
