"""Per-token quantization accuracy (ref test: tests/test_quant.py).

Oracle = straightforward float64 numpy reimplementation of the quantization
math (ref: fastdm/utils/quantization.py:5-63).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdm_tpu.kernels import quantize_to_fp8, quantize_to_int8

# subset of the reference's 47 real-model activation shapes (tests/test_quant.py:5-49)
SHAPES = [
    (4608, 3072),   # flux joint seq x hidden
    (4096, 640),    # sdxl
    (1024, 1280),
    (333, 2048),    # ragged token count
    (77, 768),      # clip text
    (8, 128),
    (4110, 3584),   # qwen
]


def _ref_int8(x, symmetric):
    x = x.astype(np.float64)
    row_min, row_max = x.min(-1, keepdims=True), x.max(-1, keepdims=True)
    if symmetric:
        scale = np.maximum(np.maximum(np.abs(row_min), np.abs(row_max)), 1e-12) / 127.0
        q = np.clip(np.round(x / scale), -128, 127).astype(np.int8)
        return q, scale, None
    scale = np.maximum(row_max - row_min, 1e-12) / 255.0
    zp = (-128.0 - np.round(row_min / scale)).astype(np.int32)
    q = np.clip(np.round(x / scale) + zp, -128, 127).astype(np.int8)
    return q, scale, zp


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("symmetric", [True, False])
def test_int8_quant(shape, symmetric):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape, dtype=np.float32) * 3.0
    q, s, zp = jax.jit(quantize_to_int8, static_argnames="symmetric")(
        jnp.asarray(x, jnp.bfloat16), symmetric=symmetric
    )
    x_bf16 = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    q_ref, s_ref, zp_ref = _ref_int8(x_bf16, symmetric)
    np.testing.assert_allclose(np.asarray(s).squeeze(), s_ref.squeeze(), rtol=1e-5)
    # rounding of values exactly on .5 boundaries may differ by 1 ulp
    assert np.mean(np.abs(np.asarray(q, np.int32) - q_ref.astype(np.int32)) > 1) < 1e-3
    if not symmetric:
        np.testing.assert_allclose(np.asarray(zp).squeeze(), zp_ref.squeeze(), atol=1)
    # dequantization round-trip error bounded by scale/2 per element
    deq = np.asarray(q, np.float32)
    if zp is not None:
        deq = deq - np.asarray(zp, np.float32)
    deq = deq * np.asarray(s, np.float32)
    assert np.max(np.abs(deq - x_bf16)) <= np.max(s_ref) * 1.01


@pytest.mark.parametrize("shape", SHAPES)
def test_fp8_quant(shape):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(shape, dtype=np.float32)
    q, s = jax.jit(quantize_to_fp8)(jnp.asarray(x, jnp.bfloat16))
    assert q.dtype == jnp.float8_e4m3fn
    x_bf16 = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    deq = np.asarray(q, np.float32) * np.asarray(s, np.float32)
    # e4m3 relative error ~2^-3 at worst plus per-token scaling
    err = np.abs(deq - x_bf16)
    tol = np.abs(x_bf16) * 0.07 + np.asarray(s, np.float32) * 0.6
    assert np.all(err <= tol)


def test_fuse_and_quantize_mixed_biases():
    """A fused projection where only SOME segments carry a bias must
    zero-fill the missing ones, not drop or crash (review finding)."""
    import jax.numpy as jnp
    import numpy as np

    from fastdm_tpu.layers.qlinear import fuse_and_quantize, qlinear_apply

    rng = np.random.default_rng(0)
    k, n1, n2 = 16, 8, 12
    w1 = jnp.asarray(rng.standard_normal((k, n1)), jnp.float32) * 0.1
    w2 = jnp.asarray(rng.standard_normal((k, n2)), jnp.float32) * 0.1
    b = jnp.asarray(rng.standard_normal((n2,)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, k)), jnp.bfloat16)
    for first_none in (True, False):
        biases = [None, b] if first_none else [b[:n1], None]
        p = fuse_and_quantize([w1, w2], biases, "int8")
        assert p["bias"].shape == (n1 + n2,)
        out = np.asarray(qlinear_apply(p, x), np.float32)
        bias_full = np.concatenate(
            [np.zeros(n1), np.asarray(b)] if first_none
            else [np.asarray(b[:n1]), np.zeros(n2)])
        ref = (np.asarray(x, np.float32)
               @ np.asarray(jnp.concatenate([w1, w2], axis=1)) + bias_full)
        np.testing.assert_allclose(out, ref, atol=0.05)
