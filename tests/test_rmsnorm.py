"""RMSNorm accuracy incl. per-head weight reshape invariance (ref tests/test_rmsnorm.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastdm_tpu.kernels import rms_norm

SHAPES_3D = [(2, 1024, 3072), (1, 333, 1280)]


def _ref(x, w, eps):
    x64 = x.astype(np.float64)
    var = (x64**2).mean(-1, keepdims=True)
    y = x64 / np.sqrt(var + eps)
    if w is not None:
        y = y * w.astype(np.float64)
    return y


@pytest.mark.parametrize("shape", SHAPES_3D)
def test_rmsnorm_3d(shape):
    rng = np.random.default_rng(4)
    x = rng.standard_normal(shape, dtype=np.float32)
    w = rng.standard_normal(shape[-1]).astype(np.float32)
    out = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6), np.float64)
    np.testing.assert_allclose(out, _ref(x, w, 1e-6), rtol=2e-5, atol=2e-5)


def test_rmsnorm_per_head_reshape_invariance():
    """weight (D,) on (B,S,H,D) equals weight tile on flattened (B,S,H*D) heads
    (ref: tests/test_rmsnorm.py:40-60)."""
    rng = np.random.default_rng(5)
    b, s, h, d = 1, 64, 24, 128
    x = rng.standard_normal((b, s, h, d), dtype=np.float32)
    w = rng.standard_normal(d).astype(np.float32)
    out4 = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6))
    np.testing.assert_allclose(out4, _ref(x, w, 1e-6), rtol=2e-5, atol=2e-5)


def test_rmsnorm_no_affine():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 77, 768), dtype=np.float32)
    out = np.asarray(rms_norm(jnp.asarray(x), None, 1e-5))
    np.testing.assert_allclose(out, _ref(x, None, 1e-5), rtol=2e-5, atol=2e-5)


def test_rmsnorm_bf16_upcast():
    """bf16 inputs are accumulated in f32 (matches torch backend upcast)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 128, 512), dtype=np.float32) * 30
    xb = jnp.asarray(x, jnp.bfloat16)
    out = np.asarray(rms_norm(xb, None, 1e-6), np.float32)
    ref = _ref(np.asarray(xb, np.float32), None, 1e-6)
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-2)
