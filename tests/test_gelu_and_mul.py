"""gelu_and_mul: x[..., :d] * GELU(x[..., d:]) (ref tests/test_gelu_and_mul.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import erf

from fastdm_tpu.kernels import gelu_and_mul


@pytest.mark.parametrize("shape", [(1024, 2560), (2, 333, 1280)])
def test_gelu_and_mul(shape):
    rng = np.random.default_rng(9)
    x = rng.standard_normal(shape, dtype=np.float32) * 2
    out = np.asarray(gelu_and_mul(jnp.asarray(x)))
    d = shape[-1] // 2
    gate = x[..., d:]
    ref = x[..., :d] * (gate * 0.5 * (1 + erf(gate / np.sqrt(2))))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
