"""W8A8 scaled-matmul accuracy: pallas vs jnp oracle vs float emulation.

Mirrors the reference's cross-backend pattern (tests/test_matmul.py): the jnp
backend is the oracle (= torch backend role); the pallas kernels must match it.
Shapes are real model projections (ref tests/test_matmul.py:5-44 subset).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdm_tpu.kernels import quantize_to_fp8, quantize_to_int8
from fastdm_tpu.kernels.jnp_backend.impl import (
    fp8_matmul_jnp,
    int8_matmul_jnp,
    quantize_to_int8_jnp,
)
from fastdm_tpu.kernels.pallas.matmul import fp8_matmul_pallas, int8_matmul_pallas

# (M, K, N): flux qkv / ff, sdxl, qwen projections. Full flux-size shapes run
# under the jnp oracle (fast XLA); pallas kernels run interpreted on CPU, so
# they get structure-preserving smaller shapes (full size exercised on TPU).
SHAPES = {
    "jnp": [(4608, 3072, 9216), (1024, 640, 640), (333, 2048, 512)],
    "pallas": [(512, 1024, 768), (333, 640, 512), (77, 768, 320)],
}


def _quant_weight_int8(w):
    # per-output-channel symmetric (ref: QLinear.weight_loading_and_quant)
    s = np.abs(w).max(0, keepdims=True) / 127.0
    q = np.clip(np.round(w / s), -128, 127).astype(np.int8)
    return q, s.astype(np.float32)


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
@pytest.mark.parametrize("case", [0, 1, 2])
def test_int8_matmul_asym(case, impl):
    m, k, n = SHAPES[impl][case]
    rng = np.random.default_rng(2)
    x = rng.standard_normal((m, k), dtype=np.float32)
    w = rng.standard_normal((k, n), dtype=np.float32) * 0.02
    bias = rng.standard_normal((n,), dtype=np.float32) * 0.1

    wq, ws = _quant_weight_int8(w)
    colsum = wq.astype(np.int32).sum(0)

    xq, xs, xzp = quantize_to_int8(jnp.asarray(x), symmetric=False)
    fn = int8_matmul_jnp if impl == "jnp" else int8_matmul_pallas
    out = fn(
        xq, jnp.asarray(wq), xs, jnp.asarray(ws), jnp.float32,
        jnp.asarray(colsum), xzp, jnp.asarray(bias),
    )
    ref = x @ w + bias  # float reference; quantization error budget below
    out = np.asarray(out)
    # int8 W8A8 error: per-element tolerance scales with row/col magnitudes
    denom = np.maximum(np.abs(ref), np.sqrt(k) * 0.06)
    rel = np.abs(out - ref) / denom
    assert np.percentile(rel, 99.9) < 0.05, f"p99.9 rel err {np.percentile(rel, 99.9)}"

    # and pallas must match jnp near-exactly (same int32 accumulation)
    if impl == "pallas":
        ref_jnp = np.asarray(
            int8_matmul_jnp(
                xq, jnp.asarray(wq), xs, jnp.asarray(ws), jnp.float32,
                jnp.asarray(colsum), xzp, jnp.asarray(bias),
            )
        )
        np.testing.assert_allclose(out, ref_jnp, rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
@pytest.mark.parametrize("case", [1, 2])
def test_fp8_matmul(case, impl):
    m, k, n = SHAPES[impl][case]
    rng = np.random.default_rng(3)
    x = rng.standard_normal((m, k), dtype=np.float32)
    w = rng.standard_normal((k, n), dtype=np.float32) * 0.02

    # per-channel fp8 weight quant
    ws = (np.abs(w).max(0, keepdims=True) / 448.0).astype(np.float32)
    wq = jnp.asarray(w / ws, jnp.float8_e4m3fn)

    xq, xs = quantize_to_fp8(jnp.asarray(x))
    fn = fp8_matmul_jnp if impl == "jnp" else fp8_matmul_pallas
    out = np.asarray(fn(xq, wq, xs, jnp.asarray(ws), jnp.float32, None))
    ref = x @ w
    denom = np.maximum(np.abs(ref), np.sqrt(k) * 0.06)
    rel = np.abs(out - ref) / denom
    assert np.percentile(rel, 99.9) < 0.1, f"p99.9 rel err {np.percentile(rel, 99.9)}"

    if impl == "pallas":
        ref_jnp = np.asarray(
            fp8_matmul_jnp(xq, wq, xs, jnp.asarray(ws), jnp.float32, None)
        )
        np.testing.assert_allclose(out, ref_jnp, rtol=2e-2, atol=1e-3)
