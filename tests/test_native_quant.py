"""Native C++ quantization vs the jnp oracle (same per-channel math)."""

import numpy as np
import pytest

from fastdm_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native library unavailable (g++ build failed)")
    return l


def test_int8_percol_f32_matches_oracle(lib):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 256)).astype(np.float32) * 0.1
    q, scale, colsum = native.quantize_int8_percol(w)
    amax = np.maximum(np.abs(w).max(1), 1e-12)
    s_ref = amax / 127.0
    np.testing.assert_allclose(scale, s_ref, rtol=1e-6)
    q_ref = np.clip(np.round(w / s_ref[:, None]), -128, 127)
    assert np.mean(np.abs(q.astype(np.int32) - q_ref.astype(np.int32)) > 1) < 1e-3
    np.testing.assert_array_equal(colsum, q.astype(np.int32).sum(1))


def test_int8_percol_bf16(lib):
    import ml_dtypes

    rng = np.random.default_rng(1)
    w = (rng.standard_normal((32, 128)) * 0.05).astype(ml_dtypes.bfloat16)
    q, scale, colsum = native.quantize_int8_percol(w)
    w32 = w.astype(np.float32)
    s_ref = np.maximum(np.abs(w32).max(1), 1e-12) / 127.0
    np.testing.assert_allclose(scale, s_ref, rtol=1e-5)
    deq = q.astype(np.float32) * scale[:, None]
    assert np.abs(deq - w32).max() <= s_ref.max() * 0.51


def test_fp8_percol_bits_roundtrip(lib):
    import ml_dtypes

    rng = np.random.default_rng(2)
    w = (rng.standard_normal((16, 64)) * 0.2).astype(ml_dtypes.bfloat16)
    q_bits, scale = native.quantize_fp8_percol(w)
    q = q_bits.view(ml_dtypes.float8_e4m3fn).astype(np.float32)
    deq = q * scale[:, None]
    w32 = w.astype(np.float32)
    # e4m3 relative error ~6% worst case
    err = np.abs(deq - w32)
    tol = np.abs(w32) * 0.08 + scale[:, None]
    assert np.all(err <= tol)


def test_int8_percol_fp16_checkpoint_not_reinterpreted(lib):
    """fp16 (and f64) arrays must be CONVERTED, never bit-viewed as bf16 —
    fp16's exponent bias differs, so a reinterpret silently corrupts every
    weight (review finding, round 2)."""
    rng = np.random.default_rng(3)
    w32 = (rng.standard_normal((8, 64)) * 0.1).astype(np.float32)
    for dt in (np.float16, np.float64):
        q, scale, colsum = native.quantize_int8_percol(w32.astype(dt))
        w = w32.astype(dt).astype(np.float32)
        s_ref = np.maximum(np.abs(w).max(1), 1e-12) / 127.0
        np.testing.assert_allclose(scale, s_ref, rtol=1e-5)
        deq = q.astype(np.float32) * scale[:, None]
        assert np.abs(deq - w).max() <= s_ref.max() * 0.51


def test_fp8_encode_bit_matches_ml_dtypes(lib):
    """The native e4m3fn encoder must round exactly like ml_dtypes
    (round-to-nearest-even incl. subnormals), or native-vs-jnp-fallback
    loads of the same checkpoint diverge bit-for-bit."""
    import ml_dtypes

    # sweep every bf16 value in [-480, 480] incl. ties and subnormal-range
    # magnitudes once divided by a power-of-two scale
    vals = np.concatenate([
        np.linspace(-480, 480, 4001, dtype=np.float64),
        np.array([448.0, -448.0, 2**-9, 2**-10, 0.75 * 2**-10,
                  1.5 * 2**-9, 2.5 * 2**-9, 3.5 * 2**-9]) * 256.0,
    ]).astype(ml_dtypes.bfloat16)[None, :]
    q_bits, scale = native.quantize_fp8_percol(vals)
    v32 = vals.astype(np.float32)
    clip = np.clip(v32 / scale[:, None], -448.0, 448.0)
    ref_bits = clip.astype(ml_dtypes.float8_e4m3fn).view(np.uint8)
    np.testing.assert_array_equal(q_bits, ref_bits)


def test_quantize_rejects_nonfinite(lib):
    w = np.ones((4, 32), np.float32)
    w[1, 3] = np.nan
    with pytest.raises(ValueError, match="NaN/Inf"):
        native.quantize_int8_percol(w)
    import ml_dtypes

    w8 = np.ones((4, 32), np.float32)
    w8[2, 5] = np.inf
    with pytest.raises(ValueError, match="NaN/Inf"):
        native.quantize_fp8_percol(w8.astype(ml_dtypes.bfloat16))
