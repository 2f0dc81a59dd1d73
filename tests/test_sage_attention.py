"""SageAttention-style int8-QK flash attention accuracy vs fp reference."""

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.kernels.pallas.attention import _flash_attention


def _ref(q, k, v, d):
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * d**-0.5
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


def test_int8_qk_attention_close():
    b, s, h, d = 1, 384, 2, 64
    rng = np.random.default_rng(0)
    q4 = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k4 = rng.standard_normal((b, s, h, d)).astype(np.float32) + 0.7  # nonzero mean
    v4 = rng.standard_normal((b, s, h, d)).astype(np.float32)

    out = _flash_attention(
        jnp.asarray(q4.reshape(b, s, h * d)),
        jnp.asarray(k4.reshape(b, s, h * d)),
        jnp.asarray(v4.reshape(b, s, h * d)),
        None,
        num_q_heads=h, num_kv_heads=h, head_dim=d, is_causal=False, scale=None,
        block_q=128, block_k=128, has_mask=False, int8_qk=True,
    )
    ref = _ref(q4, k4, v4, d).reshape(b, s, h * d)
    err = np.abs(np.asarray(out, np.float32) - ref)
    # int8 QK quantization error budget (ref test tolerance 1.8e-2)
    assert err.max() < 2.5e-2, err.max()
