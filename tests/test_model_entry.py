"""Model factory (create_model / MODEL_REGISTRY) surface."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_create_model_random_and_forward():
    from fastdm_tpu.model_entry import create_model

    cfg, params, fwd = create_model(
        "flux", quant="int8",
        num_layers=1, num_single_layers=1, attention_head_dim=32,
        num_attention_heads=2, joint_attention_dim=32, pooled_projection_dim=16,
        in_channels=8, out_channels=8, axes_dims_rope=(8, 12, 12),
    )
    from fastdm_tpu.models.flux import flux_rope_cache

    cos, sin = flux_rope_cache(cfg, 8, 4, 4)
    k = jax.random.key(0)
    out = fwd(params, cfg,
              jax.random.normal(k, (1, 16, 8), jnp.bfloat16),
              jax.random.normal(k, (1, 8, 32), jnp.bfloat16),
              jax.random.normal(k, (1, 16), jnp.bfloat16),
              jnp.full((1,), 0.5, jnp.float32), cos, sin,
              guidance=jnp.full((1,), 3.5, jnp.float32))
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_create_model_from_checkpoint(tmp_path):
    import json
    import os
    import sys

    from safetensors.numpy import save_file

    sys.path.insert(0, os.path.dirname(__file__))
    from test_golden_flux import TINY, _synthetic_state_dict

    from fastdm_tpu.model_entry import create_model

    sd = _synthetic_state_dict(TINY, np.random.default_rng(0))
    save_file(sd, str(tmp_path / "model.safetensors"))
    cfg, params, fwd = create_model("flux-dev", ckpt_path=str(tmp_path),
                                    quant="int8", **TINY)
    assert params["dual_blocks"]["attn"]["qkv"]["w"].dtype == jnp.int8


def test_create_model_errors():
    from fastdm_tpu.model_entry import create_model

    with pytest.raises(ValueError, match="unknown architecture"):
        create_model("sd15")
