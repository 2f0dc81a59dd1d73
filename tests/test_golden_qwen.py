"""Golden parity: our Qwen-Image core vs the reference torch implementation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_harness import lin, rel_err, stub_reference_deps, to_cpu

TINY = dict(
    num_layers=2, attention_head_dim=32, num_attention_heads=2,
    joint_attention_dim=24, in_channels=8, out_channels=2,
    axes_dims_rope=(8, 12, 12),
)


def _state_dict(rng):
    d = TINY["num_attention_heads"] * TINY["attention_head_dim"]
    hd = TINY["attention_head_dim"]
    sd = {}
    lin(sd, rng, "img_in", TINY["in_channels"], d)
    lin(sd, rng, "txt_in", TINY["joint_attention_dim"], d)
    sd["txt_norm.weight"] = (1 + 0.05 * rng.standard_normal(
        TINY["joint_attention_dim"])).astype(np.float32)
    lin(sd, rng, "time_text_embed.timestep_embedder.linear_1", 256, d)
    lin(sd, rng, "time_text_embed.timestep_embedder.linear_2", d, d)
    for i in range(TINY["num_layers"]):
        p = f"transformer_blocks.{i}"
        lin(sd, rng, f"{p}.img_mod.1", d, 6 * d)
        lin(sd, rng, f"{p}.txt_mod.1", d, 6 * d)
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            lin(sd, rng, f"{p}.attn.{nm}", d, d)
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{p}.attn.{nm}.weight"] = (1 + 0.05 * rng.standard_normal(hd)).astype(np.float32)
        lin(sd, rng, f"{p}.attn.to_out.0", d, d)
        lin(sd, rng, f"{p}.attn.to_add_out", d, d)
        lin(sd, rng, f"{p}.img_mlp.net.0.proj", d, 4 * d)
        lin(sd, rng, f"{p}.img_mlp.net.2", 4 * d, d)
        lin(sd, rng, f"{p}.txt_mlp.net.0.proj", d, 4 * d)
        lin(sd, rng, f"{p}.txt_mlp.net.2", 4 * d, d)
    lin(sd, rng, "norm_out.linear", d, 2 * d)
    lin(sd, rng, "proj_out", d, 4 * TINY["out_channels"])
    return sd


def test_qwen_matches_reference():
    stub_reference_deps()
    try:
        from fastdm.model.qwenimage import QwenImageTransformer2DModelCore
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    import jax.numpy as jnp

    from fastdm_tpu.models.loader import TensorSource
    from fastdm_tpu.models.qwenimage import (
        QwenImageConfig, qwen_forward, qwen_load, qwen_rope_cos_sin,
    )

    rng = np.random.default_rng(0)
    sd = _state_dict(rng)

    ref = QwenImageTransformer2DModelCore(
        patch_size=2, guidance_embeds=False, quant_dtype=None,
        data_type=torch.float32, **TINY,
    )
    to_cpu(ref)
    ref.weight_loading({k: torch.from_numpy(v) for k, v in sd.items()},
                       data_type=torch.float32, device_type="cpu")

    b, ht, wt, txt = 1, 4, 6, 6
    hidden = rng.standard_normal((b, ht * wt, TINY["in_channels"])).astype(np.float32)
    encoder = rng.standard_normal((b, txt, TINY["joint_attention_dim"])).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.forward(
            hidden_states=torch.from_numpy(hidden),
            encoder_hidden_states=torch.from_numpy(encoder),
            encoder_hidden_states_mask=torch.ones((b, txt)),
            timestep=torch.tensor([0.5]),
            img_shapes=[(1, ht, wt)],
            txt_seq_lens=[txt],
        )
        ref_out = (ref_out[0] if isinstance(ref_out, tuple) else ref_out).float().numpy()

    cfg = QwenImageConfig(quant=None, scale_rope=True, **TINY)
    params = qwen_load(TensorSource(dict(sd)), cfg)
    cos, sin = qwen_rope_cos_sin(cfg, 1, ht, wt, txt)
    out = np.asarray(
        qwen_forward(
            params, cfg, jnp.asarray(hidden, jnp.bfloat16),
            jnp.asarray(encoder, jnp.bfloat16), jnp.full((b,), 0.5, jnp.float32),
            cos, sin,
        ),
        np.float32,
    )
    err = rel_err(out, ref_out)
    assert err < 0.05, f"mean rel err {err:.4f}"
