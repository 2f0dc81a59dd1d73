"""Golden parity: our SD3.5 core vs the reference torch implementation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_harness import lin, rel_err, stub_reference_deps, to_cpu

TINY = dict(
    sample_size=16, patch_size=2, in_channels=4, out_channels=4, num_layers=4,
    attention_head_dim=16, num_attention_heads=4, joint_attention_dim=32,
    caption_projection_dim=64, pooled_projection_dim=24, pos_embed_max_size=24,
)
DUAL = (0, 1)


def _state_dict(rng):
    d = TINY["num_attention_heads"] * TINY["attention_head_dim"]
    hd = TINY["attention_head_dim"]
    sd = {}
    sd["pos_embed.proj.weight"] = rng.standard_normal(
        (d, TINY["in_channels"], 2, 2)).astype(np.float32) * 0.05
    sd["pos_embed.proj.bias"] = rng.standard_normal((d,)).astype(np.float32) * 0.02
    from fastdm_tpu.layers.embeddings import sincos_pos_embed_2d

    m = TINY["pos_embed_max_size"]
    base = TINY["sample_size"] // TINY["patch_size"]
    sd["pos_embed.pos_embed"] = sincos_pos_embed_2d(d, m, m, base_size=base)[None].astype(np.float32)
    lin(sd, rng, "time_text_embed.timestep_embedder.linear_1", 256, d)
    lin(sd, rng, "time_text_embed.timestep_embedder.linear_2", d, d)
    lin(sd, rng, "time_text_embed.text_embedder.linear_1", TINY["pooled_projection_dim"], d)
    lin(sd, rng, "time_text_embed.text_embedder.linear_2", d, d)
    lin(sd, rng, "context_embedder", TINY["joint_attention_dim"], d)
    n = TINY["num_layers"]
    for i in range(n):
        p = f"transformer_blocks.{i}"
        last = i == n - 1
        dual = i in DUAL
        lin(sd, rng, f"{p}.norm1.linear", d, (9 if dual else 6) * d)
        lin(sd, rng, f"{p}.norm1_context.linear", d, (2 if last else 6) * d)
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            lin(sd, rng, f"{p}.attn.{nm}", d, d)
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{p}.attn.{nm}.weight"] = (1 + 0.05 * rng.standard_normal(hd)).astype(np.float32)
        lin(sd, rng, f"{p}.attn.to_out.0", d, d)
        if not last:
            lin(sd, rng, f"{p}.attn.to_add_out", d, d)
        if dual:
            for nm in ("to_q", "to_k", "to_v"):
                lin(sd, rng, f"{p}.attn2.{nm}", d, d)
            for nm in ("norm_q", "norm_k"):
                sd[f"{p}.attn2.{nm}.weight"] = (1 + 0.05 * rng.standard_normal(hd)).astype(np.float32)
            lin(sd, rng, f"{p}.attn2.to_out.0", d, d)
        lin(sd, rng, f"{p}.ff.net.0.proj", d, 4 * d)
        lin(sd, rng, f"{p}.ff.net.2", 4 * d, d)
        if not last:
            lin(sd, rng, f"{p}.ff_context.net.0.proj", d, 4 * d)
            lin(sd, rng, f"{p}.ff_context.net.2", 4 * d, d)
    lin(sd, rng, "norm_out.linear", d, 2 * d)
    lin(sd, rng, "proj_out", d, 4 * TINY["out_channels"])
    return sd


def test_sd35_matches_reference():
    stub_reference_deps()
    try:
        from fastdm.model.sd35 import SD3TransformerModelCore
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    import jax.numpy as jnp

    from fastdm_tpu.models.loader import TensorSource
    from fastdm_tpu.models.sd35 import (
        SD3Config, sd3_cropped_pos_embed, sd3_forward, sd3_load,
    )

    rng = np.random.default_rng(0)
    sd = _state_dict(rng)

    # the reference hardcodes bf16 inside CombinedTimestepTextProjEmbeddings
    # (sd35.py:258 does not forward data_type), so the whole reference side
    # must run in bf16 with bf16 inputs — its only supported configuration.
    ref = SD3TransformerModelCore(
        dual_attention_layers=DUAL, qk_norm="rms_norm", quant_dtype=None,
        data_type=torch.bfloat16, **TINY,
    )
    to_cpu(ref)
    # conv/norm tensors keep checkpoint dtype (basemodel.py init_weight), and
    # real SD3.5 checkpoints ship bf16 — so hand the reference a bf16 dict
    ref.weight_loading({k: torch.from_numpy(v).bfloat16() for k, v in sd.items()},
                       data_type=torch.bfloat16, device_type="cpu")

    b, h, w, txt = 1, 16, 16, 6
    latent = rng.standard_normal((b, TINY["in_channels"], h, w)).astype(np.float32)
    encoder = rng.standard_normal((b, txt, TINY["joint_attention_dim"])).astype(np.float32)
    pooled = rng.standard_normal((b, TINY["pooled_projection_dim"])).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.forward(
            hidden_states=torch.from_numpy(latent).bfloat16(),
            encoder_hidden_states=torch.from_numpy(encoder).bfloat16(),
            pooled_projections=torch.from_numpy(pooled).bfloat16(),
            timestep=torch.tensor([500.0]),
        )
        ref_out = (ref_out[0] if isinstance(ref_out, tuple) else ref_out).float().numpy()

    cfg = SD3Config(quant=None, num_dual_layers=len(DUAL), **TINY)
    params = sd3_load(TensorSource(dict(sd)), cfg)
    pos = sd3_cropped_pos_embed(cfg, params.get("pos_embed_table"), h, w)
    out = np.asarray(
        sd3_forward(
            params, cfg, jnp.asarray(latent), jnp.asarray(encoder, jnp.bfloat16),
            jnp.asarray(pooled, jnp.bfloat16), jnp.full((b,), 500.0, jnp.float32), pos,
        ),
        np.float32,
    )
    err = rel_err(out, ref_out)
    assert err < 0.05, f"mean rel err {err:.4f}"
