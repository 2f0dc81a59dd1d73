"""Golden parity: our Wan core vs the reference torch implementation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_harness import lin, rel_err, stub_reference_deps, to_cpu

TINY = dict(
    num_attention_heads=2, attention_head_dim=24, in_channels=4, out_channels=4,
    text_dim=32, freq_dim=16, ffn_dim=64, num_layers=2,
)


def _state_dict(rng):
    d = TINY["num_attention_heads"] * TINY["attention_head_dim"]
    sd = {}
    sd["patch_embedding.weight"] = rng.standard_normal(
        (d, TINY["in_channels"], 1, 2, 2)).astype(np.float32) * 0.05
    sd["patch_embedding.bias"] = rng.standard_normal((d,)).astype(np.float32) * 0.02
    lin(sd, rng, "condition_embedder.time_embedder.linear_1", TINY["freq_dim"], d)
    lin(sd, rng, "condition_embedder.time_embedder.linear_2", d, d)
    lin(sd, rng, "condition_embedder.time_proj", d, 6 * d)
    lin(sd, rng, "condition_embedder.text_embedder.linear_1", TINY["text_dim"], d)
    lin(sd, rng, "condition_embedder.text_embedder.linear_2", d, d)
    sd["scale_shift_table"] = rng.standard_normal((1, 2, d)).astype(np.float32) * 0.1
    lin(sd, rng, "proj_out", d, TINY["out_channels"] * 4)
    for i in range(TINY["num_layers"]):
        p = f"blocks.{i}"
        sd[f"{p}.scale_shift_table"] = rng.standard_normal((1, 6, d)).astype(np.float32) * 0.1
        for a in ("attn1", "attn2"):
            for nm in ("norm_q", "norm_k"):
                sd[f"{p}.{a}.{nm}.weight"] = (
                    1.0 + 0.05 * rng.standard_normal(d)).astype(np.float32)
            for nm in ("to_q", "to_k", "to_v"):
                lin(sd, rng, f"{p}.{a}.{nm}", d, d)
            lin(sd, rng, f"{p}.{a}.to_out.0", d, d)
        lin(sd, rng, f"{p}.ffn.net.0.proj", d, TINY["ffn_dim"])
        lin(sd, rng, f"{p}.ffn.net.2", TINY["ffn_dim"], d)
        sd[f"{p}.norm2.weight"] = (1.0 + 0.05 * rng.standard_normal(d)).astype(np.float32)
        sd[f"{p}.norm2.bias"] = (0.02 * rng.standard_normal(d)).astype(np.float32)
    return sd


def test_wan_matches_reference():
    stub_reference_deps()
    try:
        from fastdm.model.wan import WanTransformer3DModelCore
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    import jax
    import jax.numpy as jnp

    from fastdm_tpu.models.loader import TensorSource
    from fastdm_tpu.models.wan import WanConfig, wan_forward, wan_load

    rng = np.random.default_rng(0)
    sd = _state_dict(rng)

    ref = WanTransformer3DModelCore(
        patch_size=(1, 2, 2), quant_dtype=None, data_type=torch.float32, **TINY,
    )
    to_cpu(ref)
    ref.weight_loading({k: torch.from_numpy(v) for k, v in sd.items()},
                       data_type=torch.float32, device_type="cpu")

    b, f, h, w, txt = 1, 2, 8, 8, 8
    video = rng.standard_normal((b, TINY["in_channels"], f, h, w)).astype(np.float32)
    text = rng.standard_normal((b, txt, TINY["text_dim"])).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.forward(
            hidden_states=torch.from_numpy(video),
            timestep=torch.tensor([500.0]),
            encoder_hidden_states=torch.from_numpy(text),
        )[0].float().numpy()

    cfg = WanConfig(quant=None, text_len=txt, **TINY)
    params = wan_load(TensorSource(dict(sd)), cfg)
    out = np.asarray(
        wan_forward(
            params, cfg, jnp.asarray(video), jnp.full((b,), 500.0, jnp.float32),
            jnp.asarray(text, jnp.bfloat16),
        ),
        np.float32,
    )
    err = rel_err(out, ref_out)
    assert err < 0.05, f"mean rel err {err:.4f}"
