"""Golden parity: our SDXL UNet building blocks vs the reference layer classes.

The reference SDXL core hardcodes the full 2.6B-param architecture (320/640/
1280 channels), too heavy for a 1-core CPU golden run — but its layer classes
(ResnetBlock2D, Transformer2DModel) are dimension-parameterized, so the math
is verified per-layer at small dims; the topology above them is covered by
tests/test_sdxl_model.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_harness import rel_err, stub_reference_deps, to_cpu


def _load_qlinear(ql, ws, bs=None):
    """Feed diffusers-layout (out, in) weights into a reference QLinear."""
    ws_t = [torch.from_numpy(w).transpose(0, 1) for w in ws]
    bs_t = [torch.from_numpy(b) if b is not None else None for b in (bs or [None] * len(ws))]
    ql.weight_loading_and_quant(ws_t, bs_t, quant_type=None)


def test_resnet_block_matches_reference():
    stub_reference_deps()
    try:
        from fastdm.layer.resnetblock import ResnetBlock2D
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    import jax.numpy as jnp

    from fastdm_tpu.models.loader import TensorSource
    from fastdm_tpu.models.sdxl import _resnet, _resnet_p

    rng = np.random.default_rng(0)
    cin, cout, temb_dim = 64, 128, 1280  # reference hardcodes QLinear(1280, out)

    def lin(sd, name, k, n):
        sd[f"{name}.weight"] = rng.standard_normal((n, k)).astype(np.float32) * 0.04
        sd[f"{name}.bias"] = rng.standard_normal((n,)).astype(np.float32) * 0.02

    sd = {}
    for nm, c in (("norm1", cin), ("norm2", cout)):
        sd[f"{nm}.weight"] = (1 + 0.1 * rng.standard_normal(c)).astype(np.float32)
        sd[f"{nm}.bias"] = (0.05 * rng.standard_normal(c)).astype(np.float32)
    sd["conv1.weight"] = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.05
    sd["conv1.bias"] = rng.standard_normal((cout,)).astype(np.float32) * 0.02
    sd["conv2.weight"] = rng.standard_normal((cout, cout, 3, 3)).astype(np.float32) * 0.05
    sd["conv2.bias"] = rng.standard_normal((cout,)).astype(np.float32) * 0.02
    sd["conv_shortcut.weight"] = rng.standard_normal((cout, cin, 1, 1)).astype(np.float32) * 0.1
    sd["conv_shortcut.bias"] = rng.standard_normal((cout,)).astype(np.float32) * 0.02
    lin(sd, "time_emb_proj", temb_dim, cout)

    ref = ResnetBlock2D(cin, cout, conv_shortcut=True, data_type=torch.float32)
    to_cpu(ref)
    ref.norm1_gamma = torch.from_numpy(sd["norm1.weight"])
    ref.norm1_beta = torch.from_numpy(sd["norm1.bias"])
    ref.conv1_weight = torch.from_numpy(sd["conv1.weight"])
    ref.conv1_bias = torch.from_numpy(sd["conv1.bias"])
    ref.norm2_gamma = torch.from_numpy(sd["norm2.weight"])
    ref.norm2_beta = torch.from_numpy(sd["norm2.bias"])
    ref.conv2_weight = torch.from_numpy(sd["conv2.weight"])
    ref.conv2_bias = torch.from_numpy(sd["conv2.bias"])
    ref.convshortcut_weight = torch.from_numpy(sd["conv_shortcut.weight"])
    ref.convshortcut_bias = torch.from_numpy(sd["conv_shortcut.bias"])
    _load_qlinear(ref.time_emb_proj, [sd["time_emb_proj.weight"]], [sd["time_emb_proj.bias"]])

    x = rng.standard_normal((1, cin, 8, 8)).astype(np.float32)
    temb = rng.standard_normal((1, temb_dim)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.forward(torch.from_numpy(x), torch.from_numpy(temb)).numpy()

    params = _resnet_p(TensorSource({f"r.{k}": v for k, v in sd.items()}), "r", None)
    out = np.asarray(
        _resnet(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(temb)),
        np.float32,
    ).transpose(0, 3, 1, 2)
    assert rel_err(out, ref_out) < 0.02


def test_transformer2d_matches_reference():
    stub_reference_deps()
    try:
        from fastdm.layer.unetblock import Transformer2DModel
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    import jax.numpy as jnp

    from fastdm_tpu.models.loader import TensorSource
    from fastdm_tpu.models.sdxl import SDXLConfig, _t2d_p, _transformer2d

    rng = np.random.default_rng(1)
    c, ctx_dim, n_layers = 128, 2048, 2  # head_dim 64 + ctx 2048 are hardcoded

    def lin(sd, name, k, n, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal((n, k)).astype(np.float32) * 0.04
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal((n,)).astype(np.float32) * 0.02

    sd = {}
    sd["norm.weight"] = (1 + 0.1 * rng.standard_normal(c)).astype(np.float32)
    sd["norm.bias"] = (0.05 * rng.standard_normal(c)).astype(np.float32)
    lin(sd, "proj_in", c, c)
    for j in range(n_layers):
        p = f"transformer_blocks.{j}"
        for nm in ("norm1", "norm2", "norm3"):
            sd[f"{p}.{nm}.weight"] = (1 + 0.1 * rng.standard_normal(c)).astype(np.float32)
            sd[f"{p}.{nm}.bias"] = (0.05 * rng.standard_normal(c)).astype(np.float32)
        for nm in ("to_q", "to_k", "to_v"):
            lin(sd, f"{p}.attn1.{nm}", c, c, bias=False)
        lin(sd, f"{p}.attn1.to_out.0", c, c)
        lin(sd, f"{p}.attn2.to_q", c, c, bias=False)
        for nm in ("to_k", "to_v"):
            lin(sd, f"{p}.attn2.{nm}", ctx_dim, c, bias=False)
        lin(sd, f"{p}.attn2.to_out.0", c, c)
        lin(sd, f"{p}.ff.net.0.proj", c, 8 * c)
        lin(sd, f"{p}.ff.net.2", 4 * c, c)
    lin(sd, "proj_out", c, c)

    ref = Transformer2DModel(c, c, n_layers, data_type=torch.float32)
    to_cpu(ref)
    ref.norm_gamma = torch.from_numpy(sd["norm.weight"])
    ref.norm_beta = torch.from_numpy(sd["norm.bias"])
    _load_qlinear(ref.proj_in, [sd["proj_in.weight"]], [sd["proj_in.bias"]])
    _load_qlinear(ref.proj_out, [sd["proj_out.weight"]], [sd["proj_out.bias"]])
    for j, blk in enumerate(ref.transformer_blocks):
        p = f"transformer_blocks.{j}"
        blk.norm1_gamma = torch.from_numpy(sd[f"{p}.norm1.weight"])
        blk.norm1_beta = torch.from_numpy(sd[f"{p}.norm1.bias"])
        blk.norm2_gamma = torch.from_numpy(sd[f"{p}.norm2.weight"])
        blk.norm2_beta = torch.from_numpy(sd[f"{p}.norm2.bias"])
        blk.norm3_gamma = torch.from_numpy(sd[f"{p}.norm3.weight"])
        blk.norm3_beta = torch.from_numpy(sd[f"{p}.norm3.bias"])
        _load_qlinear(blk.attn1.qkv_proj,
                      [sd[f"{p}.attn1.{n}.weight"] for n in ("to_q", "to_k", "to_v")])
        _load_qlinear(blk.attn1.out_proj, [sd[f"{p}.attn1.to_out.0.weight"]],
                      [sd[f"{p}.attn1.to_out.0.bias"]])
        _load_qlinear(blk.attn2.q_proj, [sd[f"{p}.attn2.to_q.weight"]])
        _load_qlinear(blk.attn2.kv_proj,
                      [sd[f"{p}.attn2.{n}.weight"] for n in ("to_k", "to_v")])
        _load_qlinear(blk.attn2.out_proj, [sd[f"{p}.attn2.to_out.0.weight"]],
                      [sd[f"{p}.attn2.to_out.0.bias"]])
        _load_qlinear(blk.ff.proj1, [sd[f"{p}.ff.net.0.proj.weight"]],
                      [sd[f"{p}.ff.net.0.proj.bias"]])
        _load_qlinear(blk.ff.proj2, [sd[f"{p}.ff.net.2.weight"]],
                      [sd[f"{p}.ff.net.2.bias"]])

    x = rng.standard_normal((1, c, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, ctx_dim)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.forward(torch.from_numpy(x), torch.from_numpy(ctx)).numpy()

    cfg = SDXLConfig(quant=None)
    params = _t2d_p(TensorSource({f"t.{k}": v for k, v in sd.items()}), "t", n_layers, None, False)
    out = np.asarray(
        _transformer2d(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       jnp.asarray(ctx, jnp.bfloat16), cfg, None),
        np.float32,
    ).transpose(0, 3, 1, 2)
    assert rel_err(out, ref_out) < 0.05
