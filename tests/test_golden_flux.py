"""Golden parity: our jitted FLUX core vs the reference torch implementation,
same synthetic checkpoint, same inputs (tiny config, bf16, torch backend).

This is the model-level correctness check the reference lacks (SURVEY.md §4
implication (b)): any silent weight-mapping or math divergence shows up here.
The reference's cuda/triton backends are stubbed out — only its torch backend
runs.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _stub_reference_deps():
    """Make /root/reference importable on CPU: stub cuda_ops + triton."""
    if "triton" not in sys.modules:
        class _Anything:
            """Permissive stand-in: decorator, callable, attribute bag."""

            def __call__(self, *a, **k):
                if len(a) == 1 and callable(a[0]) and not k:
                    return a[0]
                return _Anything()

            def __getattr__(self, name):
                return _Anything()

        triton = types.ModuleType("triton")
        triton.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
        triton.autotune = lambda *a, **k: (lambda f: f)
        triton.heuristics = lambda *a, **k: (lambda f: f)
        def _config(*a, **k):
            c = _Anything()
            c.kwargs = a[0] if a and isinstance(a[0], dict) else dict(k)
            return c

        triton.Config = _config
        triton.cdiv = lambda a, b: -(-a // b)
        triton.__path__ = []

        def _mod_getattr(name):
            if name.startswith("__"):  # keep import machinery sane
                raise AttributeError(name)
            return _Anything()

        triton.__getattr__ = _mod_getattr
        tl = types.ModuleType("triton.language")
        tl.constexpr = int
        tl.__getattr__ = _mod_getattr
        triton.language = tl
        sys.modules["triton"] = triton
        sys.modules["triton.language"] = tl
    if "fastdm.cuda_ops" not in sys.modules:
        sys.modules["fastdm.cuda_ops"] = types.ModuleType("fastdm.cuda_ops")
    # the reference's cuda backend queries device capability at import time
    torch.cuda.get_device_capability = lambda *a, **k: (8, 0)
    torch.cuda.get_device_properties = lambda *a, **k: types.SimpleNamespace(
        total_memory=1 << 36
    )
    torch.cuda.device_count = lambda: 0
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def reference():
    _stub_reference_deps()
    import os

    os.environ["KERNEL_BACKEND"] = "torch"
    try:
        from fastdm.model.flux import FluxTransformer2DModelCore
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    return FluxTransformer2DModelCore


TINY = dict(
    num_layers=2, num_single_layers=2, attention_head_dim=32,
    num_attention_heads=4, joint_attention_dim=64, pooled_projection_dim=48,
    in_channels=16, out_channels=16, axes_dims_rope=(8, 12, 12),
)


def _synthetic_state_dict(cfg, rng, sd=None):
    """diffusers-layout tensors; reused by both loaders. `sd` lets callers
    inject a casting dict (the full-scale checkpoint generator stores bf16
    as tensors land, halving peak RAM)."""
    d = cfg["num_attention_heads"] * cfg["attention_head_dim"]
    mlp = d * 4
    sd = {} if sd is None else sd

    def lin(name, k, n, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal((n, k)).astype(np.float32) * 0.04
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal((n,)).astype(np.float32) * 0.02

    lin("time_text_embed.timestep_embedder.linear_1", 256, d)
    lin("time_text_embed.timestep_embedder.linear_2", d, d)
    lin("time_text_embed.guidance_embedder.linear_1", 256, d)
    lin("time_text_embed.guidance_embedder.linear_2", d, d)
    lin("time_text_embed.text_embedder.linear_1", cfg["pooled_projection_dim"], d)
    lin("time_text_embed.text_embedder.linear_2", d, d)
    lin("context_embedder", cfg["joint_attention_dim"], d)
    lin("x_embedder", cfg["in_channels"], d)
    for i in range(cfg["num_layers"]):
        p = f"transformer_blocks.{i}"
        lin(f"{p}.norm1.linear", d, 6 * d)
        lin(f"{p}.norm1_context.linear", d, 6 * d)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            lin(f"{p}.attn.{n}", d, d)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{p}.attn.{n}.weight"] = (
                1.0 + 0.05 * rng.standard_normal(cfg["attention_head_dim"])
            ).astype(np.float32)
        lin(f"{p}.attn.to_out.0", d, d)
        lin(f"{p}.attn.to_add_out", d, d)
        lin(f"{p}.ff.net.0.proj", d, mlp)
        lin(f"{p}.ff.net.2", mlp, d)
        lin(f"{p}.ff_context.net.0.proj", d, mlp)
        lin(f"{p}.ff_context.net.2", mlp, d)
    for i in range(cfg["num_single_layers"]):
        p = f"single_transformer_blocks.{i}"
        lin(f"{p}.norm.linear", d, 3 * d)
        lin(f"{p}.proj_mlp", d, mlp)
        lin(f"{p}.proj_out", d + mlp, d)
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{p}.attn.{n}", d, d)
        for n in ("norm_q", "norm_k"):
            sd[f"{p}.attn.{n}.weight"] = (
                1.0 + 0.05 * rng.standard_normal(cfg["attention_head_dim"])
            ).astype(np.float32)
    lin("norm_out.linear", d, 2 * d)
    lin("proj_out", d, cfg["out_channels"])
    return sd


def test_flux_matches_reference_bf16(reference):
    import jax
    import jax.numpy as jnp

    from fastdm_tpu.models.flux import FluxConfig, flux_forward, flux_load, flux_rope_cache
    from fastdm_tpu.models.loader import TensorSource

    rng = np.random.default_rng(0)
    sd = _synthetic_state_dict(TINY, rng)

    # ---- reference (torch CPU, bf16 weights, no quantization)
    ref_core = reference(
        patch_size=1, guidance_embeds=True, quant_dtype=None,
        data_type=torch.float32, **TINY,
    )

    # the reference hardcodes device_type="cuda" in QLinear construction;
    # repoint every instance at the cpu before loading
    def _to_cpu(obj, seen):
        if id(obj) in seen:
            return
        seen.add(id(obj))
        if isinstance(obj, (list, tuple)):
            for x in obj:
                _to_cpu(x, seen)
            return
        if not hasattr(obj, "__dict__"):
            return
        if hasattr(obj, "device"):
            obj.device = "cpu"
        for v in list(vars(obj).values()):
            if isinstance(v, (list, tuple)) or (
                hasattr(v, "__dict__") and not isinstance(v, torch.Tensor)
            ):
                _to_cpu(v, seen)

    _to_cpu(ref_core, set())
    sd_torch = {k: torch.from_numpy(v) for k, v in sd.items()}
    ref_core.weight_loading(sd_torch, data_type=torch.float32, device_type="cpu")

    b, txt, ht, wt = 1, 12, 4, 6
    s_img = ht * wt
    hidden = rng.standard_normal((b, s_img, TINY["in_channels"])).astype(np.float32)
    encoder = rng.standard_normal((b, txt, TINY["joint_attention_dim"])).astype(np.float32)
    pooled = rng.standard_normal((b, TINY["pooled_projection_dim"])).astype(np.float32)
    img_ids = np.zeros((s_img, 3), np.float32)
    img_ids[:, 1] = np.repeat(np.arange(ht), wt)
    img_ids[:, 2] = np.tile(np.arange(wt), ht)
    txt_ids = np.zeros((txt, 3), np.float32)

    with torch.no_grad():
        ref_out = ref_core.forward(
            hidden_states=torch.from_numpy(hidden),
            encoder_hidden_states=torch.from_numpy(encoder),
            pooled_projections=torch.from_numpy(pooled),
            timestep=torch.tensor([0.5]),
            img_ids=torch.from_numpy(img_ids),
            txt_ids=torch.from_numpy(txt_ids),
            guidance=torch.tensor([3.5]),
        )[0].float().numpy()

    # ---- ours (jax, bf16 activations, no quantization)
    cfg = FluxConfig(quant=None, **TINY)
    params = flux_load(TensorSource(dict(sd)), cfg)
    cos, sin = flux_rope_cache(cfg, txt, ht, wt)
    out = flux_forward(
        params, cfg,
        jnp.asarray(hidden, jnp.bfloat16), jnp.asarray(encoder, jnp.bfloat16),
        jnp.asarray(pooled, jnp.bfloat16), jnp.full((b,), 0.5, jnp.float32),
        cos, sin, guidance=jnp.full((b,), 3.5, jnp.float32),
    )
    out = np.asarray(out, np.float32)

    denom = max(np.abs(ref_out).mean(), 1e-3)
    rel = np.abs(out - ref_out).mean() / denom
    assert rel < 0.05, f"mean rel err {rel:.4f} (ref f32 vs ours bf16)"
