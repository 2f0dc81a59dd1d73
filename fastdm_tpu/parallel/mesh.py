"""Device mesh + sharding rules (SURVEY.md §2.7 — all new surface).

The reference has NO distributed runtime (verified absence: no
torch.distributed/NCCL anywhere in fastdm/). The TPU rebuild's parallelism is
declarative: a named mesh ("dp", "sp", "tp"), PartitionSpecs on weights and
activations, and XLA inserts the ICI collectives.

Axes:
  dp — data parallel over batch (ref analog: per-process eval sharding,
       examples/evaluation/README.md).
  sp — sequence parallel over image/video tokens (new capability; the
       reference scales sequence length with sparsity + head-splitting only,
       SURVEY.md §5.7).
  tp — tensor parallel over attention heads / MLP hidden (column-parallel
       qkv & ff-in, row-parallel out-proj; XLA all-reduces the partials).
PP (DiT block stages over a `pp` axis, GPipe microbatch schedule) lives in
parallel/pipeline.py. EP (Wan-A14B's two temporal experts) is handled
temporally: the phase-split denoiser keeps only the active expert
device-resident (pipeline/denoise_more.py make_wan_dual_phase_denoiser +
FastDMEngine offload_inactive_expert); with a mesh, TP shards both experts.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "sp", "tp")


def factor_mesh(n: int) -> Tuple[int, int, int]:
    """Factor n devices into (dp, sp, tp), preferring tp (ICI-closest axis)."""

    def largest_pow2_divisor(x: int, cap: int) -> int:
        d = 1
        while x % (d * 2) == 0 and d * 2 <= cap:
            d *= 2
        return d

    tp = largest_pow2_divisor(n, 4)
    rem = n // tp
    sp = largest_pow2_divisor(rem, 2)
    dp = rem // sp
    return dp, sp, tp


def make_mesh(n_devices: int) -> Mesh:
    dp, sp, tp = factor_mesh(n_devices)
    devs = np.asarray(jax.devices()[:n_devices]).reshape(dp, sp, tp)
    return Mesh(devs, AXES)


def generic_param_pspec(path: str) -> P:
    """Name-pattern TP rules covering every model family's QLinear leaves.

    Column-parallel (output dim on tp): fused qkv/kv projections, ff inputs,
    single-block proj_mlp. Row-parallel (input dim on tp, partial-sum
    all-reduced by XLA): attention out-projections and ff outputs.
    Norm/mod/embedding weights replicate."""
    col = any(k in path for k in (
        "qkv", "add_qkv", ".kv", "ff.proj", "ff_context.proj", "img_mlp.proj",
        "txt_mlp.proj", "ffn.proj", "proj_mlp", "attn2.q", "attn.q",
        # AdaLN modulation projections: their outputs are per-sample (1 token)
        # so the post-matmul gather is ~free, while replicating the weights
        # costs 6.8B params on Qwen-Image / 2.2B on FLUX — the difference
        # between fitting and not fitting TP shards in 16GB HBM
        "img_mod", "txt_mod", "norm1.linear", "norm1_context.linear",
        "norm.linear",
    ))
    row = any(k in path for k in (
        "to_out", "to_add_out", "ff.out", "ff_context.out", "img_mlp.out",
        "txt_mlp.out", "ffn.out",
    ))
    row = row or (".proj_out" in path and ("single" in path or "blocks" in path))
    leaf = path.rsplit(".", 1)[-1]
    if col and not row:
        if leaf in ("w", "w4", "w4p"):
            return P(None, None, "tp")
        if leaf == "lora_v":  # (L, r, N): out dim follows the main weight
            return P(None, None, "tp")
        if leaf in ("scale", "colsum", "bias"):
            return P(None, "tp")
    if row:
        if leaf in ("w", "w4", "w4p"):
            return P(None, "tp", None)
        if leaf == "lora_u":  # (L, K, r): in dim follows; partial sums psum'd
            return P(None, "tp", None)
        return P()
    return P()


def shard_params_by_name(params, mesh: Mesh):
    """TP-shard any model family's layer-stacked block weights."""

    def place(path_parts, leaf):
        path = ".".join(str(getattr(p, "key", p)) for p in path_parts)
        spec = generic_param_pspec(path) if "block" in path else P()
        if len(spec) > leaf.ndim:
            spec = P()
        # only shard dims divisible by the axis size
        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        for dim, name in enumerate(spec):
            if name is not None and leaf.shape[dim] % axis_sizes.get(name, 1) != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def flux_param_pspec(path: str) -> P:
    """PartitionSpec for a flux param leaf, keyed by its tree path.

    Stacked block weights carry a leading layer axis (never sharded). Rules:
      qkv / add_qkv / ff.proj / proj_mlp   -> column-parallel (out dim on tp)
      to_out / to_add_out / ff.out / proj_out(single) -> row-parallel (in dim on tp)
      their scales/colsums/biases follow the out-dim sharding
      everything else (norm mod linears, embedders, head norms) -> replicated
    """
    col = any(k in path for k in ("qkv", "add_qkv", "ff.proj", "ff_context.proj", "proj_mlp"))
    row = any(k in path for k in ("to_out", "to_add_out", "ff.out", "ff_context.out"))
    # single-block fused proj_out is row-parallel too (input = [attn|mlp], both tp-sharded)
    row = row or (".proj_out" in path and "single" in path)
    leaf = path.rsplit(".", 1)[-1]
    if col:
        if leaf in ("w", "w4", "w4p", "lora_v"):
            return P(None, None, "tp")
        if leaf in ("scale", "colsum", "bias"):
            return P(None, "tp")
    if row:
        if leaf in ("w", "w4", "w4p", "lora_u"):
            return P(None, "tp", None)
        return P()  # out-dim vectors replicated
    return P()


def shard_flux_params(params, mesh: Mesh):
    """Apply TP shardings to a flux param tree (layer-stacked blocks only)."""

    def place(path_parts, leaf):
        path = ".".join(str(getattr(p, "key", p)) for p in path_parts)
        if "blocks" in path:
            spec = flux_param_pspec(path)
        else:
            spec = P()
        if len(spec) > leaf.ndim:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def flux_dryrun_step(n_devices: int) -> None:
    """Jit + run one fully-sharded training-style step on tiny shapes.

    dp over batch, sp over image tokens, tp over heads/MLP. The step computes
    a denoiser forward, an MSE loss against a target, and grads w.r.t. all
    (bf16) params — backward collectives included. Runs on any backend
    (virtual CPU devices included).
    """
    import os

    from fastdm_tpu.models.flux import FluxConfig, flux_forward, flux_init_random, flux_rope_cache

    # The training step differentiates through the model; route the kernel ops
    # to the jnp backend (pallas forward kernels are inference-only — no VJP).
    prev_backend = os.environ.get("FASTDM_KERNEL_BACKEND")
    os.environ["FASTDM_KERNEL_BACKEND"] = "jnp"

    mesh = make_mesh(n_devices)
    dp, sp, tp = mesh.devices.shape

    cfg = FluxConfig(
        num_layers=2, num_single_layers=2,
        attention_head_dim=32, num_attention_heads=4,
        joint_attention_dim=64, pooled_projection_dim=48,
        in_channels=16, out_channels=16,
        axes_dims_rope=(8, 12, 12), quant=None,  # bf16 for differentiability
    )
    params = flux_init_random(jax.random.key(0), cfg)
    params = shard_flux_params(params, mesh)

    b = max(2, dp)
    txt, ht, wt = 16, 8, 8
    s_img = ht * wt
    k = jax.random.key(1)
    hidden = jax.device_put(
        jax.random.normal(k, (b, s_img, cfg.in_channels), jnp.bfloat16),
        NamedSharding(mesh, P("dp", "sp", None)),
    )
    encoder = jax.device_put(
        jax.random.normal(k, (b, txt, cfg.joint_attention_dim), jnp.bfloat16),
        NamedSharding(mesh, P("dp", None, None)),
    )
    pooled = jax.device_put(
        jax.random.normal(k, (b, cfg.pooled_projection_dim), jnp.bfloat16),
        NamedSharding(mesh, P("dp", None)),
    )
    target = jax.device_put(
        jax.random.normal(k, (b, s_img, cfg.out_channels), jnp.float32),
        NamedSharding(mesh, P("dp", "sp", None)),
    )
    t = jnp.full((b,), 0.5, jnp.float32)
    g = jnp.full((b,), 3.5, jnp.float32)
    cos, sin = flux_rope_cache(cfg, txt, ht, wt)

    def loss_fn(params, hidden, encoder, pooled, t, g, target):
        out = flux_forward(params, cfg, hidden, encoder, pooled, t, cos, sin, guidance=g)
        return jnp.mean((out.astype(jnp.float32) - target) ** 2)

    try:
        with mesh:
            step = jax.jit(jax.value_and_grad(loss_fn))
            loss, grads = step(params, hidden, encoder, pooled, t, g, target)
            loss.block_until_ready()
    finally:
        if prev_backend is None:
            os.environ.pop("FASTDM_KERNEL_BACKEND", None)
        else:
            os.environ["FASTDM_KERNEL_BACKEND"] = prev_backend
    assert jnp.isfinite(loss), "dryrun loss not finite"
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(jnp.isfinite(l).all() for l in leaves), "dryrun grads not finite"
    print(
        f"dryrun_multichip ok: mesh dp={dp} sp={sp} tp={tp}, "
        f"loss={float(loss):.4f}, {len(leaves)} grad leaves"
    )


def wan_sp_dryrun_step(n_devices: int) -> None:
    """One wan denoise forward with ring (sequence-parallel) attention over
    an all-sp mesh — the Wan 81f/720p scale-out path at tiny shapes: self-
    attention rotates K/V shards around the ring, cross-attention keeps text
    KV replicated with sharded queries."""
    from fastdm_tpu.models.wan import WanConfig, wan_forward, wan_init_random
    from fastdm_tpu.parallel import cp_state
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:n_devices]).reshape(1, n_devices, 1)
    mesh = Mesh(devs, AXES)
    cfg = WanConfig(num_attention_heads=2, attention_head_dim=24, in_channels=4,
                    out_channels=4, text_dim=16, freq_dim=8, ffn_dim=32,
                    num_layers=2, text_len=8, quant="int8")
    params = wan_init_random(jax.random.key(0), cfg)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 2, 16, 16), jnp.bfloat16)  # 128 tokens
    text = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    t = jnp.full((1,), 500.0)
    cp_state.set_cp_mesh(mesh)
    try:
        out = wan_forward(params, cfg, lat, t, text)
        assert jnp.isfinite(out.astype(jnp.float32)).all()
    finally:
        cp_state.set_cp_mesh(None)
    print(f"wan sp dryrun ok: ring attention over sp={n_devices}, out {out.shape}")
