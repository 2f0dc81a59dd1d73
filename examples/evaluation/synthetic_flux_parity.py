"""Pipeline-level int4p accuracy gate on synthetic FLUX weights (VERDICT r3
item 3): PSNR / max-abs-diff of int4p vs int4 vs int8 (vs bf16 at reduced
depth) over the WHOLE 25-step denoise, through the real FastDMEngine path —
checkpoint parse -> fused-qkv quantization -> jitted denoise loop.

The reference ships its headline quant with published FID/CLIP
(ref: examples/evaluation/README.md); real checkpoints are unreachable in
this environment, so this is the strongest gate runnable today: same seeded
trajectory, full architecture, only the quant form varies. Divergence is
measured over raw LATENTS (--latent) so the placeholder VAE never enters the
metric.

Two standard invocations (BENCH_NOTES "int4p pipeline parity" section):
  full scale, int8 as baseline (bf16 = 23.8 GiB > 16 GB HBM, cannot run):
    python examples/evaluation/synthetic_flux_parity.py \
        --configs int8,int4,int4p,int4p+cache
  quarter depth (5/10 layers, bf16 fits), bf16 as baseline:
    python examples/evaluation/synthetic_flux_parity.py \
        --layers 5 --single-layers 10 --configs bf16,int8,int4,int4p

The synthetic checkpoint (bf16, diffusers-sharded, TRUE random values at
init-like scale) is built once under --dir (/dev/shm by default: page-cache
speed, no disk wear) and reused across invocations.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "tests"))
sys.path.insert(0, os.path.dirname(__file__))

SHARD_BYTES = 5 * 1024**3

FLUX_DEV = dict(
    num_layers=19, num_single_layers=38, attention_head_dim=128,
    num_attention_heads=24, joint_attention_dim=4096,
    pooled_projection_dim=768, in_channels=64, out_channels=64,
    axes_dims_rope=(16, 56, 56), guidance_embeds=True, patch_size=1,
)


def build_checkpoint(root: str, dims: dict) -> None:
    """bf16 diffusers-sharded synthetic checkpoint + config.json + tiny VAE.
    True random values (NOT the tiled-MB fill of snapshot_load_ab.py — tiled
    rows would make quantization error structurally degenerate)."""
    import ml_dtypes

    from fastdm_tpu.native.safetensors_io import write_safetensors
    from test_engine_e2e import _vae_sd, _write_st
    from test_golden_flux import _synthetic_state_dict

    tdir = os.path.join(root, "transformer")
    marker = os.path.join(tdir, "config.json")
    if os.path.exists(marker) and json.load(open(marker)) == dims:
        print(f"reusing checkpoint at {root}", flush=True)
        return
    os.makedirs(tdir, exist_ok=True)
    rng = np.random.default_rng(0)
    sd = _synthetic_state_dict(dims, rng)
    shard, shard_bytes, shard_idx, total = {}, 0, 0, 0

    def flush():
        nonlocal shard, shard_bytes, shard_idx
        if shard:
            write_safetensors(
                os.path.join(tdir, f"model-{shard_idx:05d}.safetensors"), shard)
            shard, shard_bytes, shard_idx = {}, 0, shard_idx + 1

    for k in list(sd):
        arr = sd.pop(k).astype(ml_dtypes.bfloat16)
        shard[k] = arr
        shard_bytes += arr.nbytes
        total += arr.nbytes
        if shard_bytes >= SHARD_BYTES:
            flush()
    flush()
    with open(marker, "w") as f:
        json.dump(dims, f)
    _write_st(os.path.join(root, "vae", "model.safetensors"),
              _vae_sd(np.random.default_rng(1)))
    print(f"synthetic FLUX checkpoint: {total/2**30:.1f} GiB bf16 -> {root}",
          flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dir", default="/dev/shm/flux_synth")
    p.add_argument("--layers", type=int, default=19)
    p.add_argument("--single-layers", type=int, default=38)
    p.add_argument("--configs", default="int8,int4,int4p,int4p+cache")
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--num-prompts", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--report", default=None)
    p.add_argument("--save-dir", default=None,
                   help="persist per-config latents (cross-process compare "
                        "when one process cannot hold two full-scale "
                        "engines)")
    args = p.parse_args(argv)

    if os.environ.get("SYNTH_PARITY_CPU") == "1":
        # CPU smoke mode: JAX_PLATFORMS=cpu alone is NOT honored under the
        # axon plugin (observed 2026-08-20); the config update is
        import jax

        jax.config.update("jax_platforms", "cpu")

    dims = dict(FLUX_DEV, num_layers=args.layers,
                num_single_layers=args.single_layers)
    root = os.path.join(
        args.dir, f"l{args.layers}s{args.single_layers}")
    build_checkpoint(root, dims)

    import jax.numpy as jnp

    import fastdm_tpu.engine as engine_mod
    import parity_run
    from fastdm_tpu.pipeline.vae import VAEConfig

    # the synthetic VAE is a placeholder (divergence is measured on latents);
    # its tiny config must match the _vae_sd layout for the ctor to succeed
    engine_mod.VAE_CONFIGS["flux"] = VAEConfig(
        latent_channels=4, block_out_channels=(8, 8, 8, 8),
        layers_per_block=1, norm_num_groups=4,
        scaling_factor=0.5, shift_factor=0.0)

    class _FakeTE:
        def encode(self, prompt, n=1):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            return (
                jnp.asarray(r.standard_normal(
                    (1, 512, dims["joint_attention_dim"])) * 0.1, jnp.bfloat16),
                jnp.asarray(r.standard_normal(
                    (1, dims["pooled_projection_dim"])) * 0.1, jnp.bfloat16),
            )

    ns = type("NS", (), {})()
    ns.model_path = root
    ns.architecture = "flux"
    ns.prompts = None
    ns.num_prompts = args.num_prompts
    ns.configs = args.configs
    ns.cache_config = None
    ns.height = args.height
    ns.width = args.width
    ns.steps = args.steps
    ns.num_frames = 5
    ns.seed = args.seed
    ns.save_dir = args.save_dir
    ns.reference_dir = None
    ns.skip_clip = True
    ns.latent = True
    report = parity_run.run_parity(
        ns, post_init=lambda eng: setattr(eng, "text_encoder", _FakeTE()))
    report["dims"] = dims
    out = args.report or os.path.join(
        root, f"parity_{args.configs.replace(',', '_').replace('+', '-')}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["configs"], indent=2))
    print(f"report -> {out}")


if __name__ == "__main__":
    main()
