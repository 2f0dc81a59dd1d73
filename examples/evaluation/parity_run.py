"""One-command real-checkpoint parity run (ref: examples/evaluation/README.md
workflow — baseline vs quantized/cached generation, CLIP score + FID-style
comparison; rebuilt as a single driver so the full fidelity story runs the
moment real weights are reachable).

For each requested config (bf16 baseline, int8, int8+cache, +sparse for wan)
it builds a FastDMEngine on the SAME checkpoint, generates the same seeded
prompts, and reports:
  * PSNR / max-abs-diff of every config vs the first (the quantization and
    caching fidelity numbers the reference publishes as CLIP/FID deltas),
  * CLIP score per config (when a CLIP checkpoint is reachable — falls back
    to skipped, never fails the run),
  * optional PSNR vs a directory of reference-generated images
    (--reference-dir, e.g. the CUDA reference's outputs at the same seeds),
  * for wan: the decoded video tensor stats + saved latents for offline
    3D-VAE cross-checks.
With --refit-teacache it finishes by fitting TeaCache coefficients on the
real weights (examples/xcaching/fit_teacache.py) instead of shipping the
reference-published ones.

Runbook (FLUX):
  python examples/evaluation/parity_run.py \
      --model-path /models/FLUX.1-dev --architecture flux \
      --prompts prompts.txt --height 1024 --width 1024 --steps 25 \
      --configs bf16,int8,int8+cache --refit-teacache --report parity.json

Smoke-tested on synthetic weights in tests/test_parity_run.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


CONFIGS = {
    "bf16": {},
    "int8": {"use_int8": True},
    "int8+cache": {
        "use_int8": True,
        "cache_config": {"cache_algorithm": "teacache", "enable_caching": True,
                         "threshold": 0.25},
    },
    "int8+sparse": {
        "use_int8": True,
        "sparse_attn_config": {"sparse_algorithm": "radial", "block_size": 64,
                               "decay_factor": 0.2, "model_type": "wan",
                               "dense_steps": 2},
    },
    # W4A4 + SVDQuant branch (TPU extension; the headline bench default is
    # int4p) — included so the pipeline-level divergence of the 4-bit forms
    # vs int8 vs bf16 is one command (VERDICT r3: the int4p accuracy gate
    # must be a whole-denoise number, not one probe tensor)
    "int4": {"use_int4": True},
    "int4p": {"use_int4": True, "pack_int4": True},
    "int4p+cache": {
        "use_int4": True, "pack_int4": True,
        "cache_config": {"cache_algorithm": "teacache", "enable_caching": True,
                         "threshold": 0.25},
    },
}


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def _load_prompts(path: str | None, n: int) -> list:
    if path is None:
        return ["a photo of an astronaut riding a horse on mars",
                "a watercolor painting of a fox in a snowy forest"][:n]
    with open(path) as f:
        return [line.strip() for line in f if line.strip()][:n]


def _generate(engine, architecture: str, prompts, args):
    """One config's image set: (N, H, W, 3) uint8 (or latents for wan)."""
    outs, times = [], []
    for i, prompt in enumerate(prompts):
        t0 = time.perf_counter()
        kw = dict(height=args.height, width=args.width,
                  num_inference_steps=args.steps, seed=args.seed + i)
        if architecture.startswith("wan"):
            kw.update(num_frames=args.num_frames, output_type="latent")
        elif getattr(args, "latent", False):
            # divergence over raw latents — removes the VAE from the metric
            # (used by the synthetic full-scale gate, where the VAE weights
            # are placeholders)
            kw["output_type"] = "latent"
        out = engine.generate(prompt=prompt, **kw)
        times.append(time.perf_counter() - t0)
        outs.append(np.asarray(out))
    # engine outputs carry a leading batch dim already
    return np.concatenate(outs, axis=0), times


def _install_fake_text_encoder(engine, architecture: str):
    """Deterministic prompt-hash-seeded embeddings at the engine cfg's real
    dims — what the synthetic full-scale gate uses instead of T5/CLIP.
    The SAME prompt always maps to the SAME embedding, so cross-config
    divergence is purely the quant/cache path under test."""
    import jax.numpy as jnp

    a = architecture.lower()
    cfg = engine.cfg

    class _TE:
        def encode(self, prompt, n=1):
            r = np.random.default_rng(abs(hash(str(prompt))) % 2**31)
            if a.startswith(("flux", "kontext", "krea")):
                return (
                    jnp.asarray(r.standard_normal(
                        (1, 512, cfg.joint_attention_dim)), jnp.bfloat16),
                    jnp.asarray(r.standard_normal(
                        (1, cfg.pooled_projection_dim)), jnp.bfloat16),
                )
            if a.startswith(("sd3", "sd35")):
                return (
                    jnp.asarray(r.standard_normal(
                        (1, 333, cfg.joint_attention_dim)), jnp.bfloat16),
                    jnp.asarray(r.standard_normal(
                        (1, cfg.pooled_projection_dim)), jnp.bfloat16),
                )
            if a.startswith("qwen"):
                return jnp.asarray(r.standard_normal(
                    (1, 512, cfg.joint_attention_dim)), jnp.bfloat16)
            if a.startswith("wan"):
                return jnp.asarray(r.standard_normal(
                    (1, cfg.text_len, cfg.text_dim)), jnp.bfloat16)
            raise SystemExit(
                f"--fake-text-encoder has no layout for {architecture!r}")

    engine.text_encoder = _TE()


def run_parity(args, post_init=None):
    """Drive every config and assemble the parity report dict. `post_init`
    (engine) -> None runs after each engine ctor — the synthetic-weights
    smoke test uses it to install a fake text encoder."""
    from fastdm_tpu.engine import FastDMEngine

    prompts = _load_prompts(args.prompts, args.num_prompts)
    config_names = [c.strip() for c in args.configs.split(",") if c.strip()]
    report = {"model_path": args.model_path, "architecture": args.architecture,
              "prompts": prompts, "steps": args.steps, "seed": args.seed,
              "configs": {}}
    images = {}
    for name in config_names:
        if name not in CONFIGS:
            raise SystemExit(f"unknown config {name!r}; have {list(CONFIGS)}")
        kw = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in CONFIGS[name].items()}
        if args.cache_config and "cache_config" in kw:
            kw["cache_config"] = args.cache_config  # JSON file override
        engine = FastDMEngine(args.model_path, architecture=args.architecture,
                              verbose=False, **kw)
        if post_init is not None:
            post_init(engine)
        out, times = _generate(engine, args.architecture, prompts, args)
        images[name] = out
        entry = {"seconds_per_image": float(np.mean(times)),
                 "skips": getattr(engine, "last_cache_skips", 0)}
        if args.save_dir:
            cdir = os.path.join(args.save_dir, name.replace("+", "_"))
            os.makedirs(cdir, exist_ok=True)
            if out.dtype == np.uint8:
                try:
                    from PIL import Image

                    for i in range(out.shape[0]):
                        Image.fromarray(out[i]).save(
                            os.path.join(cdir, f"{i}.png"))
                except ImportError:
                    np.save(os.path.join(cdir, "images.npy"), out)
            else:
                # wan latents: saved for offline 3D-VAE decode cross-checks
                np.save(os.path.join(cdir, "latents.npy"), out)
        report["configs"][name] = entry
        del engine

    # fidelity vs the first config (the baseline)
    base = config_names[0]
    for name in config_names[1:]:
        a, b = images[base], images[name]
        scale = 255.0 if a.dtype == np.uint8 else float(
            max(np.abs(a).max(), 1e-6))
        pair = {
            "psnr_vs_" + base: psnr(
                a.astype(np.float64) * (255.0 / scale),
                b.astype(np.float64) * (255.0 / scale)),
            "max_abs_diff_vs_" + base: float(
                np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)))),
        }
        report["configs"][name].update(pair)

    # CLIP score per config (best effort: needs a reachable CLIP checkpoint)
    if not args.skip_clip and images[base].dtype == np.uint8:
        try:
            from clip_score import ClipScorer

            scorer = ClipScorer(args.clip_path)
            for name in config_names:
                report["configs"][name]["mean_clip_score"] = float(
                    np.mean(scorer.score(list(images[name]), prompts)))
        except Exception as e:  # offline image: record why, don't fail
            report["clip_skipped"] = f"{type(e).__name__}: {e}"

    # PSNR vs reference-generated images (same prompt order, {i}.png)
    if args.reference_dir:
        try:
            from PIL import Image

            refs = np.stack([
                np.asarray(Image.open(
                    os.path.join(args.reference_dir, f"{i}.png")).convert("RGB"))
                for i in range(len(prompts))])
            for name in config_names:
                if images[name].shape == refs.shape:
                    report["configs"][name]["psnr_vs_reference"] = psnr(
                        images[name], refs)
        except Exception as e:
            report["reference_skipped"] = f"{type(e).__name__}: {e}"
    return report


def _checkpoint_key_list(tdir: str):
    """Tensor-name list of a checkpoint directory WITHOUT loading weights:
    prefers `*.safetensors.index.json` (weight_map names — tiny, often
    fetchable alone), else reads the 8-byte-header JSON of each .safetensors
    file (mmap-free: header only)."""
    import glob
    import struct

    for idx in sorted(glob.glob(os.path.join(tdir, "*.safetensors.index.json"))):
        with open(idx) as f:
            return sorted(json.load(f)["weight_map"]), os.path.basename(idx)
    names = []
    files = sorted(glob.glob(os.path.join(tdir, "*.safetensors")))
    for path in files:
        with open(path, "rb") as f:
            (hlen,) = struct.unpack("<Q", f.read(8))
            header = json.loads(f.read(hlen))
        names.extend(k for k in header if k != "__metadata__")
    if not files:
        raise FileNotFoundError(f"no safetensors index or files in {tdir}")
    return sorted(names), f"{len(files)} safetensors header(s)"


def _expected_key_set(architecture: str, cfg_json: dict):
    """The loader's expected checkpoint key set, derived from the SAME
    synthetic-layout generators the golden tests load (tests/test_golden_*).
    Key NAMES depend only on layer counts/flags, so tiny hidden dims suffice —
    no 12B-param materialization. Kontext/Krea share the flux layout and
    Qwen-Edit the qwen layout; their configs differ only in counts/flags,
    which is exactly what this check validates."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "tests"))
    import numpy as np

    rng = np.random.default_rng(0)
    a = architecture.lower()
    arch = next((fam for fam in ("flux", "kontext", "krea", "qwen", "sd35",
                                 "sd3", "wan")
                 if a.startswith(fam) and "control" not in a), a)
    if arch in ("flux", "kontext", "krea"):
        import test_golden_flux as g

        dims = dict(g.TINY)
        for k in ("num_layers", "num_single_layers"):
            if k in cfg_json:
                dims[k] = cfg_json[k]
        keys = set(g._synthetic_state_dict(dims, rng))
        if not cfg_json.get("guidance_embeds", True):
            keys = {k for k in keys if "guidance_embedder" not in k}
        return keys
    if arch == "qwen":
        import test_golden_qwen as g

        saved = dict(g.TINY)
        try:
            g.TINY["num_layers"] = cfg_json.get("num_layers", saved["num_layers"])
            return set(g._state_dict(rng))
        finally:
            g.TINY.update(saved)
    if arch in ("sd35", "sd3"):
        import test_golden_sd35 as g

        saved, saved_dual = dict(g.TINY), g.DUAL
        try:
            g.TINY["num_layers"] = cfg_json.get("num_layers", saved["num_layers"])
            g.DUAL = tuple(cfg_json.get("dual_attention_layers", saved_dual))
            return set(g._state_dict(rng))
        finally:
            g.TINY.update(saved)
            g.DUAL = saved_dual
    if arch == "wan":
        import test_golden_wan as g

        saved = dict(g.TINY)
        try:
            g.TINY["num_layers"] = cfg_json.get("num_layers", saved["num_layers"])
            return set(g._state_dict(rng))
        finally:
            g.TINY.update(saved)
    if a.startswith("sdxl") and "control" not in a and "adapter" not in a:
        import test_engine_e2e as ge

        tlpb = cfg_json.get("transformer_layers_per_block", (1, 2, 10))
        return set(ge._sdxl_sd(rng, n1=tlpb[1], n2=tlpb[2]))
    if "control" in a and a.startswith("sdxl"):
        import test_engine_e2e as ge

        tlpb = cfg_json.get("transformer_layers_per_block", (1, 2, 10))
        return set(ge._sdxl_sd(rng, n1=tlpb[1], n2=tlpb[2], cn=True))
    if "control" in a and (a.startswith("flux") or a.startswith("kontext")
                           or a.startswith("krea")):
        import test_engine_e2e as ge
        import test_golden_flux as g

        keys = set(ge._flux_cn_sd(
            rng, g.TINY,
            n_layers=cfg_json.get("num_layers", 5),
            n_single=cfg_json.get("num_single_layers", 0),
            union=bool(cfg_json.get("num_mode"))))
        if not cfg_json.get("guidance_embeds", False):
            keys = {k for k in keys if "guidance_embedder" not in k}
        return keys
    if "ip" in a and "adapter" in a:
        # Official IP-Adapter (SDXL) layouts — plain ImageProjection or the
        # Plus perceiver resampler; the caller picks the candidate matching
        # the checkpoint ('image_proj.latents' present -> plus). Processor
        # indices follow diffusers registration order (down, up, mid LAST);
        # cross-attn weights sit on odd indices (sdxl.py
        # sdxl_attach_ip_adapter docstring).
        tlpb = cfg_json.get("transformer_layers_per_block", (1, 2, 10))
        n1, n2 = tlpb[1], tlpb[2]
        proc, idx = set(), 0
        for n_layers, count in ((n1, 2), (n2, 2), (n2, 3), (n1, 3), (n2, 1)):
            for _ in range(count):
                for _ in range(n_layers):
                    idx += 1
                    proc.add(f"ip_adapter.{idx}.to_k_ip.weight")
                    proc.add(f"ip_adapter.{idx}.to_v_ip.weight")
                    idx += 1
        plain = proc | {"image_proj.proj.weight", "image_proj.proj.bias",
                        "image_proj.norm.weight", "image_proj.norm.bias"}
        depth = int(cfg_json.get("resampler_depth", 4))
        plus = set(proc)
        plus |= {"image_proj.latents", "image_proj.proj_in.weight",
                 "image_proj.proj_out.weight", "image_proj.norm_out.weight",
                 "image_proj.norm_out.bias"}
        for i in range(depth):
            p = f"image_proj.layers.{i}"
            plus |= {f"{p}.0.norm1.weight", f"{p}.0.norm1.bias",
                     f"{p}.0.norm2.weight", f"{p}.0.norm2.bias",
                     f"{p}.0.to_q.weight", f"{p}.0.to_kv.weight",
                     f"{p}.0.to_out.weight", f"{p}.1.0.weight",
                     f"{p}.1.0.bias", f"{p}.1.1.weight", f"{p}.1.3.weight"}
        return (plain, plus)
    raise SystemExit(
        f"--check-index supports flux/qwen/sd35/wan/sdxl families, their "
        f"ControlNets (flux-controlnet / sdxl-controlnet) and sdxl "
        f"ip-adapter, not {architecture!r}")


def check_index(model_path: str, architecture: str) -> dict:
    """Diff the loader's expected key set against a real checkpoint's tensor
    NAME list (index json / safetensors headers — no weight bytes needed).
    This retires the 'loader name maps vs real checkpoint layouts' risk for
    Kontext/Krea/Edit variants before any full download (SURVEY.md §7
    'weight loading fidelity')."""
    tdir = model_path
    for sub in ("transformer", "unet"):
        if os.path.isdir(os.path.join(model_path, sub)):
            tdir = os.path.join(model_path, sub)
            break
    names, source = _checkpoint_key_list(tdir)
    cfg_path = os.path.join(tdir, "config.json")
    cfg_json = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg_json = json.load(f)
    actual = set(names)
    is_ip = "ip" in architecture.lower() and "adapter" in architecture.lower()
    if is_ip and "resampler_depth" not in cfg_json:
        # plus-resampler depth straight from the checkpoint's own key list
        depth = sum(1 for k in actual
                    if k.startswith("image_proj.layers.")
                    and k.endswith(".0.to_q.weight"))
        if depth:
            cfg_json = dict(cfg_json, resampler_depth=depth)
    expected = _expected_key_set(architecture, cfg_json)
    variant = None
    if isinstance(expected, tuple):  # (plain, plus) candidates
        plain, plus = expected
        expected = plus if "image_proj.latents" in actual else plain
        variant = "plus" if expected is plus else "plain"
    missing = expected - actual
    unexpected = actual - expected
    if is_ip:
        # linear-loading claims '.bias' whenever present next to an expected
        # '.weight' (TensorSource.linear), so optional biases in the
        # checkpoint are consumable, not layout drift — only for the
        # ip-adapter family, whose official exports vary in bias presence
        unexpected = {k for k in unexpected
                      if not (k.endswith(".bias")
                              and k[: -len(".bias")] + ".weight" in expected)}
    report = {
        "source": source,
        "checkpoint_keys": len(actual),
        "expected_keys": len(expected),
        "missing_in_checkpoint": sorted(missing),
        "unexpected_in_checkpoint": sorted(unexpected),
        "ok": not missing and not unexpected,
    }
    if variant:
        report["image_proj_variant"] = variant
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model-path", required=True)
    p.add_argument("--architecture", default="flux")
    p.add_argument("--prompts", default=None, help="one prompt per line")
    p.add_argument("--num-prompts", type=int, default=2)
    p.add_argument("--configs", default="bf16,int8,int8+cache")
    p.add_argument("--cache-config", default=None,
                   help="JSON file overriding the int8+cache cache_config")
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--num-frames", type=int, default=81)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--save-dir", default=None)
    p.add_argument("--reference-dir", default=None,
                   help="reference-generated {i}.png at the same seeds")
    p.add_argument("--clip-path", default="openai/clip-vit-large-patch14")
    p.add_argument("--skip-clip", action="store_true")
    p.add_argument("--refit-teacache", action="store_true")
    p.add_argument("--fake-text-encoder", action="store_true",
                   help="install a deterministic synthetic text encoder "
                        "(prompt-hash-seeded) — the synthetic full-scale "
                        "accuracy gate runs without T5/CLIP weights")
    p.add_argument("--latent", action="store_true",
                   help="compare raw denoised latents instead of decoded "
                        "images (skips the VAE in the metric)")
    p.add_argument("--check-index", action="store_true",
                   help="only diff the loader key map against the checkpoint "
                        "index / safetensors headers (no weights loaded)")
    p.add_argument("--report", default="parity.json")
    args = p.parse_args(argv)

    if args.check_index:
        report = check_index(args.model_path, args.architecture)
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report, indent=2))
        return 0 if report["ok"] else 1

    post_init = None
    if args.fake_text_encoder:
        post_init = lambda eng: _install_fake_text_encoder(
            eng, args.architecture)
    report = run_parity(args, post_init=post_init)

    if args.refit_teacache:
        # real-weights TeaCache coefficients (replaces the shipped
        # reference-published fits; see examples/xcaching/fit_teacache.py)
        import subprocess

        fit = os.path.join(os.path.dirname(__file__), "..", "xcaching",
                           "fit_teacache.py")
        arch = {"flux": "flux", "sd35": "sd35", "qwen": "qwen",
                "qwen-image": "qwen"}.get(args.architecture)
        if arch is None:
            report["teacache_refit"] = {
                "skipped": f"fit_teacache covers flux/sd35/qwen, not "
                           f"{args.architecture}"}
        else:
            coeff_out = os.path.splitext(args.report)[0] + "_teacache.json"
            cmd = [sys.executable, fit, "--model-path", args.model_path,
                   "--architecture", arch, "--output", coeff_out]
            r = subprocess.run(cmd, capture_output=True, text=True)
            report["teacache_refit"] = {
                "returncode": r.returncode, "output": coeff_out,
                "tail": (r.stdout + r.stderr)[-500:]}

    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report["configs"].items()}, indent=2))
    print(f"report -> {args.report}")


if __name__ == "__main__":
    main()
