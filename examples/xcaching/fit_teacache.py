"""TeaCache polynomial-coefficient fitting (ref: examples/xcaching/*.py).

Records, over an uncached generation, per-step pairs of
  x = rel-L1 distance of the block-0 modulated input between steps
  y = rel-L1 change of the full block-stack residual between steps
and fits y ~ poly(x) (degree 4), producing the `coefficients` consumed by
TeaCacheConfig (ref fitting flow: examples/xcaching/README.md).

Runs with random weights when no checkpoint is given (the fit is then only a
pipeline smoke test; real coefficients need real weights + prompts).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp


def rel_l1(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.abs(a - b).mean() / max(np.abs(b).mean(), 1e-12))


def fit_flux(args):
    from fastdm_tpu.layers.normalization import ada_layer_norm_zero
    from fastdm_tpu.layers.qlinear import qlinear_apply
    from fastdm_tpu.layers.embeddings import combined_timestep_text_proj_apply
    from fastdm_tpu.models.flux import (
        FluxConfig, flux_init_random, flux_load, flux_rope_cache, flux_run_blocks,
        _tree_slice,
    )
    from fastdm_tpu.models.loader import TensorSource
    from fastdm_tpu.pipeline.schedulers import FlowMatchEulerScheduler, flow_match_shift_mu

    cfg = FluxConfig(
        quant="int8" if args.use_int8 else ("fp8" if args.use_fp8 else None),
        quant_mods=args.quant_mods,
        num_layers=args.layers or 19, num_single_layers=args.single_layers or 38,
    )
    if args.model_path:
        params = flux_load(TensorSource.from_path(
            os.path.join(args.model_path, "transformer")), cfg)
    else:
        params = jax.jit(lambda k: flux_init_random(k, cfg))(jax.random.key(0))

    ht, wt, txt = args.height // 16, args.width // 16, 512
    cos, sin = flux_rope_cache(cfg, txt, ht, wt)
    mu = flow_match_shift_mu(ht * wt)
    sched = FlowMatchEulerScheduler.create(args.steps, use_dynamic_shifting=True, mu=mu)
    sig = jnp.asarray(sched.sigmas)

    k = jax.random.key(args.seed)
    encoder_raw = jax.random.normal(k, (1, txt, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(k, (1, cfg.pooled_projection_dim), jnp.bfloat16)
    latents = jax.random.normal(k, (1, ht * wt, cfg.in_channels), jnp.float32)

    dicache = getattr(args, "algorithm", "teacache") == "dicache"
    probe_depth = getattr(args, "probe_depth", 1)

    @jax.jit
    def step_probe_and_out(params, lat, t):
        g = jnp.full((1,), args.guidance_scale, jnp.float32)
        hidden = qlinear_apply(params["x_embedder"], lat.astype(jnp.bfloat16))
        temb = combined_timestep_text_proj_apply(
            params["time_text_embed"], t * 1000.0, pooled,
            g * 1000.0 if cfg.guidance_embeds else None)
        encoder = qlinear_apply(params["context_embedder"], encoder_raw)
        if dicache:
            # DiCache probe = output of the first probe_depth dual blocks
            # (ref: flux_dicache.py delta_y; xcaching.py:420-556)
            from fastdm_tpu.models.flux import flux_dual_block

            h, e = hidden, encoder
            for d in range(probe_depth):
                h, e = flux_dual_block(
                    _tree_slice(params["dual_blocks"], d), h, e, temb, cos, sin, cfg
                )
            probe = h
        else:
            probe, *_ = ada_layer_norm_zero(
                _tree_slice(params["dual_blocks"], 0)["norm1"], hidden, temb)
        out = flux_run_blocks(params, cfg, hidden, encoder, temb, cos, sin)
        residual = out - hidden
        return probe, residual, out

    xs, ys = [], []
    prev_probe = prev_res = None
    lat = latents
    from fastdm_tpu.models.flux import flux_forward

    for i in range(args.steps):
        t = jnp.broadcast_to(sig[i], (1,))
        probe, residual, _ = step_probe_and_out(params, lat, t)
        if prev_probe is not None:
            xs.append(rel_l1(probe, prev_probe))
            ys.append(rel_l1(residual, prev_res))
        prev_probe, prev_res = np.asarray(probe), np.asarray(residual)
        v = flux_forward(params, cfg, lat.astype(jnp.bfloat16), encoder_raw, pooled,
                         t, cos, sin, guidance=jnp.full((1,), args.guidance_scale))
        lat = sched.step(v, jnp.int32(i), lat, sig)
        print(f"step {i}: x={xs[-1] if xs else None} y={ys[-1] if ys else None}",
              flush=True)

    if dicache:
        # sweep thresholds over the recorded delta_y series: for each, count
        # the steps that would skip, and report the residual error those
        # skips would incur (ref flow: flux_dicache.py records + offline
        # threshold choice)
        xs_a, ys_a = np.asarray(xs), np.asarray(ys)
        print("threshold sweep (delta_y -> skips, mean residual-change when skipping):")
        best = None
        target = 0.5  # aim for the reference's typical ~50% skip rate
        for th in np.quantile(xs_a, [0.2, 0.35, 0.5, 0.65, 0.8]):
            mask = xs_a < th
            err = float(ys_a[mask].mean()) if mask.any() else 0.0
            ratio = mask.mean()
            print(f"  threshold={th:.4f}: skips {int(mask.sum())}/{len(xs_a)} "
                  f"mean_err={err:.4f}")
            # pick the threshold whose skip rate lands closest to the target;
            # the printed sweep shows the skip/error trade-off for hand-tuning
            if best is None or abs(ratio - target) < best[1]:
                best = (float(th), abs(ratio - target))
        out = {
            "cache_algorithm": "dicache",
            "enable_caching": True,
            "threshold": args.threshold if args.threshold != 0.25 else best[0],
            "probe_depth": probe_depth,
            "ret_ratio": 0.2,
            "rel_l1_distance_algo": "delta_y",
        }
        print(json.dumps(out, indent=2))
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.output}")
        return

    coeffs = np.polyfit(np.asarray(xs), np.asarray(ys), deg=min(4, len(xs) - 1))
    out = {
        "cache_algorithm": "teacache",
        "enable_caching": True,
        "threshold": args.threshold,
        "coefficients": [float(c) for c in coeffs],
    }
    print(json.dumps(out, indent=2))
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.output}")


def _polyfit_and_write(xs, ys, args, negtive_coefficients=None):
    coeffs = np.polyfit(np.asarray(xs), np.asarray(ys), deg=min(4, len(xs) - 1))
    out = {
        "cache_algorithm": "teacache",
        "enable_caching": True,
        "threshold": args.threshold,
        "coefficients": [float(c) for c in coeffs],
    }
    if negtive_coefficients is not None:
        # reference spelling (TeaCacheConfig.negtive_coefficients)
        out["negtive_coefficients"] = [float(c) for c in negtive_coefficients]
    print(json.dumps(out, indent=2))
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.output}")


def fit_sd35(args):
    """Probe = block-0 modulated hidden (SD35AdaLayerNormZeroX 9-chunk on the
    dual-attn block; ref xcaching sd35 path)."""
    from fastdm_tpu.layers.embeddings import combined_timestep_text_proj_apply
    from fastdm_tpu.layers.normalization import sd35_ada_layer_norm_zero_x
    from fastdm_tpu.layers.qlinear import qlinear_apply
    from fastdm_tpu.models.loader import TensorSource
    from fastdm_tpu.models.sd35 import (
        SD3Config, sd3_cropped_pos_embed, sd3_forward, sd3_init_random, sd3_load,
        sd3_patchify, sd3_run_blocks,
    )
    from fastdm_tpu.pipeline.schedulers import FlowMatchEulerScheduler

    cfg = SD3Config(
        quant="int8" if args.use_int8 else ("fp8" if args.use_fp8 else None),
        num_layers=args.layers or 24,
    )
    if args.model_path:
        params = sd3_load(TensorSource.from_path(
            os.path.join(args.model_path, "transformer")), cfg)
    else:
        params = jax.jit(lambda k: sd3_init_random(k, cfg))(jax.random.key(0))
    lh, lw = args.height // 8, args.width // 8
    pos = sd3_cropped_pos_embed(cfg, params.get("pos_embed_table"), lh, lw)
    sched = FlowMatchEulerScheduler.create(args.steps, shift=3.0)
    sig = jnp.asarray(sched.sigmas)
    k = jax.random.key(args.seed)
    enc = jax.random.normal(k, (1, 77, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jax.random.normal(k, (1, cfg.pooled_projection_dim), jnp.bfloat16)
    lat = jax.random.normal(k, (1, cfg.in_channels, lh, lw), jnp.float32)

    @jax.jit
    def probe_and_res(params, lat, t):
        hidden = sd3_patchify(params, cfg, lat.astype(jnp.float32), pos)
        temb = combined_timestep_text_proj_apply(
            params["time_text_embed"], t, pooled)
        encoder = qlinear_apply(params["context_embedder"], enc)
        blk0 = jax.tree.map(lambda x: x[0], params["dual_attn_blocks"])
        probe, *_ = sd35_ada_layer_norm_zero_x(blk0["norm1"], hidden, temb)
        out = sd3_run_blocks(params, cfg, hidden, encoder, temb)
        return probe, out - hidden

    xs, ys, prev = [], [], None
    for i in range(args.steps):
        t = jnp.broadcast_to(sig[i] * 1000.0, (1,))
        probe, res = probe_and_res(params, lat, t)
        if prev is not None:
            xs.append(rel_l1(probe, prev[0]))
            ys.append(rel_l1(res, prev[1]))
        prev = (np.asarray(probe), np.asarray(res))
        v = sd3_forward(params, cfg, lat, enc, pooled, t, pos)
        lat = sched.step(v.astype(jnp.float32), jnp.int32(i), lat, sig)
        print(f"step {i}: x={xs[-1] if xs else None} y={ys[-1] if ys else None}",
              flush=True)
    _polyfit_and_write(xs, ys, args)


def fit_qwen(args):
    """Probe = block-0 TEXT-stream modulated input (ref xcaching qwenimage)."""
    from fastdm_tpu.layers.embeddings import (
        get_timestep_embedding, timestep_embedding_apply,
    )
    from fastdm_tpu.kernels import rms_norm
    from fastdm_tpu.layers.qlinear import qlinear_apply
    from fastdm_tpu.models.loader import TensorSource
    from fastdm_tpu.models.qwenimage import (
        QwenImageConfig, _modulate, qwen_forward, qwen_init_random, qwen_load,
        qwen_rope_cos_sin, qwen_run_blocks,
    )
    from fastdm_tpu.pipeline.schedulers import (
        FlowMatchEulerScheduler, flow_match_shift_mu,
    )

    cfg = QwenImageConfig(
        quant="int8" if args.use_int8 else ("fp8" if args.use_fp8 else None),
        quant_mods=args.quant_mods,
        # full Qwen-Image (60 blocks / ~20B) exceeds one 16GB v5e even at
        # int8 — fit at reduced depth on one chip or shard via mesh
        num_layers=args.layers or 60,
    )
    if args.model_path:
        params = qwen_load(TensorSource.from_path(
            os.path.join(args.model_path, "transformer")), cfg)
    else:
        params = jax.jit(lambda k: qwen_init_random(k, cfg))(jax.random.key(0))
    ht, wt, txt = args.height // 16, args.width // 16, 128
    cos, sin = qwen_rope_cos_sin(cfg, 1, ht, wt, txt)
    mu = flow_match_shift_mu(ht * wt)
    sched = FlowMatchEulerScheduler.create(args.steps, use_dynamic_shifting=True, mu=mu)
    sig = jnp.asarray(sched.sigmas)
    k = jax.random.key(args.seed)
    enc_raw = jax.random.normal(k, (1, txt, cfg.joint_attention_dim), jnp.bfloat16)
    lat = jax.random.normal(k, (1, ht * wt, cfg.in_channels), jnp.float32)

    @jax.jit
    def probe_and_res(params, lat, t, enc):
        hidden = qlinear_apply(params["img_in"], lat.astype(jnp.bfloat16))
        encoder = rms_norm(enc, params["txt_norm"], 1e-6)
        encoder = qlinear_apply(params["txt_in"], encoder)
        t_proj = get_timestep_embedding(
            t.astype(jnp.float32), 256, flip_sin_to_cos=True,
            downscale_freq_shift=0.0, scale=1000.0,
        )
        temb = timestep_embedding_apply(
            params["time_text_embed"]["timestep_embedder"], t_proj.astype(hidden.dtype))
        blk0 = jax.tree.map(lambda x: x[0], params["blocks"])
        txt_mod = qlinear_apply(blk0["txt_mod"], jax.nn.silu(temb))
        txt_mod1, _ = jnp.split(txt_mod, 2, axis=-1)
        probe, _ = _modulate(encoder, txt_mod1)
        out = qwen_run_blocks(params, cfg, hidden, encoder, temb, cos, sin)
        return probe, out - hidden

    # --dual fits a second coefficient set from the true-CFG negative pass
    # (ref: qwenimage_teacache_dual.py -> TeaCacheConfig.negtive_coefficients;
    # the cache keeps separate pos/neg state, xcaching.py:66-76)
    enc_neg = jax.random.normal(
        jax.random.fold_in(k, 1), (1, txt, cfg.joint_attention_dim), jnp.bfloat16
    )
    branches = {"positive": enc_raw}
    if args.dual:
        branches["negative"] = enc_neg
    series = {b: {"xs": [], "ys": [], "prev": None} for b in branches}
    for i in range(args.steps):
        t = jnp.broadcast_to(sig[i], (1,))
        v_pos = None
        for b, enc_b in branches.items():
            probe, res = probe_and_res(params, lat, t, enc_b)
            s = series[b]
            if s["prev"] is not None:
                s["xs"].append(rel_l1(probe, s["prev"][0]))
                s["ys"].append(rel_l1(res, s["prev"][1]))
            s["prev"] = (np.asarray(probe), np.asarray(res))
            v = qwen_forward(params, cfg, lat.astype(jnp.bfloat16), enc_b, t, cos, sin)
            if b == "positive":
                v_pos = v
        # step on the positive branch (true-CFG combination needs real
        # prompts; for fitting only the per-branch distances matter)
        lat = sched.step(v_pos.astype(jnp.float32), jnp.int32(i), lat, sig)
        sp = series["positive"]
        print(f"step {i}: x={sp['xs'][-1] if sp['xs'] else None} "
              f"y={sp['ys'][-1] if sp['ys'] else None}", flush=True)
    neg = None
    if args.dual:
        sn = series["negative"]
        neg = np.polyfit(np.asarray(sn["xs"]), np.asarray(sn["ys"]),
                         deg=min(4, len(sn["xs"]) - 1))
    _polyfit_and_write(series["positive"]["xs"], series["positive"]["ys"], args,
                       negtive_coefficients=neg)


def main():
    parser = argparse.ArgumentParser("teacache coefficient fitting")
    parser.add_argument("--architecture", default="flux",
                    choices=["flux", "sd35", "qwen"])
    parser.add_argument("--model-path", default=None)
    parser.add_argument("--use-int8", action="store_true")
    parser.add_argument("--use-fp8", action="store_true")
    parser.add_argument("--quant-mods", action="store_true")
    parser.add_argument("--height", type=int, default=1024)
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=25)
    parser.add_argument("--guidance-scale", type=float, default=3.5)
    parser.add_argument("--threshold", type=float, default=0.25)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--layers", type=int, default=None)
    parser.add_argument("--single-layers", type=int, default=None)
    parser.add_argument("--output", default="teacache_flux.json")
    parser.add_argument("--dual", action="store_true",
                        help="also fit negtive_coefficients from the true-CFG "
                             "negative branch (qwen; ref qwenimage_teacache_dual.py)")
    parser.add_argument("--algorithm", default="teacache",
                        choices=["teacache", "dicache"],
                        help="dicache records probe-block delta_y and sweeps "
                             "thresholds (flux; ref flux_dicache.py)")
    parser.add_argument("--probe-depth", type=int, default=1)
    args = parser.parse_args()
    {"flux": fit_flux, "sd35": fit_sd35, "qwen": fit_qwen}[args.architecture](args)


if __name__ == "__main__":
    main()
