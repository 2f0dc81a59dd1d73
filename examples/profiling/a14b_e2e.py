"""Wan2.2-T2V-A14B REAL end-to-end denoise on one v5e: the measurement that
replaces the round-3 "~1000 s" arithmetic projection (VERDICT r3 missing #4).

Runs the ACTUAL engine computation — `make_wan_dual_host_denoiser`, the
per-forward-granularity form of the phase-split EP loop FastDMEngine ships
for dual-expert checkpoints (engine.py:_generate_wan). The host-stepped form
is required HERE because the axon dev tunnel kills any single execution at
~60 s (measured 2026-08-20) and one A14B CFG step is ~50-82 s; it computes
the same function as the scan form (equality-tested in tests/test_denoise.py)
with identical device residency (one expert at a time + host masters).
Workload:

  * 40 layers x 2 experts, int4p (W4A4 packed halves; ~7.3 GiB/expert), both
    experts HOST-resident, `place_params=jax.device_put` per phase
    (offload_inactive_expert) — the expert host->device swap is INSIDE the
    timed region,
  * 720x1280x81f (latents 21x90x160, 75600 tokens), 40 steps, CFG
    (80 transformer forwards),
  * UniPC shift 5.0, sigma boundary 0.875 (ref: fastdm/model_entry.py:673-690),
  * FBCache with the reference's published wan config (threshold 0.15,
    warmup 8, negtive_cache — examples/xcaching/configs/fbcache_wan.json),
    one state per expert per CFG branch,
  * radial super-gather sparse attention (bq256/grp32/sb4, the engine
    default).

Two sparse configs, selected by A14B_SPARSE=proj|ref|both (default both):
  proj — decay 0.2, dense_layers 0, dense_steps 0: the exact config the
         round-3 projection (24.91 s/forward x 80 x skip-rate) assumed.
  ref  — decay 0.3, dense_layers 1, dense_steps 11: the reference's OWN
         published radial config (examples/sparse/radial_attn_wan.json),
         i.e. what its 811 s H20 +sparse row ran.

For each config: run once cold (compile + expert transfers + exec), once
warm (fresh latents; compile cached — the steady-state serving number).
Compare to BASELINE.md: H20 +cache 1056 s, +cache+radial-sparse 811 s.

Run: nohup python -u examples/profiling/a14b_e2e.py > /tmp/a14b_e2e.log 2>&1 &
Env: A14B_SPARSE (above), A14B_STEPS (40), A14B_LAYERS (40), A14B_QUANT
(int4p), A14B_FRAMES/LH/LW (21/90/160 latent).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastdm_tpu.utils.profiling import enable_compilation_cache


def build_sparse(cfg, decay, tokens, lf):
    """Engine-identical super-gather tables (engine.py _generate_wan)."""
    import dataclasses as _dc

    from fastdm_tpu.kernels import contracts
    from fastdm_tpu.sparse.config import RadialAttnConfig
    from fastdm_tpu.sparse.xsparse import RadialAttn

    bq, grp, sb = 256, 32, 4
    cfg = _dc.replace(cfg, sparse_gather_fine_blocks=(bq, grp, 64),
                      sparse_gather_superblock=sb)
    cache = f"/tmp/a14b_tables/d{decay}_t{tokens}_f{lf}_{bq}_{grp}_{sb}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        idx, val, rows = z["idx"], z["val"], z["rows"]
    else:
        sp = RadialAttn(RadialAttnConfig(block_size=64, decay_factor=decay,
                                         model_type="wan"))
        sp.post_init(video_token_num=tokens, num_frame=lf)
        idx, val, rows = sp.block_lists_super(bq, grp // sb, sb)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache, idx=idx, val=val, rows=rows)
    contracts.check_gather_super(
        "a14b_e2e super tables", jnp.asarray(idx), jnp.asarray(val),
        jnp.asarray(rows), tokens, tokens, bq, grp // sb, 64, sb)
    fetched = rows[:, 1].sum() * sb / (rows.shape[0] * (-(-tokens // 64)))
    print(f"  super tables decay={decay}: {idx.shape[0]} entries, "
          f"fetched density {fetched:.3f}", flush=True)
    return cfg, (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(rows))


def main():
    enable_compilation_cache()
    from fastdm_tpu.caching.config import FBCacheConfig
    from fastdm_tpu.models.wan import (
        WanConfig, wan_init_random, wan_rope_cos_sin,
    )
    from fastdm_tpu.pipeline.denoise_more import make_wan_dual_host_denoiser
    from fastdm_tpu.pipeline.schedulers import UniPCMultistepScheduler

    steps = int(os.environ.get("A14B_STEPS", 40))
    layers = int(os.environ.get("A14B_LAYERS", 40))
    quant = os.environ.get("A14B_QUANT", "int4p")
    lf = int(os.environ.get("A14B_FRAMES", 21))
    lh = int(os.environ.get("A14B_LH", 90))
    lw = int(os.environ.get("A14B_LW", 160))
    which = os.environ.get("A14B_SPARSE", "both")

    base_cfg = WanConfig(num_layers=layers, quant=quant,
                     ffn_chunk_tokens=int(os.environ.get('A14B_CHUNK', 5400)),
                     split_qkv_proj=True)
    pt, ph, pw = base_cfg.patch_size
    tokens = (lf // pt) * (lh // ph) * (lw // pw)

    # Both 14B experts init HOST-resident (the offload_inactive_expert
    # residency: device peak must stay one expert + activations). The random
    # init+quant takes ~40 min on this 1-core host, so it is disk-cached via
    # the snapshot machinery (A14B_SNAPSHOT="" to disable).
    from fastdm_tpu.models import snapshot as snap

    cache_dir = os.environ.get("A14B_SNAPSHOT", "/root/a14b_experts_snapshot")
    cpu = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        if cache_dir and snap.is_snapshot(cache_dir):
            m = snap.load_manifest(cache_dir)
            snap.check_compatible(m, architecture="wan-a14b-bench",
                                  quant=quant, cfg=base_cfg)
            params = snap.load_tree(cache_dir, "expert_1", m)
            params_2 = snap.load_tree(cache_dir, "expert_2", m)
            src = "snapshot"
        else:
            params = jax.jit(lambda k: wan_init_random(k, base_cfg))(
                jax.random.key(0))
            params_2 = jax.jit(lambda k: wan_init_random(k, base_cfg))(
                jax.random.key(1))
            jax.block_until_ready((params, params_2))
            src = "random-init"
            if cache_dir:
                snap.save_snapshot(
                    cache_dir, {"expert_1": params, "expert_2": params_2},
                    architecture="wan-a14b-bench", quant=quant, cfg=base_cfg)
    wbytes = sum(x.size * x.dtype.itemsize
                 for x in jax.tree_util.tree_leaves(params))
    print(f"experts host-init ({src}): {time.perf_counter()-t0:.1f} s, "
          f"{wbytes/2**30:.2f} GiB each ({quant}), {tokens} tokens", flush=True)

    # A14B_THR: skip-rate calibration (0.15 = the reference's published wan
    # threshold; on synthetic weights it over-skips — 56/80 vs the implied
    # ~44/80 — so the rate-matched row sweeps this down, same honesty
    # policy as the flux/qwen TeaCache calibration in BENCH_NOTES)
    cache_cfg = FBCacheConfig(
        cache_algorithm="fbcache", enable_caching=True,
        threshold=float(os.environ.get("A14B_THR", 0.15)),
        warmup_steps=8, negtive_cache=True)
    sched = UniPCMultistepScheduler.create(steps, shift=5.0)

    kl, kp, kn = jax.random.split(jax.random.key(7), 3)
    pos_text = jax.random.normal(kp, (1, base_cfg.text_len, base_cfg.text_dim),
                                 jnp.bfloat16)
    neg_text = jax.random.normal(kn, (1, base_cfg.text_len, base_cfg.text_dim),
                                 jnp.bfloat16)
    cos, sin = wan_rope_cos_sin(base_cfg, lf, lh, lw)
    lat_shape = (1, base_cfg.in_channels, lf, lh, lw)

    modes = {
        "proj": dict(decay=0.2, dense_layers=0, dense_steps=0),
        "ref": dict(decay=0.3, dense_layers=1, dense_steps=11),
    }
    order = ["proj", "ref"] if which == "both" else [which]
    for name in order:
        m = modes[name]
        import dataclasses as _dc

        cfg = _dc.replace(base_cfg, dense_layers=m["dense_layers"])
        cfg, mask = build_sparse(cfg, m["decay"], tokens, lf // pt)
        run = make_wan_dual_host_denoiser(
            cfg, sched, steps, cache_cfg, 5.0, None, 0.875,
            dense_warmup_steps=m["dense_steps"],
            place_params=lambda p: jax.device_put(p, jax.devices()[0]))

        reps = ((0, "cold (compile+transfers+exec)"),) \
            if os.environ.get("A14B_COLD_ONLY") == "1" else \
            ((0, "cold (compile+transfers+exec)"), (1, "warm (steady-state)"))
        for rep, tag in reps:
            lat = jax.random.normal(jax.random.key(100 + rep), lat_shape,
                                    jnp.float32)
            t0 = time.perf_counter()
            out, skips = run(params, params_2, lat, pos_text, neg_text,
                             cos, sin, mask)
            np.asarray(out[..., :1, :1, :1])
            dt = time.perf_counter() - t0
            sk = int(np.asarray(skips))
            print(f"[{name}] {tag}: {dt:.1f} s, cache skipped {sk} "
                  f"forward-branches (of {2*steps}) | vs H20 +cache 1056 s "
                  f"-> {1056/dt:.2f}x, vs +sparse 811 s -> {811/dt:.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
