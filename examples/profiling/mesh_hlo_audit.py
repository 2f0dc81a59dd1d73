"""HLO-level audit of the multi-chip story (VERDICT r3 next #5).

The repo's multi-chip perf thesis ("the mesh is the equalizer"; sp=8
Lightning ~ 14 s) rested on compile-level assumptions. This script makes
them auditable: it compiles the ACTUAL sharded steps on a virtual 8-device
CPU mesh, parses the optimized HLO, and records

  * collective op counts per compiled step (collective-permute, all-reduce,
    all-gather, reduce-scatter, all-to-all) with result shapes,
  * assertions on the structure the projection assumes:
      - ring attention's KV path is a pure ppermute chain — NO all-gather
        rematerializing the full sequence anywhere in the wan sp step,
      - flux TP is row-parallel all-reduce only — no full-weight gathers,
      - GPipe's stage hops are ppermutes,
  * per-step bytes over ICI at the REAL A14B / flux shapes (analytic shard
    sizes x the audited collective structure),
  * the scaling arithmetic behind the "sp=8 ~ 14 s Lightning" projection
    (BENCH_NOTES.md "Wan2.2-Lightning scaling analysis").

Writes doc/MESH_AUDIT.md. CPU-only (virtual devices):
  python examples/profiling/mesh_hlo_audit.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault("FASTDM_PALLAS_INTERPRET", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

COLLECTIVES = ("collective-permute", "all-reduce", "all-gather",
               "reduce-scatter", "all-to-all")


def collect(hlo: str):
    """Count collective ops (async start/done pairs count once) and collect
    their result shapes."""
    ops = {}
    for line in hlo.splitlines():
        m = re.search(
            r"= ((?:\()?[a-z0-9,\[\]{}: ()]*?) ?(collective-permute|all-reduce"
            r"|all-gather|reduce-scatter|all-to-all)(-start)?\(", line)
        if not m or "-done" in line:
            continue
        kind = m.group(2)
        shape = m.group(1).strip()
        ops.setdefault(kind, []).append(shape)
    return ops


def fmt(ops):
    out = []
    for k in COLLECTIVES:
        if k in ops:
            uniq = {}
            for s in ops[k]:
                uniq[s] = uniq.get(s, 0) + 1
            inner = ", ".join(f"{c}x {s}" for s, c in sorted(uniq.items()))
            out.append(f"    {k}: {len(ops[k])} ops [{inner}]")
    return "\n".join(out) if out else "    (none)"


def gathered_bf16_seq_bytes(ops, seq_total: int) -> int:
    """Total bytes of bf16 all-gather results that own the full sequence —
    a nonzero value means GSPMD rematerialized gathered K/V (ring broken)."""
    total = 0
    for s in ops.get("all-gather", []):
        for m in re.finditer(r"bf16\[([0-9,]+)\]", s):
            dims = [int(x) for x in m.group(1).split(",")]
            if seq_total in dims:
                total += int(np.prod(dims)) * 2
    return total


def audit_wan_sp():
    """Compile the wan forward with ring attention over sp=8 (tiny dims —
    collective STRUCTURE is dim-independent) and audit its HLO."""
    from jax.sharding import Mesh

    from fastdm_tpu.models.wan import WanConfig, wan_forward, wan_init_random
    from fastdm_tpu.parallel import cp_state
    from fastdm_tpu.parallel.mesh import AXES

    n = 8
    devs = np.asarray(jax.devices()[:n]).reshape(1, n, 1)
    mesh = Mesh(devs, AXES)
    cfg = WanConfig(num_attention_heads=2, attention_head_dim=24,
                    in_channels=4, out_channels=4, text_dim=16, freq_dim=8,
                    ffn_dim=32, num_layers=2, text_len=8, quant="int8")
    params = wan_init_random(jax.random.key(0), cfg)
    k = jax.random.key(1)
    lat = jax.random.normal(k, (1, 4, 2, 16, 16), jnp.bfloat16)  # 128 tokens
    text = jax.random.normal(k, (1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    t = jnp.full((1,), 500.0)
    cp_state.set_cp_mesh(mesh)
    try:
        hlo = (jax.jit(lambda p, l, tt, tx: wan_forward(p, cfg, l, tt, tx))
               .lower(params, lat, t, text).compile().as_text())
    finally:
        cp_state.set_cp_mesh(None)
    ops = collect(hlo)
    tokens = 2 * 8 * 8  # latent (f/pt)*(h/ph)*(w/pw) with patch (1,2,2)
    gathered = gathered_bf16_seq_bytes(ops, tokens)
    n_perm = len(ops.get("collective-permute", []))
    assert n_perm >= 2, f"ring needs k+v ppermutes, found {n_perm}"
    assert gathered == 0, (
        f"ring KV path broken: {gathered} bytes of full-sequence bf16 "
        f"all-gather in the sp step")
    return ops, dict(n_perm=n_perm, gathered_seq_bytes=gathered)


def audit_flux_tp():
    """Compile the flux forward with name-pattern TP over tp=4 and audit:
    row-parallel all-reduces only, no weight all-gathers."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fastdm_tpu.models.flux import (
        FluxConfig, flux_forward, flux_init_random, flux_rope_cache,
    )
    from fastdm_tpu.parallel.mesh import AXES, shard_flux_params

    devs = np.asarray(jax.devices()[:8]).reshape(2, 1, 4)
    mesh = Mesh(devs, AXES)
    cfg = FluxConfig(num_layers=2, num_single_layers=2,
                     attention_head_dim=32, num_attention_heads=4,
                     joint_attention_dim=64, pooled_projection_dim=48,
                     in_channels=16, out_channels=16,
                     axes_dims_rope=(8, 12, 12), quant="int8")
    params = shard_flux_params(flux_init_random(jax.random.key(0), cfg), mesh)
    b, txt, ht, wt = 2, 16, 8, 8
    k = jax.random.key(1)
    hidden = jax.device_put(
        jax.random.normal(k, (b, ht * wt, cfg.in_channels), jnp.bfloat16),
        NamedSharding(mesh, P("dp", None, None)))
    encoder = jax.random.normal(k, (b, txt, cfg.joint_attention_dim),
                                jnp.bfloat16)
    pooled = jax.random.normal(k, (b, cfg.pooled_projection_dim),
                               jnp.bfloat16)
    t = jnp.full((b,), 0.5, jnp.float32)
    g = jnp.full((b,), 3.5, jnp.float32)
    cos, sin = flux_rope_cache(cfg, txt, ht, wt)
    with mesh:
        hlo = (jax.jit(lambda p, h, e, pl, tt, gg: flux_forward(
            p, cfg, h, e, pl, tt, cos, sin, guidance=gg))
            .lower(params, hidden, encoder, pooled, t, g).compile().as_text())
    ops = collect(hlo)
    # weight gathers would be s8/int8 all-gathers at weight shapes; the spec
    # design allows NONE (qkv col-parallel, out rows reduce via all-reduce)
    w_gathers = [s for s in ops.get("all-gather", []) if "s8" in s]
    assert not w_gathers, f"TP gathered quantized weights: {w_gathers[:3]}"
    assert len(ops.get("all-reduce", [])) >= 1, "row-parallel all-reduce missing"
    return ops, dict(n_allreduce=len(ops.get("all-reduce", [])))


def audit_flux_pp():
    """Compile the GPipe pp=2 flux block stack and audit stage-hop
    ppermutes."""
    from jax.sharding import Mesh

    from fastdm_tpu.models.flux import (
        FluxConfig, flux_dual_block, flux_init_random,
        flux_rope_cache,
    )
    from fastdm_tpu.parallel.pipeline import gpipe_run_blocks

    devs = np.asarray(jax.devices()[:2]).reshape(2)
    mesh = Mesh(devs, ("pp",))
    cfg = FluxConfig(num_layers=4, num_single_layers=0,
                     attention_head_dim=32, num_attention_heads=4,
                     joint_attention_dim=64, pooled_projection_dim=48,
                     in_channels=16, out_channels=16,
                     axes_dims_rope=(8, 12, 12), quant=None)
    params = flux_init_random(jax.random.key(0), cfg)
    blocks = params["dual_blocks"]
    b, txt, s_img = 2, 8, 32
    k = jax.random.key(1)
    h = jax.random.normal(k, (b, 1, s_img, cfg.num_attention_heads * 32),
                          jnp.bfloat16)
    e = jax.random.normal(k, (b, 1, txt, cfg.num_attention_heads * 32),
                          jnp.bfloat16)
    temb = jax.random.normal(k, (b, 1, cfg.num_attention_heads * 32),
                             jnp.bfloat16)
    cos, sin = flux_rope_cache(cfg, txt, 4, 8)

    def block_fn(block, state):
        hh, ee, tt = state
        hh, ee = flux_dual_block(block, hh, ee, tt, cos, sin, cfg)
        return (hh, ee, tt)

    def run(blocks, mb):
        return gpipe_run_blocks(block_fn, blocks, mb, mesh, "pp")

    hlo = jax.jit(run).lower(blocks, (h, e, temb)).compile().as_text()
    ops = collect(hlo)
    n_perm = len(ops.get("collective-permute", []))
    assert n_perm >= 1, "GPipe stage hop ppermute missing"
    return ops, dict(n_perm=n_perm)


def ici_accounting():
    """Per-step ICI bytes at REAL shapes from the audited structure, and the
    Lightning projection arithmetic. v5e ICI: 4 links/chip at ~45 GB/s/dir
    usable per link -> ring neighbor bandwidth ~45 GB/s per direction; all
    hops below are neighbor hops (ring / stage)."""
    lines = []
    # ---- A14B sp=8 ring (720p 81f: S=75600, H=40, D=128, bf16, 40 layers)
    S, H, D, L, sp = 75600, 40, 128, 40, 8
    kv_shard = S // sp * H * D * 2          # one tensor, one device, bytes
    per_layer = 2 * (sp - 1) * kv_shard     # k+v, sp-1 rotations
    per_fwd = per_layer * L
    ici_bw = 45e9                           # per-direction neighbor, v5e
    t_ici_layer = kv_shard * 2 / ici_bw     # per rotation both tensors move
    # compute per rotation per device: full-seq attention split over sp^2
    # tiles -> per rotation each device does S/sp x S/sp x H x D x 4 flops
    flops_rot = (S // sp) * (S // sp) * H * D * 4
    tpu_rate = 104e12                       # measured dense bf16 @ this shape
    t_cmp_rot = flops_rot / tpu_rate
    lines.append("A14B sp=8 ring, per CFG-half forward:")
    lines.append(f"  KV shard {kv_shard/2**20:.1f} MiB/tensor/device; "
                 f"{2*(sp-1)}x rotations/layer -> "
                 f"{per_layer/2**30:.2f} GiB/layer, "
                 f"{per_fwd/2**30:.1f} GiB over ICI per forward")
    lines.append(f"  per rotation: compute {t_cmp_rot*1e3:.1f} ms vs ICI "
                 f"{t_ici_layer*1e3:.1f} ms -> compute-bound by "
                 f"{t_cmp_rot/t_ici_layer:.1f}x (permute overlaps with the "
                 f"next tile's compute inside the scan)")
    # Lightning projection: measured 24.91 s/forward super-sparse single chip
    # (BENCH_NOTES 2026-08-19); attention ~97% of the step at this shape and
    # attention splits 1/sp with ring overlap -> per-forward ~ t/sp + eps.
    # Lightning serves at guidance 1.0 (no CFG) -> 4 steps = 4 forwards.
    t1 = 24.91
    t8 = t1 * 0.97 / sp + t1 * 0.03
    lines.append(f"  Lightning (4 steps, guidance 1.0 -> 4 forwards): "
                 f"single-chip sparse forward {t1:.1f} s -> sp=8 ~ "
                 f"{t8:.2f} s/forward (0.97/sp attention + 0.03 residual) "
                 f"-> 4-step total ~ {4*t8:.1f} s vs H20 ~23 s")
    # ---- flux tp=4 (4096+333 tokens, inner 3072, 19 dual + 38 single)
    S_f, D_f = 4096 + 333, 3072
    n_ar = 2 * 19 + 1 * 38                  # audited: 2/dual-block, 1/single
    ar_bytes = S_f * D_f * 2                # bf16 activation, per all-reduce
    # ring all-reduce moves 2x bytes per device (reduce-scatter+all-gather)
    t_ar = n_ar * 2 * ar_bytes / ici_bw
    lines.append("FLUX tp=4, per forward:")
    lines.append(f"  {n_ar} row-parallel all-reduces x "
                 f"{ar_bytes/2**20:.1f} MiB -> ~{t_ar*1e3:.0f} ms ICI/step "
                 f"at 45 GB/s vs measured 521 ms int4p step: tp=4 splits "
                 f"matmul+attn time ~4x; projected step ~"
                 f"{521/4 + t_ar*1e3:.0f} ms")
    # ---- pp=2 stage hops (flux): one activation hop per microbatch per
    # stage boundary
    hop = S_f * D_f * 2
    lines.append("FLUX pp=2: 1 stage boundary, "
                 f"{hop/2**20:.1f} MiB activation hop per microbatch "
                 f"(overlapped with the next microbatch's stage compute; "
                 f"bubble (pp-1)/(M+pp-1))")
    return "\n".join(lines)


def main():
    sections = []
    print("auditing wan sp=8 ring step...", flush=True)
    ops, meta = audit_wan_sp()
    sections.append(("wan sp=8 ring forward (tiny dims, real structure)",
                     fmt(ops),
                     f"ppermutes={meta['n_perm']}, full-seq KV all-gather "
                     f"bytes={meta['gathered_seq_bytes']} (MUST be 0)"))
    print("auditing flux tp=4 step...", flush=True)
    ops, meta = audit_flux_tp()
    sections.append(("flux tp=4 int8 forward (dp=2 x tp=4)", fmt(ops),
                     f"all-reduces={meta['n_allreduce']}, quantized-weight "
                     f"all-gathers=0 (asserted)"))
    print("auditing flux pp=2 gpipe...", flush=True)
    ops, meta = audit_flux_pp()
    sections.append(("flux pp=2 GPipe dual stack", fmt(ops),
                     f"stage-hop ppermutes={meta['n_perm']}"))
    acct = ici_accounting()
    t8 = 24.91 * 0.97 / 8 + 24.91 * 0.03

    md = ["# Mesh HLO audit (2026-08-20)", "",
          "Compiled on a virtual 8-device CPU mesh (collective structure is",
          "backend- and dim-independent); producer: "
          "`examples/profiling/mesh_hlo_audit.py` (re-run it to refresh).",
          ""]
    for title, body, verdict in sections:
        md += [f"## {title}", "", "```", body, "```", "", f"**{verdict}**", ""]
    md += ["## ICI byte accounting at real shapes", "", "```", acct, "```",
           "",
           "The sp=8 Lightning projection is therefore: audited ring "
           "structure (pure ppermute chain) + measured single-chip forward "
           "(24.91 s super-sparse, BENCH_NOTES 2026-08-19) + the compute/ICI "
           f"ratio above (compute-bound, permutes overlap) -> "
           f"~{t8:.1f} s/forward, ~{4*t8:.0f} s for the 4-step guidance-1.0 "
           "run (Lightning serves without CFG), under the H20 ~23 s. It "
           "remains a projection until real multi-chip hardware is "
           "reachable, but every assumption is now an artifact: the HLO "
           "counts above regenerate with this script, and the dryrun "
           "asserts the ring/TP/GPipe structure every round.", ""]
    out = os.path.join(os.path.dirname(__file__), "..", "..", "doc",
                       "MESH_AUDIT.md")
    with open(out, "w") as f:
        f.write("\n".join(md))
    print(f"\nwrote {os.path.normpath(out)}")
    print(acct)


if __name__ == "__main__":
    main()
