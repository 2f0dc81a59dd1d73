"""Pipeline parallelism (PP) over the stacked DiT block axis (SURVEY.md §2.7,
§7 step 9 — new surface; the reference is single-GPU and has no PP).

Every model family in this framework stores its transformer blocks as ONE
stacked pytree with a leading layer axis and runs them with `lax.scan`
(models/flux.py, models/wan.py, ...). PP shards exactly that axis: a `pp`
mesh axis holds L/pp consecutive layers per device, and microbatches flow
stage-to-stage GPipe-style inside ONE `shard_map` — activations hop over ICI
via `lax.ppermute`, XLA overlaps the permute with the next microbatch's
compute. No per-layer host logic, no NCCL-style send/recv loops: the whole
pipeline (fills, steady state, drain) is a single `lax.fori_loop` traced once.

When to use which axis (the scaling-book recipe): tp for intra-layer
parallelism on the ICI-closest axis, sp for long-video attention, dp for
throughput, and pp when the model's WEIGHTS don't fit a chip but batch
throughput matters more than single-sample latency — the bubble fraction is
(pp-1)/(M+pp-1), so give it M >= pp microbatches (CFG pairs, server batches).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y.astype(x.dtype)), a, b
    )


def _tree_index(tree, i):
    return jax.tree_util.tree_map(
        lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False), tree
    )


def _tree_update_index(tree, val, i):
    return jax.tree_util.tree_map(
        lambda x, v: jax.lax.dynamic_update_index_in_dim(
            x, v.astype(x.dtype), i, 0
        ),
        tree, val,
    )


def gpipe_run_blocks(
    block_fn: Callable[[Any, Any], Any],
    stacked_params: Any,
    microbatches: Any,
    mesh: Mesh,
    axis: str = "pp",
) -> Any:
    """Run `block_fn` over all L stacked layers for each microbatch, with the
    layer axis sharded over `axis` and GPipe scheduling across stages.

    block_fn(one_layer_params, state) -> state — the SAME per-block function
    the sequential lax.scan uses (flux_dual_block, wan_block, ...), so PP is
    numerically identical to the single-device stack by construction. `state`
    may be any pytree (e.g. flux's (hidden, encoder) pair).

    stacked_params: pytree with leading layer axis L on every leaf (L % pp
    == 0; stages hold CONSECUTIVE layer slices so stage order == layer
    order). microbatches: pytree matching `state` with a leading M axis.

    Schedule: T = M + pp - 1 pipeline ticks. At tick t, stage 0 injects
    microbatch min(t, M-1) (re-injections past M are discarded — their
    results never reach the collect window), every stage applies its local
    L/pp layers (an inner lax.scan), the last stage collects microbatch
    t-(pp-1), and states rotate one hop over ICI via ppermute. Output is the
    (M, ...) stack of fully-processed states, replicated over `axis` by a
    final psum (only the last stage holds non-zero partials).
    """
    pp = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(stacked_params)
    num_layers = leaves[0].shape[0]
    if num_layers % pp:
        raise ValueError(
            f"stacked layer count {num_layers} not divisible by pp={pp}"
        )
    m_total = jax.tree_util.tree_leaves(microbatches)[0].shape[0]
    # dp composition: shard the microbatch stream over the mesh's dp axis so
    # each dp group pipelines only its own M/dp microbatches (otherwise every
    # replica would redundantly run the full stream — P() replication).
    # Each dp slice owns an independent pp ring: ppermute/psum over `axis`
    # never cross dp groups.
    dp = mesh.shape.get("dp", 1) if axis != "dp" else 1
    mb_axis = "dp" if dp > 1 and m_total % dp == 0 else None

    def staged(local_params, xs):
        # local (per-dp-shard) microbatch count — xs is the shard_map view
        num_mb = jax.tree_util.tree_leaves(xs)[0].shape[0]
        stage = jax.lax.axis_index(axis)

        def local_apply(state):
            def body(c, p):
                return block_fn(p, c), None

            out, _ = jax.lax.scan(body, state, local_params)
            return out

        state0 = _tree_index(xs, 0)
        # fresh zeros from shape/dtype — zeros_like on the closed-over OUTER
        # `microbatches` would drag their Auto-mesh sharding into this Manual
        # (shard_map) context and fail the mesh-context check
        outs0 = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, x.dtype), xs
        )
        perm = [(i, (i + 1) % pp) for i in range(pp)]

        def tick(t, carry):
            state, outs = carry
            inject = _tree_index(xs, jnp.minimum(t, num_mb - 1))
            state = _tree_where(stage == 0, inject, state)
            state = local_apply(state)
            oidx = jnp.clip(t - (pp - 1), 0, num_mb - 1)
            take = jnp.logical_and(stage == pp - 1, t >= pp - 1)
            prev = _tree_index(outs, oidx)
            outs = _tree_update_index(
                outs, _tree_where(take, state, prev), oidx
            )
            state = jax.tree_util.tree_map(
                lambda s: jax.lax.ppermute(s, axis, perm), state
            )
            return state, outs

        _, outs = jax.lax.fori_loop(0, num_mb + pp - 1, tick, (state0, outs0))
        # only the last stage wrote non-zeros; sum-broadcast to every stage
        return jax.tree_util.tree_map(
            lambda o: jax.lax.psum(o, axis), outs
        )

    pspec = jax.tree_util.tree_map(
        lambda leaf: P(*((axis,) + (None,) * (leaf.ndim - 1))), stacked_params
    )
    xspec = jax.tree_util.tree_map(lambda _: P(mb_axis), microbatches)
    outspec = jax.tree_util.tree_map(lambda _: P(mb_axis), microbatches)
    fn = jax.shard_map(
        staged, mesh=mesh, in_specs=(pspec, xspec), out_specs=outspec,
        check_vma=False,
    )
    return fn(stacked_params, microbatches)


def shard_stacked_layers(stacked_params, mesh: Mesh, axis: str = "pp"):
    """Place a layer-stacked block pytree with the LAYER axis sharded over
    `axis` — each pipeline stage's HBM holds only its own L/pp layers, which
    is the point of PP (weights that don't fit one chip)."""
    pp = mesh.shape[axis]

    def place(leaf):
        spec = (
            P(*((axis,) + (None,) * (leaf.ndim - 1)))
            if leaf.ndim and leaf.shape[0] % pp == 0 else P()
        )
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, stacked_params)


def shard_model_stacks_pp(params, mesh: Mesh, axis: str = "pp"):
    """Engine-level placement for PP: every top-level `*blocks` stack gets its
    LAYER axis sharded over `axis` (each stage's HBM holds only its own
    layers); everything else (embedders, norms, heads) replicates. Stacks
    whose depth pp doesn't divide stay replicated — the block runner then
    falls back to the sequential scan for them (models/flux.py
    _pp_applicable)."""
    pp = mesh.shape[axis]
    out = {}
    for k, v in params.items():
        leaves = jax.tree_util.tree_leaves(v)
        if ("blocks" in k and leaves and hasattr(leaves[0], "shape")
                and leaves[0].ndim and leaves[0].shape[0] % pp == 0):
            out[k] = shard_stacked_layers(v, mesh, axis)
        else:
            out[k] = jax.tree_util.tree_map(
                lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), v
            )
    return out


def pp_dryrun_step(n_devices: int) -> None:
    """Jit + run the flux dual/single block stacks through the GPipe schedule
    on an all-pp mesh and check numerical identity with the sequential scan.
    Runs on any backend (virtual CPU devices included)."""
    import numpy as np

    from fastdm_tpu.models.flux import (
        FluxConfig, flux_dual_block, flux_init_random, flux_rope_cache,
    )

    pp = min(4, n_devices)
    devs = np.asarray(jax.devices()[:pp])
    mesh = Mesh(devs, ("pp",))
    cfg = FluxConfig(
        num_layers=pp, num_single_layers=pp,
        attention_head_dim=32, num_attention_heads=4,
        joint_attention_dim=64, pooled_projection_dim=48,
        in_channels=16, out_channels=16,
        axes_dims_rope=(8, 12, 12), quant=None,
    )
    params = flux_init_random(jax.random.key(0), cfg)
    txt, ht, wt = 8, 4, 4
    m = 2 * pp  # M >= pp keeps the bubble under 50%
    k = jax.random.key(1)
    hidden = jax.random.normal(k, (m, 1, ht * wt, cfg.inner_dim), jnp.float32)
    encoder = jax.random.normal(k, (m, 1, txt, cfg.inner_dim), jnp.float32)
    temb = jax.random.normal(k, (1, cfg.inner_dim), jnp.float32)
    cos, sin = flux_rope_cache(cfg, txt, ht, wt)

    def dual_fn(p, state):
        h, e = state
        return flux_dual_block(p, h, e, temb, cos, sin, cfg)

    dual = shard_stacked_layers(params["dual_blocks"], mesh)
    out = jax.jit(
        lambda dp, mb: gpipe_run_blocks(dual_fn, dp, mb, mesh)
    )(dual, (hidden, encoder))

    # sequential reference: same blocks, plain scan per microbatch
    def seq_one(h, e):
        def body(c, p):
            return flux_dual_block(p, c[0], c[1], temb, cos, sin, cfg), None

        (h, e), _ = jax.lax.scan(body, (h, e), params["dual_blocks"])
        return h, e

    ref_h, ref_e = jax.vmap(seq_one)(hidden, encoder)
    np.testing.assert_allclose(
        np.asarray(out[0], np.float32), np.asarray(ref_h, np.float32),
        atol=5e-2)
    np.testing.assert_allclose(
        np.asarray(out[1], np.float32), np.asarray(ref_e, np.float32),
        atol=5e-2)
    bubble = (pp - 1) / (m + pp - 1)
    print(f"pp dryrun ok: gpipe == sequential over pp={pp}, M={m} "
          f"(bubble {bubble:.0%}), out {out[0].shape}")
