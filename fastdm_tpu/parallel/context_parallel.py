"""Context parallelism: ring attention over the mesh's "sp" axis.

The reference scales long video sequences ONLY within one GPU (radial
sparsity + head-splitting, SURVEY.md §5.7); this module adds the scale-OUT
lever: queries stay sharded over devices while K/V blocks rotate around the
ring via collective permute, with online-softmax accumulation — each chip
holds 1/N of the sequence, attention stays exact.

Built on shard_map + lax.ppermute (XLA schedules the transfers on ICI and
overlaps them with the per-step attention compute).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def _block_attn(q, k, v, scale):
    """Unnormalized block attention: returns (pv (Sq,D), m (Sq,1), l (Sq,1))."""
    s = jnp.einsum("qd,kd->qk", q, k, preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum("qk,kd->qd", p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return pv, m, l


def ring_attention(
    query: Array,  # (B, S_local, H_q, D) — sequence sharded over "sp"
    key: Array,    # (B, S_local, H_kv, D) — H_kv may divide H_q (GQA)
    value: Array,
    axis_name: str = "sp",
    scale: Optional[float] = None,
) -> Array:
    """Exact attention over the full (gathered) sequence with ring K/V rotation.

    Must run inside shard_map over a mesh with `axis_name`. Per ring step the
    local K/V shard moves to the next device (lax.ppermute) while each device
    accumulates its queries' online softmax against the shard it holds.

    Only n-1 rotations run (the last shard's result is never needed past its
    own compute), and for GQA only the kv heads cross ICI — the repeat to
    query-head count happens locally after each transfer.
    """
    n = jax.lax.psum(1, axis_name)
    scale = (query.shape[-1] ** -0.5) if scale is None else scale
    b, s, h, d = query.shape
    h_kv = key.shape[2]
    rep = h // h_kv

    q = jnp.transpose(query, (0, 2, 1, 3)).reshape(b * h, s, d)
    # K/V stay at kv-head width in the ring carry: (B, H_kv, S, D)
    k = jnp.transpose(key, (0, 2, 1, 3))
    v = jnp.transpose(value, (0, 2, 1, 3))

    def accumulate(k_cur, v_cur, acc, m_run, l_run):
        if rep > 1:
            k_use = jnp.repeat(k_cur, rep, axis=1).reshape(b * h, s, d)
            v_use = jnp.repeat(v_cur, rep, axis=1).reshape(b * h, s, d)
        else:
            k_use = k_cur.reshape(b * h, s, d)
            v_use = v_cur.reshape(b * h, s, d)
        pv, m_blk, l_blk = jax.vmap(lambda qq, kk, vv: _block_attn(qq, kk, vv, scale))(
            q, k_use, v_use
        )
        m_new = jnp.maximum(m_run, m_blk)
        alpha_run = jnp.exp(m_run - m_new)
        alpha_blk = jnp.exp(m_blk - m_new)
        acc = acc * alpha_run + pv * alpha_blk
        l_run = l_run * alpha_run + l_blk * alpha_blk
        return acc, m_new, l_run

    def step(carry, _):
        k_cur, v_cur, acc, m_run, l_run = carry
        acc, m_new, l_run = accumulate(k_cur, v_cur, acc, m_run, l_run)
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, acc, m_new, l_run), None

    # initial accumulators must carry the same varying-axis type as q/k/v
    # under shard_map's per-axis typing (jax >= 0.9)
    if hasattr(jax.lax, "pcast"):
        _vary = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")
    else:  # older jax spelling
        _vary = lambda x: jax.lax.pvary(x, (axis_name,))
    acc0 = _vary(jnp.zeros((b * h, s, d), jnp.float32))
    m0 = _vary(jnp.full((b * h, s, 1), -1e30, jnp.float32))
    l0 = _vary(jnp.zeros((b * h, s, 1), jnp.float32))
    (k, v, acc, m_run, l_run), _ = jax.lax.scan(
        step, (k, v, acc0, m0, l0), None, length=n - 1
    )
    # final shard: compute only — its rotated-out copy is never consumed
    acc, m_run, l_run = accumulate(k, v, acc, m_run, l_run)
    out = acc / jnp.maximum(l_run, 1e-20)
    out = out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
    return out.astype(query.dtype)


def _repeat_kv(t: Array, reps: int) -> Array:
    if reps == 1:
        return t
    b, s, h, d = t.shape
    return jnp.broadcast_to(t[:, :, :, None, :], (b, s, h, reps, d)).reshape(
        b, s, h * reps, d
    )


def sdpa_ring(
    query: Array,
    key: Array,
    value: Array,
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    is_causal: bool = False,
    scale: Optional[float] = None,
) -> Array:
    """Registry backend "ring" for the dense sdpa op: exact attention with
    the sequence sharded over the active CP mesh's axis (set via
    cp_state.set_cp_mesh). Same flattened-head contract as the jnp/pallas
    backends; S must divide the sp axis size."""
    from fastdm_tpu.kernels.registry import kernel_registry
    from fastdm_tpu.parallel import cp_state

    mesh = cp_state.get_cp_mesh()
    axis = cp_state.get_cp_axis()
    if is_causal:
        raise NotImplementedError("ring sdpa is non-causal (diffusion attention)")
    assert mesh is not None, "sdpa_ring needs an active CP mesh (cp_state)"

    b, sq, _ = query.shape
    skv = key.shape[1]
    q = query.reshape(b, sq, num_q_heads, head_dim)
    # K/V stay at kv-head width: the ring rotates (and the cross path
    # replicates) only the kv heads; GQA expansion happens locally after
    # the transfer so ICI never carries the repeated bytes
    k = key.reshape(b, skv, num_kv_heads, head_dim)
    v = value.reshape(b, skv, num_kv_heads, head_dim)
    reps = num_q_heads // num_kv_heads

    sp = mesh.shape[axis]
    sm = (head_dim ** -0.5) if scale is None else scale

    if sq % sp:
        # query stream not shardable (odd joint lengths): single-device impl
        return kernel_registry.select("sdpa", "jnp")(
            query, key, value, num_q_heads, num_kv_heads, head_dim,
            is_causal, scale,
        )

    if sq == skv:
        # self-attention: K/V shards rotate around the ring
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(None, axis, None, None),) * 3,
            out_specs=P(None, axis, None, None),
        )
        def attn(q, k, v):
            return ring_attention(q, k, v, axis_name=axis, scale=sm)

        out = attn(q, k, v)
    else:
        # cross-attention (short text/image context): queries stay sharded,
        # K/V replicate — every chip attends locally, zero per-layer comm
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(None, axis, None, None), P(), P()),
            out_specs=P(None, axis, None, None),
        )
        def attn(q, k, v):
            k = _repeat_kv(k, reps)
            v = _repeat_kv(v, reps)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * sm
            p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            return jnp.einsum(
                "bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32
            ).astype(q.dtype)

        out = attn(q, k, v)
    return out.reshape(b, sq, num_q_heads * head_dim).astype(query.dtype)


def _register():
    from fastdm_tpu.kernels.registry import kernel_registry

    kernel_registry.register("sdpa", "ring")(sdpa_ring)


_register()


def make_cp_attention(mesh: Mesh, axis_name: str = "sp"):
    """Returns attn(q, k, v) over (B, S, H, D) arrays sequence-sharded on
    `axis_name`; drop-in for single-chip sdpa when sequences exceed one
    chip's HBM (Wan 81-frame+)."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None),) * 3,
        out_specs=P(None, axis_name, None, None),
    )
    def attn(q, k, v):
        return ring_attention(q, k, v, axis_name=axis_name)

    return jax.jit(attn)
