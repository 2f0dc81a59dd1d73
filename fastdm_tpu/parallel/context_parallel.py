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
    query: Array,  # (B, S_local, H, D) — sequence sharded over "sp"
    key: Array,
    value: Array,
    axis_name: str = "sp",
    scale: Optional[float] = None,
) -> Array:
    """Exact attention over the full (gathered) sequence with ring K/V rotation.

    Must run inside shard_map over a mesh with `axis_name`. Per ring step the
    local K/V shard moves to the next device (lax.ppermute) while each device
    accumulates its queries' online softmax against the shard it holds.
    """
    n = jax.lax.psum(1, axis_name)
    scale = (query.shape[-1] ** -0.5) if scale is None else scale
    b, s, h, d = query.shape

    q = jnp.transpose(query, (0, 2, 1, 3)).reshape(b * h, s, d)
    k = jnp.transpose(key, (0, 2, 1, 3)).reshape(b * h, s, d)
    v = jnp.transpose(value, (0, 2, 1, 3)).reshape(b * h, s, d)

    def step(carry, _):
        k_cur, v_cur, acc, m_run, l_run = carry
        pv, m_blk, l_blk = jax.vmap(lambda qq, kk, vv: _block_attn(qq, kk, vv, scale))(
            q, k_cur, v_cur
        )
        m_new = jnp.maximum(m_run, m_blk)
        alpha_run = jnp.exp(m_run - m_new)
        alpha_blk = jnp.exp(m_blk - m_new)
        acc = acc * alpha_run + pv * alpha_blk
        l_run = l_run * alpha_run + l_blk * alpha_blk
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, acc, m_new, l_run), None

    # initial accumulators must carry the same varying-axis type as q/k/v
    # under shard_map's per-axis typing (jax >= 0.9)
    acc0 = jax.lax.pvary(jnp.zeros((b * h, s, d), jnp.float32), (axis_name,))
    m0 = jax.lax.pvary(jnp.full((b * h, s, 1), -1e30, jnp.float32), (axis_name,))
    l0 = jax.lax.pvary(jnp.zeros((b * h, s, 1), jnp.float32), (axis_name,))
    (k, v, acc, m_run, l_run), _ = jax.lax.scan(
        step, (k, v, acc0, m0, l0), None, length=n
    )
    out = acc / jnp.maximum(l_run, 1e-20)
    out = out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
    return out.astype(query.dtype)


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
