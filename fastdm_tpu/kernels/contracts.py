"""Kernel-boundary contract checks (SURVEY §5.2 rebuild note).

The reference guards its extension entry points with TORCH_CHECK contracts
(ref: csrc/torch_bindings.cpp:31-123); the Pallas wrappers get the same
treatment here. All checks are SHAPE/DTYPE checks that run at trace time —
zero runtime cost under jit — except the block-list VALUE checks, which run
only when the arrays are concrete (host-built tables) and are backstopped by
an in-graph clip in the wrapper.

Motivation: a mask-granularity mismatch once sent out-of-range block indices
into the gather kernel's index_map — an OOB DMA that the CPU interpreter
hides and the chip reports as an opaque "TPU backend error (Internal)"
(BENCH_NOTES.md 2026-08-17). This class of bug should die in Python.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _is_concrete(x) -> bool:
    return not isinstance(x, jax.core.Tracer)


def _fail(kernel: str, msg: str):
    raise ValueError(f"[{kernel}] contract violation: {msg}")


def check_sdpa(kernel: str, query, key, value, num_q_heads: int,
               num_kv_heads: int, head_dim: int) -> None:
    if query.ndim != 3 or key.ndim != 3 or value.ndim != 3:
        _fail(kernel, f"q/k/v must be (B, S, H*D); got ndims "
                      f"{query.ndim}/{key.ndim}/{value.ndim}")
    if query.shape[0] != key.shape[0] or key.shape[0] != value.shape[0]:
        _fail(kernel, f"batch mismatch: q{query.shape} k{key.shape} v{value.shape}")
    if key.shape[1] != value.shape[1]:
        _fail(kernel, f"kv seq mismatch: k{key.shape} v{value.shape}")
    if query.shape[2] != num_q_heads * head_dim:
        _fail(kernel, f"q feature dim {query.shape[2]} != num_q_heads*head_dim "
                      f"{num_q_heads}*{head_dim}")
    if key.shape[2] != num_kv_heads * head_dim or value.shape[2] != num_kv_heads * head_dim:
        _fail(kernel, f"k/v feature dim {key.shape[2]}/{value.shape[2]} != "
                      f"num_kv_heads*head_dim {num_kv_heads}*{head_dim}")
    if num_kv_heads <= 0 or num_q_heads % num_kv_heads:
        _fail(kernel, f"num_q_heads {num_q_heads} not a multiple of "
                      f"num_kv_heads {num_kv_heads}")
    if head_dim % 8:
        _fail(kernel, f"head_dim {head_dim} must be a multiple of 8 (sublane)")


def check_block_tiles(kernel: str, block_q: int, block_k: int) -> None:
    # q/k tile sizes land on the SUBLANE axis of their (tile, head_dim)
    # blocks — 16 covers both f32 (8) and bf16 (16) packing. The
    # granularity-mismatch bug class (token-level masks fed as block lists)
    # is caught by the value-range checks below, not the tile check.
    if block_q % 16 or block_k % 16:
        _fail(kernel, f"tile sizes ({block_q}, {block_k}) must be multiples of "
                      "16 (sublane packing); token-granularity masks must be "
                      "retiled first (SparseAttn.block_mask/block_lists)")


def check_gather_lists(kernel: str, block_indices, block_counts,
                       sq: int, skv: int, block_q: int, block_k: int) -> None:
    """The gather kernel's scalar-prefetch tables: indices address
    block_k-sized tiles of the PADDED kv array; one row per padded q tile."""
    check_block_tiles(kernel, block_q, block_k)
    ni = -(-sq // block_q)
    nkv = -(-skv // block_k)
    if block_indices.ndim != 2:
        _fail(kernel, f"block_indices must be (nq, max_nb), got {block_indices.shape}")
    if block_indices.shape[0] != ni:
        _fail(kernel, f"block_indices rows {block_indices.shape[0]} != "
                      f"ceil(sq/block_q) = ceil({sq}/{block_q}) = {ni} — "
                      "q-tile granularity mismatch between the mask tables "
                      "and the kernel")
    if tuple(block_counts.shape) != (ni, 1):
        _fail(kernel, f"block_counts must be ({ni}, 1), got {block_counts.shape}")
    for name, arr in (("block_indices", block_indices), ("block_counts", block_counts)):
        if arr.dtype != jnp.int32:
            _fail(kernel, f"{name} dtype {arr.dtype} != int32")
    if block_indices.shape[1] > nkv:
        _fail(kernel, f"max_nb {block_indices.shape[1]} > kv tiles {nkv}")
    # value checks only when host-concrete (the tables are built host-side;
    # inside jit the wrapper's clip is the backstop)
    if _is_concrete(block_indices):
        mx = int(np.max(np.asarray(block_indices)))
        if mx >= nkv:
            _fail(kernel, f"block index {mx} out of range: kv has {nkv} tiles "
                          f"of {block_k} tokens (skv={skv}) — granularity "
                          "mismatch would OOB-DMA on hardware")
        if int(np.min(np.asarray(block_indices))) < 0:
            _fail(kernel, "negative block index")
    if _is_concrete(block_counts):
        c = np.asarray(block_counts)
        if int(c.max()) > block_indices.shape[1] or int(c.min()) < 0:
            _fail(kernel, f"block_counts out of [0, max_nb={block_indices.shape[1]}]: "
                          f"[{int(c.min())}, {int(c.max())}]")


def check_gather_fine(kernel: str, block_indices, block_valid, block_rows,
                      sq: int, skv: int, block_q: int, group: int,
                      fine: int) -> None:
    """CSR-flat fine-gather tables: block_indices is ONE flat array of
    group-padded per-row segments addressing FINE (fine-token) kv blocks;
    block_rows[r] = (start, count). The kernel DMA-gathers whole groups, so
    each segment (and the flat length) must be group-aligned; a bad start or
    index would OOB-DMA on hardware, so the concrete checks are strict."""
    if fine % 8 or (group * fine) % 128:
        _fail(kernel, f"fine={fine} must be a multiple of 8 and group*fine="
                      f"{group * fine} a multiple of 128 (sublane/lane)")
    if block_q % 128:
        _fail(kernel, f"block_q {block_q} must be a multiple of 128")
    ni = -(-sq // block_q)
    nfine = -(-skv // fine)
    if block_indices.ndim != 1:
        _fail(kernel, f"block_indices must be flat (T,), got "
                      f"{block_indices.shape}")
    T = block_indices.shape[0]
    if T % group:
        _fail(kernel, f"flat table length {T} not a multiple of group {group}")
    if block_valid.shape != block_indices.shape:
        _fail(kernel, f"block_valid {block_valid.shape} != block_indices "
                      f"{block_indices.shape}")
    if tuple(block_rows.shape) != (ni, 2):
        _fail(kernel, f"block_rows must be ({ni}, 2) [start, count], got "
                      f"{block_rows.shape} — q-tile granularity mismatch")
    for name, arr in (("block_indices", block_indices),
                      ("block_valid", block_valid),
                      ("block_rows", block_rows)):
        if arr.dtype != jnp.int32:
            _fail(kernel, f"{name} dtype {arr.dtype} != int32")
    if _is_concrete(block_indices):
        a = np.asarray(block_indices)
        if a.size and (int(a.max()) >= nfine or int(a.min()) < 0):
            _fail(kernel, f"fine block index out of range [0, {nfine}) for "
                          f"skv={skv} at fine={fine} — would OOB-DMA on "
                          "hardware")
    if _is_concrete(block_valid):
        a = np.asarray(block_valid)
        if a.size and (int(a.max()) > fine or int(a.min()) < 0):
            _fail(kernel, f"block_valid out of [0, {fine}]")
    if _is_concrete(block_rows):
        r = np.asarray(block_rows)
        starts, cnts = r[:, 0], r[:, 1]
        if (starts % group).any():
            _fail(kernel, f"row starts must be group-aligned (group={group})")
        if (cnts < 0).any():
            _fail(kernel, "negative row count")
        # kernel reads ceil(cnt/group) whole groups from start (0 for cnt=0)
        ends = starts + -(-cnts // group) * group
        if (ends > T).any():
            _fail(kernel, f"row segment exceeds flat table length {T} — "
                          "would OOB-read SMEM / OOB-DMA on hardware")


def check_gather_super(kernel: str, block_indices, block_valbits, block_rows,
                       sq: int, skv: int, block_q: int, group: int,
                       fine: int, superblock: int) -> None:
    """Superblock gather tables (RadialAttn.block_lists_super): CSR-flat
    like the fine form, but indices address aligned runs of `superblock`
    fine blocks and block_valbits holds the per-entry active-sub-block
    BITMASK (0 for padding slots)."""
    if superblock < 1:
        _fail(kernel, f"superblock {superblock} must be >= 1")
    if fine % 8 or (group * superblock * fine) % 128:
        _fail(kernel, f"fine={fine} must be a multiple of 8 and group*"
                      f"superblock*fine={group * superblock * fine} a "
                      "multiple of 128 (sublane/lane)")
    if block_q % 128:
        _fail(kernel, f"block_q {block_q} must be a multiple of 128")
    ni = -(-sq // block_q)
    nsuper = -(-(-(-skv // fine)) // superblock)
    if block_indices.ndim != 1:
        _fail(kernel, f"block_indices must be flat (T,), got "
                      f"{block_indices.shape}")
    T = block_indices.shape[0]
    if T % group:
        _fail(kernel, f"flat table length {T} not a multiple of group {group}")
    if block_valbits.shape != block_indices.shape:
        _fail(kernel, f"block_valbits {block_valbits.shape} != block_indices "
                      f"{block_indices.shape}")
    if tuple(block_rows.shape) != (ni, 2):
        _fail(kernel, f"block_rows must be ({ni}, 2) [start, count], got "
                      f"{block_rows.shape} — q-tile granularity mismatch")
    for name, arr in (("block_indices", block_indices),
                      ("block_valbits", block_valbits),
                      ("block_rows", block_rows)):
        if arr.dtype != jnp.int32:
            _fail(kernel, f"{name} dtype {arr.dtype} != int32")
    if _is_concrete(block_indices):
        a = np.asarray(block_indices)
        if a.size and (int(a.max()) >= nsuper or int(a.min()) < 0):
            _fail(kernel, f"superblock index out of range [0, {nsuper}) for "
                          f"skv={skv} at fine={fine} x superblock="
                          f"{superblock} — would OOB-DMA on hardware")
    if _is_concrete(block_valbits):
        a = np.asarray(block_valbits)
        if a.size and (int(a.max()) >= (1 << superblock) or int(a.min()) < 0):
            _fail(kernel, f"valbits out of [0, {(1 << superblock) - 1}]")
    if _is_concrete(block_rows):
        r = np.asarray(block_rows)
        starts, cnts = r[:, 0], r[:, 1]
        if (starts % group).any():
            _fail(kernel, f"row starts must be group-aligned (group={group})")
        if (cnts < 0).any():
            _fail(kernel, "negative row count")
        ends = starts + -(-cnts // group) * group
        if (ends > T).any():
            _fail(kernel, f"row segment exceeds flat table length {T} — "
                          "would OOB-read SMEM / OOB-DMA on hardware")


def check_sparse_mask(kernel: str, sparse_mask, batch: int, heads: int,
                      sq: int, skv: int, block_q: int, block_k: int) -> None:
    check_block_tiles(kernel, block_q, block_k)
    ni = -(-sq // block_q)
    nj = -(-skv // block_k)
    if sparse_mask.ndim != 4:
        _fail(kernel, f"sparse_mask must be (B, H, nq, nkv), got {sparse_mask.shape}")
    if tuple(sparse_mask.shape) != (batch, heads, ni, nj):
        _fail(kernel, f"sparse_mask {sparse_mask.shape} != expected "
                      f"({batch}, {heads}, {ni}, {nj}) for S=({sq}, {skv}) at "
                      f"tiles ({block_q}, {block_k}) — retile the mask to the "
                      "consumer granularity (SparseAttn.block_mask)")


def check_scaled_mm(kernel: str, a, b, scale_a, scale_b, azp_adj=None,
                    azp=None, bias=None, int8=False) -> None:
    if a.ndim != 2 or b.ndim != 2:
        _fail(kernel, f"a/b must be 2D, got {a.shape}/{b.shape}")
    m, k = a.shape
    if b.shape[0] != k:
        _fail(kernel, f"inner dims disagree: a{a.shape} @ b{b.shape}")
    n = b.shape[1]
    if int8 and (a.dtype != jnp.int8 or b.dtype != jnp.int8):
        _fail(kernel, f"int8 path needs int8 operands, got {a.dtype}/{b.dtype}")
    if scale_a.size not in (1, m):
        _fail(kernel, f"scale_a size {scale_a.size} != per-token ({m}) or scalar")
    if scale_b.size not in (1, n):
        _fail(kernel, f"scale_b size {scale_b.size} != per-channel ({n}) or scalar")
    if azp_adj is not None and azp_adj.size != n:
        _fail(kernel, f"azp_adj (weight colsum) size {azp_adj.size} != N {n}")
    if azp is not None and azp.size != m:
        _fail(kernel, f"azp (per-token zero point) size {azp.size} != M {m}")
    if bias is not None and bias.size != n:
        _fail(kernel, f"bias size {bias.size} != N {n}")
