"""Radial block-sparse attention mask (ref: fastdm/sparse/xsparse.py).

The reference builds the static O(n log n) radial mask on the GPU once, then
converts its 128-block layout per CUDA arch (sm90 vs other, xsparse.py:230-250)
to satisfy SpargeAttn's kernel shapes. Here the mask is generated host-side in
numpy (it is static per video shape) at the Pallas kernel's native block
granularity — no layout conversions exist by construction.

Mask semantics (bit-for-bit vs gen_log_mask_shrinked, xsparse.py:71-183):
  * frame-pair windows halve with log2 of inter-frame distance
    (get_window_width), scaled by decay_factor,
  * frames whose decay window shrank below one block keep only every
    split_factor-th diagonal (get_diagonal_split_mask),
  * frame 0 is an attention sink for wan (every query attends to it),
  * per-block shrinking keeps a block if >60% of its non-zero columns have
    density > 1/3 (shrinkMaskStrict).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Type

import numpy as np

from fastdm_tpu.sparse.config import RadialAttnConfig, SparseConfig


def _window_width(dist: int, token_per_frame: int, cfg: RadialAttnConfig) -> float:
    """(ref: get_window_width, xsparse.py:130-148)"""
    if cfg.model_type == "wan":
        if dist < 1:
            return token_per_frame
        if dist == 1:
            return token_per_frame // 2
    elif cfg.model_type == "hunyuan":
        if dist <= 1:
            return token_per_frame
    else:
        raise ValueError(f"unknown model type {cfg.model_type!r}")
    group = dist.bit_length()
    decay_length = 2 ** token_per_frame.bit_length() / 2**group * cfg.decay_factor
    return max(decay_length, cfg.block_size)


def _diagonal_split_keep(dist: int, token_per_frame: int, cfg: RadialAttnConfig) -> bool:
    """(ref: get_diagonal_split_mask, xsparse.py:115-128)"""
    group = dist.bit_length()
    decay_length = 2 ** token_per_frame.bit_length() / 2**group
    if decay_length >= cfg.block_size:
        return True
    split_factor = int(cfg.block_size / decay_length)
    return dist % split_factor == 0


def _shrink_mask_strict(mask: np.ndarray, block_size: int) -> np.ndarray:
    """(ref: shrinkMaskStrict, xsparse.py:171-183)"""
    n = mask.shape[0] // block_size
    m = mask.shape[1] // block_size
    blocks = mask[: n * block_size, : m * block_size].reshape(n, block_size, m, block_size)
    col_density = blocks.sum(axis=1) / block_size  # (n, m, block_size)
    non_zero = (col_density > 0).sum(axis=-1)
    high = (col_density > 1 / 3).sum(axis=-1)
    return high / (non_zero + 1e-9) > 0.6


def radial_block_mask(
    video_token_num: int,
    num_frame: int,
    cfg: RadialAttnConfig,
    total_tokens: Optional[int] = None,
) -> np.ndarray:
    """Static radial block mask, (ceil(S/bs), ceil(S/bs)) bool
    (ref: gen_log_mask_shrinked, xsparse.py:71-112). Rows/cols beyond the
    video tokens (text etc.) are dense."""
    bs = cfg.block_size
    s = total_tokens if total_tokens is not None else video_token_num
    nb = -(-s // bs)
    final = np.zeros((nb, nb), dtype=bool)
    tpf = video_token_num // num_frame
    border = video_token_num // bs
    final[border:, :] = True
    final[:, border:] = True

    cols = np.arange(tpf)[None, :]
    rows = np.arange(tpf)[:, None]
    for i in range(num_frame):
        for j in range(num_frame):
            if j == 0 and cfg.model_type == "wan":  # attention sink
                local = np.ones((tpf, tpf), dtype=bool)
            else:
                dist = abs(i - j)
                ww = _window_width(dist, tpf, cfg)
                local = np.abs(cols - rows) <= ww
                if not _diagonal_split_keep(dist, tpf, cfg):
                    local = np.zeros((tpf, tpf), dtype=bool)
            rem_r = (i * tpf) % bs
            rem_c = (j * tpf) % bs
            all_r = rem_r + (-(-tpf // bs)) * bs
            all_c = rem_c + (-(-tpf // bs)) * bs
            padded = np.zeros((all_r, all_c), dtype=bool)
            padded[rem_r : rem_r + tpf, rem_c : rem_c + tpf] = local
            block = _shrink_mask_strict(padded, bs)
            r0, c0 = (i * tpf) // bs, (j * tpf) // bs
            final[r0 : r0 + block.shape[0], c0 : c0 + block.shape[1]] |= block
    return final


class SparseAttn:
    """Config-driven factory (ref: SparseAttn, xsparse.py:7-41)."""

    _registry: Dict[str, Type["SparseAttn"]] = {}

    def __init__(self, config: SparseConfig):
        self.config = config
        self.video_token_num = None
        self.num_frame = None
        self._mask_cache: Dict[tuple, np.ndarray] = {}

    @classmethod
    def register(cls, name: str):
        def deco(sub):
            cls._registry[name.lower()] = sub
            return sub

        return deco

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "SparseAttn":
        config = SparseConfig.from_dict(data)
        sub = cls._registry.get(config.sparse_algorithm.lower())
        if sub is None:
            raise ValueError(f"unknown sparse algorithm {config.sparse_algorithm!r}")
        return sub(config)

    @classmethod
    def from_json(cls, path: str) -> "SparseAttn":
        import json

        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))

    def post_init(self, video_token_num: int, num_frame: int) -> None:
        """(ref: RadialAttn.post_init, xsparse.py:56-58)"""
        self.video_token_num = video_token_num
        self.num_frame = num_frame

    def block_mask(self, batch: int, heads: int) -> np.ndarray:
        raise NotImplementedError


@SparseAttn.register("radial")
class RadialAttn(SparseAttn):
    def _mask2d(self) -> np.ndarray:
        key = (self.video_token_num, self.num_frame)
        if key not in self._mask_cache:
            self._mask_cache[key] = radial_block_mask(
                self.video_token_num, self.num_frame, self.config
            )
        return self._mask_cache[key]

    def block_mask(
        self, batch: int = 1, heads: int = 1, block_tokens: Optional[int] = None
    ) -> np.ndarray:
        """(B, H, nb, nb) int32 mask for the masked Pallas kernel.

        block_tokens: granularity the CONSUMER tiles at (the kernel's
        block_q/block_k). The native mask is at `config.block_size` (64 in
        the reference radial config); coarser requests OR blocks together (a
        safe superset — never drops attention), finer requests repeat them.
        This is the TPU analog of the reference's 128<->64 mask layout
        conversion (sparge_mask_convert, ref xsparse.py:230-250). Default
        None = native granularity."""
        m = self._mask2d()
        bs = self.config.block_size
        bt = bs if block_tokens is None else block_tokens
        if bt < 1:
            raise ValueError(f"block_tokens must be >= 1, got {bt}")
        if bt != bs:
            if bt % bs == 0:
                from fastdm_tpu.kernels.pallas.attention import coarsen_block_mask

                f = bt // bs
                m = coarsen_block_mask(m, f, f)
            elif bs % bt == 0:
                f = bs // bt
                m = np.repeat(np.repeat(m, f, axis=0), f, axis=1)
            else:
                raise ValueError(
                    f"block_tokens {bt} incompatible with mask block_size {bs}"
                )
        m = m.astype(np.int32)
        return np.broadcast_to(m[None, None], (batch, heads, *m.shape)).copy()

    def block_lists(self, q_tokens: int = 512, k_tokens: int = 1024):
        """Compacted per-q-block active KV lists for the gather kernel:
        (indices (nq, max_nb) i32, counts (nq, 1) i32). DMA-skips masked
        blocks — the radial mask is batch/head-independent so one table
        serves every (b, h).

        q_tokens/k_tokens are the gather kernel's TILE SIZES IN TOKENS
        (WanConfig.sparse_gather_blocks); the coarsening factors are derived
        from the mask's own `block_size` (64 in the reference's radial
        config) so the emitted indices address k_tokens-sized tiles. A
        factor mismatch here is an out-of-bounds DMA on hardware (caught on
        v5e 2026-08-17; the mask granularity is config-dependent, never
        assume 128). Coarsening ORs mask blocks together, trading sparsity
        for per-tile efficiency; 512x1024 tiles measured 1.33x over dense at
        the A14B 75k-token shape, coarse density 0.603 (128-tiles were
        SLOWER than dense)."""
        from fastdm_tpu.kernels.pallas.attention import mask_to_block_lists

        bs = self.config.block_size
        if q_tokens % bs or k_tokens % bs:
            raise ValueError(
                f"gather tile sizes ({q_tokens}, {k_tokens}) must be "
                f"multiples of the radial mask block_size {bs}"
            )
        idx, cnt, _ = mask_to_block_lists(
            self._mask2d(), q_tokens // bs, k_tokens // bs
        )
        return idx, cnt

    def block_lists_fine(self, q_tokens: int = 512, group: int = 8):
        """Fine-granularity gather tables for `sdpa_gather_fine`: per q tile
        (q_tokens wide, OR-coarsened in q only) the COMPACTED list of active
        fine KV blocks at the mask's native block_size granularity, in
        CSR-FLAT form — one flat index array holding every row's group-padded
        segment back to back, plus a (nq, 2) [start, count] row table. The
        flat layout makes the scalar-prefetch SMEM footprint the number of
        ACTIVE blocks (~density * nq * nfine) instead of nq * max_row_width,
        which is what lets small q tiles (block_q 256) fit the 1 MB SMEM.

        Keeping the K axis at native granularity is the whole point: the
        compute tiles are assembled from compacted ACTIVE blocks, so the MXU
        work ratio vs dense equals the fine mask density (0.234 at the A14B
        shape) instead of the OR-coarsened density the (q_tokens, k_tokens)
        tiles of block_lists pay (0.603 -> the measured 1.33x ceiling).

        Returns (indices (T,) i32, valid (T,) i32, rows (nq, 2) i32) where
        row r's segment is indices[start_r : start_r + ceil(cnt_r/group) *
        group]; valid is block_size for interior blocks, the tail remainder
        for the global last block, 0 for padding slots."""
        from fastdm_tpu.kernels.pallas.attention import coarsen_block_mask

        bs = self.config.block_size
        if q_tokens % bs:
            raise ValueError(
                f"q_tokens {q_tokens} must be a multiple of the radial mask "
                f"block_size {bs}"
            )
        m = coarsen_block_mask(self._mask2d(), q_tokens // bs, 1)
        nq, nfine = m.shape
        # the mask covers ceil(S/bs) blocks; the last one may be partial
        total = self.video_token_num
        tail_id = nfine - 1
        tail_valid = total - tail_id * bs if total > tail_id * bs else bs
        idx_segs, val_segs = [], []
        rows = np.zeros((nq, 2), np.int32)
        start = 0
        for r in range(nq):
            active = np.nonzero(m[r])[0].astype(np.int32)
            padded = -(-max(1, len(active)) // group) * group
            seg_i = np.zeros(padded, np.int32)
            seg_v = np.zeros(padded, np.int32)
            seg_i[: len(active)] = active
            seg_v[: len(active)] = np.where(
                active == tail_id, min(tail_valid, bs), bs
            )
            rows[r] = (start, len(active))
            start += padded
            idx_segs.append(seg_i)
            val_segs.append(seg_v)
        return np.concatenate(idx_segs), np.concatenate(val_segs), rows

    def block_lists_super(self, q_tokens: int = 512, group: int = 8,
                          superblock: int = 4):
        """SUPERBLOCK gather tables for `sdpa_gather_super`: like
        block_lists_fine, but each entry addresses an aligned run of
        `superblock` consecutive fine blocks, with a per-entry BITMASK of
        which fine sub-blocks are active. Radial masks are diagonal bands
        (85% of active fine blocks sit in fully-active aligned 4-runs at the
        A14B shape — BENCH_NOTES), so superblock fetches keep DMA transfers
        4x larger at ~15% extra fetched bytes, attacking the scattered-DMA
        bandwidth bound the slots sweep proved (depth was a null result).
        The kernel masks inactive sub-blocks exactly, so attention semantics
        stay bit-parity with the 64-token radial spec.

        Returns (indices (T,) i32 SUPERBLOCK ids, valbits (T,) i32 bitmask
        of active sub-blocks (bit j = fine block sid*superblock+j active;
        0 for padding slots), rows (nq, 2) i32 [start, count])."""
        from fastdm_tpu.kernels.pallas.attention import coarsen_block_mask

        bs = self.config.block_size
        if q_tokens % bs:
            raise ValueError(
                f"q_tokens {q_tokens} must be a multiple of the radial mask "
                f"block_size {bs}"
            )
        sb = superblock
        m = coarsen_block_mask(self._mask2d(), q_tokens // bs, 1)
        nq, nfine = m.shape
        nsuper = -(-nfine // sb)
        mp = np.zeros((nq, nsuper * sb), bool)
        mp[:, :nfine] = m
        weights = (1 << np.arange(sb)).astype(np.int32)
        idx_segs, val_segs = [], []
        rows = np.zeros((nq, 2), np.int32)
        start = 0
        bits_all = (1 << sb) - 1
        for r in range(nq):
            sub = mp[r].reshape(nsuper, sb)
            act = np.nonzero(sub.any(axis=1))[0].astype(np.int32)
            bits = (sub[act] * weights[None, :]).sum(axis=1).astype(np.int32)
            # FULL superblocks first: attention is order-invariant over KV
            # blocks, and clustering partial entries into the tail group(s)
            # lets the kernel's clean fast path (no column mask) cover most
            # groups — at sb=4 boundary blocks otherwise taint nearly every
            # group with the masked path (BENCH_NOTES superblock A/B)
            order = np.argsort(bits != bits_all, kind="stable")
            act, bits = act[order], bits[order]
            padded = -(-max(1, len(act)) // group) * group
            seg_i = np.zeros(padded, np.int32)
            seg_v = np.zeros(padded, np.int32)
            seg_i[: len(act)] = act
            seg_v[: len(act)] = bits
            rows[r] = (start, len(act))
            start += padded
            idx_segs.append(seg_i)
            val_segs.append(seg_v)
        return np.concatenate(idx_segs), np.concatenate(val_segs), rows
