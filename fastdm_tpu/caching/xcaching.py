"""Step-skipping caches, on-device (ref: fastdm/caching/xcaching.py).

The reference decides skip/compute on the host, calling `.cpu().item()` every
step (xcaching.py:215) — a forced device sync. Here the decision is a
`lax.cond` over cache state carried through the denoise-loop scan, so the
whole multi-step generation stays one compiled XLA program with zero host
round-trips.

Algorithms (bit-for-bit decision logic vs the reference):
  * TeaCache (ref :156-276): probe = block-0 modulated input; rel-L1 distance
    rescaled by a fitted polynomial; accumulate until `threshold`, else replay
    previous residual. Forced compute at step 0.
  * FBCache (ref :279-418): always run block 0; rel-L1 of its output vs the
    previous step decides; `warmup_steps` forced computes.
  * DiCache (ref :420-556): probe = first `probe_depth` blocks; `delta_y` or
    `delta_minus` error; `ret_ratio * total_steps` warmup; on skip, 2-point
    residual extrapolation with gamma clipped to [1, 1.5].

Reference-verified semantics (easy to mistake for bugs — checked against
/root/reference/fastdm/caching/xcaching.py on 2026-08-17):
  * FBCache skip DISCARDS the freshly computed block-0 output and replays
    residual (= out - pre-block-0 input) on the raw input (ref :370-372).
  * DiCache skip replays residual (= out - PRE-probe input) on top of the
    probe OUTPUT (ref :503-512) — the probe delta is intentionally counted
    in both terms.
  * Warmup comparisons are `step <= warmup` (ref :352, :476): warmup+1
    forced computes.
  * No forced compute on the final step (ref forces step 0 only, :209).

Integration contract (used by model forwards):
    probe_fn(hidden, encoder) -> (probe_tensor, (h', e'))   # always runs
    rest_fn(h', e')           -> out_hidden                 # inside lax.cond
For TeaCache the probe is cheap and (h', e') == (hidden, encoder); for
FBCache/DiCache the probe IS the first block(s) and rest_fn continues from it.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from fastdm_tpu.caching.config import (
    CacheConfig,
    DiCacheConfig,
    FBCacheConfig,
    TeaCacheConfig,
)

Array = jax.Array
State = Dict[str, Array]


def _rel_l1(a: Array, b: Array) -> Array:
    a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
    return jnp.mean(jnp.abs(a32 - b32)) / jnp.maximum(jnp.mean(jnp.abs(b32)), 1e-12)


def cache_init_state(
    cfg: CacheConfig, hidden_shape, probe_shape, dtype=jnp.bfloat16
) -> State:
    """Zero-initialized cache state (one CFG stream). Shapes:
    hidden_shape — the image-stream hidden (B, S, D); probe_shape — the probe
    tensor shape for the chosen algorithm."""
    st = {
        "accum": jnp.zeros((), jnp.float32),
        "prev_probe": jnp.zeros(probe_shape, dtype),
        "prev_residual": jnp.zeros(hidden_shape, dtype),
        # on-device skip counter (observability parity with the reference's
        # per-step cache-skip prints, ref xcaching.py:219,361,492)
        "skips": jnp.zeros((), jnp.int32),
    }
    if isinstance(cfg, DiCacheConfig):
        # two-residual window for extrapolation + valid-entry count
        st["residual_m1"] = jnp.zeros(hidden_shape, dtype)  # most recent
        st["residual_m2"] = jnp.zeros(hidden_shape, dtype)
        st["window_count"] = jnp.zeros((), jnp.int32)
        st["prev_input"] = jnp.zeros(hidden_shape, dtype)  # for delta_minus
    return st


def _decide(cfg: CacheConfig, state: State, probe: Array, step: Array,
            total_steps: int, error: Array = None):
    """Returns (should_calc bool, new_accum). `error` overrides the default
    probe-vs-previous rel-L1 distance (DiCache's delta_minus)."""
    rel = _rel_l1(probe, state["prev_probe"]) if error is None else error
    if isinstance(cfg, TeaCacheConfig):
        coeffs = jnp.asarray(cfg.coefficients or (1.0, 0.0), jnp.float32)
        accum_cand = state["accum"] + jnp.polyval(coeffs, rel)
        forced = step == 0
    elif isinstance(cfg, FBCacheConfig):
        accum_cand = state["accum"] + rel
        forced = step <= cfg.warmup_steps
    elif isinstance(cfg, DiCacheConfig):
        # rel here is delta_y (probe vs previous probe output); delta_minus
        # additionally needs delta_x, handled by the caller via probe choice.
        accum_cand = state["accum"] + rel
        forced = step <= jnp.int32(cfg.ret_ratio * total_steps)
    else:
        raise ValueError(f"unknown cache config {type(cfg)}")
    should = forced | (accum_cand >= cfg.threshold)
    new_accum = jnp.where(should, 0.0, accum_cand)
    return should, new_accum


def cached_run(
    cfg: CacheConfig,
    state: State,
    step: Array,
    total_steps: int,
    hidden: Array,
    encoder: Array,
    probe_fn: Callable[[Array, Array], Tuple[Array, Tuple[Array, Array]]],
    rest_fn: Callable[[Array, Array], Array],
) -> Tuple[Array, State]:
    """Run one denoiser step under the cache policy. Pure; jit/scan-safe."""
    probe, (h_after, e_after) = probe_fn(hidden, encoder)

    if isinstance(cfg, DiCacheConfig) and cfg.rel_l1_distance_algo == "delta_minus":
        # error = |delta_y - delta_x| (ref xcaching.py:480-487). BOTH deltas
        # measure from the current PROBE OUTPUT (the reference overwrites
        # `hidden_states` with the probe-block result before computing them):
        # delta_x vs last step's ORIGINAL input, delta_y vs last step's
        # probe output.
        delta_x = _rel_l1(probe, state["prev_input"])
        delta_y = _rel_l1(probe, state["prev_probe"])
        should, new_accum = _decide(
            cfg, state, probe, step, total_steps,
            error=jnp.abs(delta_y - delta_x),
        )
    else:
        should, new_accum = _decide(cfg, state, probe, step, total_steps)

    def compute(_):
        out = rest_fn(h_after, e_after)
        residual = (out - hidden).astype(state["prev_residual"].dtype)
        return out, residual

    def skip(_):
        if isinstance(cfg, DiCacheConfig):
            # 2-point extrapolation when the window holds >= 2 residuals
            r1, r2 = state["residual_m1"], state["residual_m2"]
            gamma = jnp.clip(
                jnp.mean(jnp.abs(r2.astype(jnp.float32)))
                / jnp.maximum(
                    jnp.mean(jnp.abs((r1 - r2).astype(jnp.float32))), 1e-12
                ),
                1.0,
                1.5,
            )
            extrap = r2 + (gamma * (r1 - r2).astype(jnp.float32)).astype(r1.dtype)
            residual = jnp.where(state["window_count"] >= 2, extrap, state["prev_residual"])
            # DiCache replays on top of the probe-block output (ref :503-512)
            base = h_after
        else:
            residual = state["prev_residual"]
            base = hidden
        return (base + residual).astype(hidden.dtype), state["prev_residual"]

    out, residual = jax.lax.cond(should, compute, skip, None)

    new_state = dict(state)
    new_state["accum"] = new_accum
    new_state["skips"] = state["skips"] + jnp.where(should, 0, 1).astype(jnp.int32)
    new_state["prev_probe"] = probe.astype(state["prev_probe"].dtype)
    new_state["prev_residual"] = jnp.where(
        should, residual, state["prev_residual"]
    )
    if isinstance(cfg, DiCacheConfig):
        new_state["residual_m2"] = jnp.where(
            should, state["residual_m1"], state["residual_m2"]
        )
        new_state["residual_m1"] = jnp.where(should, residual, state["residual_m1"])
        new_state["window_count"] = jnp.where(
            should, state["window_count"] + 1, state["window_count"]
        )
        new_state["prev_input"] = hidden.astype(state["prev_input"].dtype)
    return out, new_state


def negative_stream_config(cfg: CacheConfig) -> CacheConfig:
    """Config for the NEGATIVE CFG stream. The reference's TeaCache selects
    the polynomial per stream — coefficients for "positive", 
    negtive_coefficients for "negative" (ref TeaCache.__init__ + 
    coefficients[cache_key], xcaching.py:160-163,213) — so a fitted negative
    polynomial must rescale that stream's distances. Other algorithms (and
    TeaCache without a fitted negative set) share the positive config."""
    import dataclasses

    if isinstance(cfg, TeaCacheConfig) and cfg.negtive_coefficients:
        return dataclasses.replace(cfg, coefficients=cfg.negtive_coefficients)
    return cfg


class AutoCache:
    """Config-driven factory (ref: AutoCache.from_json/from_dict,
    xcaching.py:42-60). Holds the frozen config; the on-device state lives in
    the denoise-loop carry, created by `init_state`."""

    def __init__(self, config: CacheConfig):
        self.config = config

    @classmethod
    def from_dict(cls, data) -> "AutoCache":
        return cls(CacheConfig.from_dict(data))

    @classmethod
    def from_json(cls, path: str) -> "AutoCache":
        return cls(CacheConfig.from_json(path))

    def init_state(self, hidden_shape, probe_shape, dtype=jnp.bfloat16) -> State:
        return cache_init_state(self.config, hidden_shape, probe_shape, dtype)

    def run(self, state, step, total_steps, hidden, encoder, probe_fn, rest_fn):
        return cached_run(
            self.config, state, step, total_steps, hidden, encoder, probe_fn, rest_fn
        )
