"""Cache decision-logic tests (TeaCache/FBCache/DiCache) — pure, on-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastdm_tpu.caching.config import CacheConfig, DiCacheConfig, FBCacheConfig, TeaCacheConfig
from fastdm_tpu.caching.xcaching import cache_init_state, cached_run


def _mk(cfg, shape=(1, 8, 16)):
    state = cache_init_state(cfg, shape, shape, jnp.float32)
    hidden = jnp.ones(shape, jnp.float32)
    encoder = jnp.zeros(shape, jnp.float32)
    return state, hidden, encoder


def _probe_identity(h, e):
    return h, (h, e)


def _rest_double(h, e):
    return h * 2.0


def test_teacache_step0_forced_compute():
    cfg = TeaCacheConfig(cache_algorithm="teacache", enable_caching=True,
                         threshold=1e9, coefficients=(1.0, 0.0))
    state, hidden, encoder = _mk(cfg)
    out, st = cached_run(cfg, state, jnp.int32(0), 25, hidden, encoder,
                         _probe_identity, _rest_double)
    np.testing.assert_allclose(np.asarray(out), 2.0)  # computed
    np.testing.assert_allclose(np.asarray(st["prev_residual"]), 1.0)  # out - in
    assert float(st["accum"]) == 0.0


def test_teacache_skip_replays_residual():
    cfg = TeaCacheConfig(cache_algorithm="teacache", enable_caching=True,
                         threshold=1e9, coefficients=(1.0, 0.0))
    state, hidden, encoder = _mk(cfg)
    _, st = cached_run(cfg, state, jnp.int32(0), 25, hidden, encoder,
                       _probe_identity, _rest_double)
    # step 1, same probe -> rel distance 0 -> accum < huge threshold -> skip
    out, st2 = cached_run(cfg, st, jnp.int32(1), 25, hidden * 3, encoder,
                          lambda h, e: (hidden, (h, e)), _rest_double)
    np.testing.assert_allclose(np.asarray(out), np.asarray(hidden * 3 + st["prev_residual"]))
    # residual unchanged on skip
    np.testing.assert_allclose(np.asarray(st2["prev_residual"]), np.asarray(st["prev_residual"]))


def test_teacache_threshold_triggers_compute():
    cfg = TeaCacheConfig(cache_algorithm="teacache", enable_caching=True,
                         threshold=0.05, coefficients=(1.0, 0.0))
    state, hidden, encoder = _mk(cfg)
    _, st = cached_run(cfg, state, jnp.int32(0), 25, hidden, encoder,
                       _probe_identity, _rest_double)
    # probe drifts 100% -> rel-L1 = big -> accum >= threshold -> compute
    out, st2 = cached_run(cfg, st, jnp.int32(1), 25, hidden * 2, encoder,
                          _probe_identity, _rest_double)
    np.testing.assert_allclose(np.asarray(out), 4.0)  # recomputed (2x * 2)
    assert float(st2["accum"]) == 0.0


def test_fbcache_warmup_forces_compute():
    cfg = FBCacheConfig(cache_algorithm="fbcache", enable_caching=True,
                        threshold=1e9, warmup_steps=3)
    state, hidden, encoder = _mk(cfg)
    for step in range(3):
        out, state = cached_run(cfg, state, jnp.int32(step), 25, hidden, encoder,
                                _probe_identity, _rest_double)
        np.testing.assert_allclose(np.asarray(out), 2.0)
    # past warmup with identical probe -> skip
    out, state = cached_run(cfg, state, jnp.int32(4), 25, hidden, encoder,
                            _probe_identity, _rest_double)
    np.testing.assert_allclose(np.asarray(out), np.asarray(hidden + state["prev_residual"]))


def test_dicache_extrapolation_window():
    cfg = DiCacheConfig(cache_algorithm="dicache", enable_caching=True,
                        threshold=1e9, probe_depth=1, ret_ratio=0.08)
    state, hidden, encoder = _mk(cfg)
    # steps 0..2 within ret_ratio*25=2 warmup -> compute, fills window
    for step in range(3):
        out, state = cached_run(cfg, state, jnp.int32(step), 25, hidden, encoder,
                                _probe_identity, _rest_double)
    assert int(state["window_count"]) >= 2
    # skip step: base is probe output (h_after), plus extrapolated residual
    out, state = cached_run(cfg, state, jnp.int32(3), 25, hidden, encoder,
                            _probe_identity, _rest_double)
    # residuals identical (= 1.0) -> extrapolation degenerates to r (gamma clipped)
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-5)


def test_config_json_roundtrip(tmp_path):
    """Reference JSON config files parse unchanged (same keys/spelling)."""
    import json

    f = tmp_path / "cache.json"
    f.write_text(json.dumps({
        "cache_algorithm": "teacache",
        "enable_caching": True,
        "threshold": 0.25,
        "coefficients": [4.98, -2.83, 5.58, -3.82, 0.264],
        "negtive_cache": False,
    }))
    cfg = CacheConfig.from_json(str(f))
    assert isinstance(cfg, TeaCacheConfig)
    assert cfg.threshold == 0.25
    assert cfg.coefficients == (4.98, -2.83, 5.58, -3.82, 0.264)


def test_cached_run_is_scannable():
    """The cache state threads through lax.scan (the denoise-loop carry)."""
    cfg = TeaCacheConfig(cache_algorithm="teacache", enable_caching=True,
                         threshold=0.5, coefficients=(1.0, 0.0))
    state, hidden, encoder = _mk(cfg)

    def body(carry, step):
        h, st = carry
        out, st = cached_run(cfg, st, step, 8, h, encoder,
                             _probe_identity, _rest_double)
        return (out, st), out.mean()

    (final, _), means = jax.lax.scan(body, (hidden, state), jnp.arange(8))
    assert jnp.isfinite(final).all() and means.shape == (8,)


def test_negative_stream_config_selects_negtive_coefficients():
    """The reference's TeaCache rescales each CFG stream with its own
    polynomial (coefficients[cache_key], ref xcaching.py:160-163,213);
    negative_stream_config builds the negative-stream view of the config."""
    from fastdm_tpu.caching.config import FBCacheConfig, TeaCacheConfig
    from fastdm_tpu.caching.xcaching import negative_stream_config

    cfg = TeaCacheConfig(cache_algorithm="teacache", enable_caching=True,
                         threshold=0.2, coefficients=(1.0, 0.0),
                         negtive_coefficients=(2.0, 3.0))
    neg = negative_stream_config(cfg)
    assert neg.coefficients == (2.0, 3.0)
    assert cfg.coefficients == (1.0, 0.0)  # original untouched (frozen)

    # without a fitted negative polynomial the positive one is shared
    cfg2 = TeaCacheConfig(cache_algorithm="teacache", enable_caching=True,
                          coefficients=(1.0, 0.0))
    assert negative_stream_config(cfg2) is cfg2
    # non-TeaCache algorithms never split
    fb = FBCacheConfig(cache_algorithm="fbcache", enable_caching=True)
    assert negative_stream_config(fb) is fb
