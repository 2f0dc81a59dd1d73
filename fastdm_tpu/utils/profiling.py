"""Profiling utilities (ref: fastdm/utils/profiling.py + fastdm/kernel/utils.py).

The reference has a cuda-sync `time_record` decorator and a `benchmark_kernel`
micro-benchmark helper; the TPU equivalents sync via block_until_ready and can
wrap a region in a jax.profiler trace for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Dict, List

import jax

do_time_prof = False  # module flag, same contract as the reference (:5)
time_records: Dict[str, List[float]] = {}


def time_record(name: str | None = None) -> Callable:
    """Decorator: device-synced wall time appended to `time_records[name]`
    when `do_time_prof` is set (ref: utils/profiling.py:7-17)."""

    def deco(fn: Callable) -> Callable:
        key = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if not do_time_prof:
                return fn(*args, **kwargs)
            # drain previously enqueued device work first (the reference
            # decorator cuda-syncs before AND after) — JAX dispatch is async,
            # so without this t0 includes unrelated queued work
            jax.block_until_ready(jax.numpy.zeros(()))
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
            time_records.setdefault(key, []).append(time.perf_counter() - t0)
            return out

        return wrapper

    return deco


def benchmark_kernel(fn: Callable, *args, warmup: int = 3, reps: int = 20) -> float:
    """Best-of-reps latency in seconds, device-synced
    (ref: fastdm/kernel/utils.py:17-34)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    if out is not None:
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def kernel_output_assert_close(a, b, atol=1.8e-2, rtol=1.6e-2) -> None:
    """(ref: fastdm/kernel/utils.py kernel_output_assert_close)"""
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), atol=atol, rtol=rtol
    )


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fastdm_trace"):
    """jax.profiler trace region — view with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

def enable_compilation_cache(path: str = "/tmp/fastdm_jax_cache") -> None:
    """Persistent XLA compilation cache — repeat engine runs skip the
    multi-minute TPU compiles."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
