"""Shared stacked-block scanning for cache probe-prefix re-entry.

`lax.scan` over a SLICED stacked-weight pytree (`blocks[start:]`) makes XLA
materialize the slice as an HLO temp — an extra near-full copy of the weight
stack, alive inside every cache `lax.cond` compute branch. Measured on
Wan2.2-A14B int4p @720p81f: ~6.9 GiB of s8 slice temps, the difference
between fitting and OOM on a 16 GiB v5e chip; for every family it is also a
per-step HBM write+read of the remaining stack on every non-skipped step.

`scan_suffix` scans layer INDICES and dynamic-indexes the full
closure-resident stack in place instead — the per-iteration working set is
identical to a plain scan (scan lowers to while + dynamic-slice anyway), but
no upfront copy exists.

Reference counterpart: the reference's cache hooks re-enter the torch block
ModuleList at an offset (fastdm/caching/xcaching.py, e.g. the
`start_block`-style loops at :276-320 and :503-556) — free for a Python list
of modules, which is why this cost class only exists on the XLA side.
"""

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp


def scan_suffix(body: Callable, carry: Any, xs: Any, start: int = 0,
                stop: int = None) -> Tuple[Any, Any]:
    """`jax.lax.scan(body, carry, xs[start:stop])` without materializing the
    sliced stack copy. `body`/return match `lax.scan` exactly; `xs` may be
    any pytree of arrays stacked on dim 0 (e.g. `(blocks, cn_residuals)`)."""
    n = jax.tree_util.tree_leaves(xs)[0].shape[0]
    if stop is None:
        stop = n
    if start <= 0 and stop >= n:
        return jax.lax.scan(body, carry, xs)

    def ibody(c, i):
        x = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
            xs)
        return body(c, x)

    return jax.lax.scan(ibody, carry, jnp.arange(start, stop))
