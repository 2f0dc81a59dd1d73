"""Step-skipping caches (TeaCache / FBCache / DiCache) — on-device edition."""

from fastdm_tpu.caching.config import (  # noqa: F401
    CacheConfig,
    DiCacheConfig,
    FBCacheConfig,
    TeaCacheConfig,
)
from fastdm_tpu.caching.xcaching import AutoCache, cache_init_state, cached_run  # noqa: F401
