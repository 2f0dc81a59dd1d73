"""Structured logging + generation metrics (SURVEY.md §5.5 upgrade).

The reference is print-based (weight-loading progress, cache-skip
announcements); here: a namespaced logger plus a GenerationStats record the
engine fills per call (step-skip counters come back from the on-device cache
state, not per-step prints)."""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional

logger = logging.getLogger("fastdm_tpu")
if not logger.handlers:
    h = logging.StreamHandler()
    h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(h)
    logger.setLevel(logging.INFO)


@dataclasses.dataclass
class GenerationStats:
    architecture: str = ""
    height: int = 0
    width: int = 0
    num_frames: int = 1
    num_inference_steps: int = 0
    steps_computed: Optional[int] = None   # from cache state (None = no cache)
    steps_skipped: Optional[int] = None
    latency_s: float = 0.0
    compile_s: float = 0.0

    def log(self):
        skip = (
            f", skipped {self.steps_skipped}/{self.num_inference_steps} steps"
            if self.steps_skipped is not None
            else ""
        )
        logger.info(
            "%s %dx%d x%d steps=%d latency=%.2fs%s",
            self.architecture, self.height, self.width, self.num_frames,
            self.num_inference_steps, self.latency_s, skip,
        )


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
