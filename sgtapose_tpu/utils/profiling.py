"""Profiling + per-stage timing.

Replaces the reference's ad-hoc time.time() spans (ref sgta_detector.py:
117-222 load/pre/net/dec/post/merge/track buckets, commented-out timers in
decode.py / image_proc.py) with:
  * StageTimer — accumulating per-stage wall-clock buckets with the same
    bucket names for the detector loop
  * trace() — jax.profiler TensorBoard trace context for TPU timelines
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in sorted(self.totals)
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace (view in TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
