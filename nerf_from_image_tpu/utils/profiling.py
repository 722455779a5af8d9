"""Profiling and throughput instrumentation.

The reference's observability is wall-clock prints + TensorBoard scalars
(reference: run.py:955, 1192-1198, 2319-2323). Here the same counters are
provided plus first-class XLA device traces (jax.profiler) — the headline
metric is rays/s/chip.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Captures an XLA device trace viewable in TensorBoard's profiler."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Images/s and rays/s counters (exponential window)."""

    def __init__(self, rays_per_image: Optional[int] = None):
        self.rays_per_image = rays_per_image
        self._t0 = time.perf_counter()
        self._images = 0

    def update(self, n_images: int):
        self._images += n_images

    @property
    def images_per_s(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._images / dt if dt > 0 else 0.0

    @property
    def rays_per_s(self) -> float:
        if not self.rays_per_image:
            return 0.0
        return self.images_per_s * self.rays_per_image

    def reset(self):
        self._t0 = time.perf_counter()
        self._images = 0


def time_jitted(fn, *args, iters: int = 5, warmup: int = 2) -> float:
    """Honest per-call wall time of a jitted function (syncs every call)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
