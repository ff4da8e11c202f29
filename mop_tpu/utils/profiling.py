"""Profiling and throughput instrumentation (SURVEY §5.1: the reference has
no tracing/profiling beyond wall-clock minutes; the TPU build provides
jax.profiler trace hooks and a built-in throughput meter).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

# Peak dense bf16 TFLOPS per chip by jax device_kind (public specs) — the
# single source for MFU lines in bench.py / tools/bench_imagenet.py.
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v4": 275e12,
    "TPU v5": 459e12,       # v5p
    "TPU v6 lite": 918e12,  # v6e / Trillium
}


def chip_peak_bf16_flops() -> float | None:
    """Peak bf16 FLOPS of device 0, or None for unknown chips."""
    try:
        return PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
    except Exception:  # pragma: no cover
        return None


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mop_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class ThroughputMeter:
    """Step/sample throughput tracker with warmup exclusion.

    Use ``sync_fn`` to force device completion before reading timings (on the
    tunneled TPU backend a host transfer is the only reliable barrier).
    """

    def __init__(self, warmup_steps: int = 5):
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self):
        self._steps = 0
        self._samples = 0
        self._t0: Optional[float] = None

    def step(self, n_samples: int):
        self._steps += 1
        if self._steps == self.warmup_steps:
            self._t0 = time.perf_counter()
            self._samples = 0
        elif self._steps > self.warmup_steps:
            self._samples += n_samples

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self._steps <= self.warmup_steps:
            return 0.0
        dt = time.perf_counter() - self._t0
        return (self._steps - self.warmup_steps) / max(dt, 1e-9)

    @property
    def samples_per_sec(self) -> float:
        if self._t0 is None:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._samples / max(dt, 1e-9)

    def per_chip(self, value: float) -> float:
        return value / max(1, len(jax.devices()))
