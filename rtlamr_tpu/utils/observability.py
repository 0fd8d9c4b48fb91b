"""Observability: structured logging, throughput counters, profiler hooks.

The reference's observability is slog text logging (main.go:298-317), a
startup config dump (decode.go:73-90) and a receive-rate watchdog warning
below 90% of the configured sample rate (main.go:189-196). This module
provides those plus what a TPU deployment adds: a metrics registry of
samples/windows/messages counters with derived rates, and jax.profiler
trace capture around the hot loop (SURVEY.md §5.1 build target).
"""

from __future__ import annotations

import contextlib
import logging
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

log = logging.getLogger("rtlamr_tpu")


def setup_logging(level: int = logging.INFO, stream=None) -> None:
    """slog-style key=value text logging to stderr (main.go:298-317)."""
    handler = logging.StreamHandler(stream or sys.stderr)
    handler.setFormatter(
        logging.Formatter(
            "time=%(asctime)s level=%(levelname)s source=%(name)s msg=%(message)s",
            datefmt="%Y-%m-%dT%H:%M:%S",
        )
    )
    root = logging.getLogger("rtlamr_tpu")
    root.handlers[:] = [handler]
    root.setLevel(level)


@dataclass
class Metrics:
    """Counter registry with derived rates (the reference has none)."""

    started: float = field(default_factory=time.monotonic)
    samples_in: int = 0
    windows_decoded: int = 0
    messages_out: int = 0
    messages_dropped_filter: int = 0
    messages_dropped_dup: int = 0
    hit_overflows: int = 0
    extra: Dict[str, float] = field(default_factory=dict)

    def elapsed(self) -> float:
        return time.monotonic() - self.started

    def samples_per_second(self) -> float:
        dt = self.elapsed()
        return self.samples_in / dt if dt > 0 else 0.0

    def snapshot(self) -> Dict[str, float]:
        return {
            "elapsed_s": round(self.elapsed(), 3),
            "samples_in": self.samples_in,
            "windows_decoded": self.windows_decoded,
            "messages_out": self.messages_out,
            "messages_dropped_filter": self.messages_dropped_filter,
            "messages_dropped_dup": self.messages_dropped_dup,
            "hit_overflows": self.hit_overflows,
            "samples_per_second": round(self.samples_per_second(), 1),
            **self.extra,
        }


class RateWatchdog:
    """Warn when the receive rate drops below 90% of the configured sample
    rate, checked at 1 Hz (main.go:161,189-196)."""

    def __init__(self, sample_rate: int, warn=None):
        self.sample_rate = sample_rate
        self.warn = warn or (lambda msg: log.warning(msg))
        self._last_tick = time.monotonic()
        self._bytes = 0

    def add_bytes(self, n: int) -> None:
        self._bytes += n
        now = time.monotonic()
        if now - self._last_tick >= 1.0:
            rate = self._bytes >> 1  # bytes -> samples
            if rate < self.sample_rate * 9 // 10:
                self.warn(f"not keeping up with sample stream rate={rate}")
            self._bytes = 0
            self._last_tick = now


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace capture around the decode loop (view in
    TensorBoard / xprof). No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in profiler traces (host + device timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
