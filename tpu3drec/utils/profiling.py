"""Tracing / profiling utilities.

The reference threads wall-clock timing fields through every result
(SURVEY §5: FeatureData.detection_time, MethodResult timings,
ProcessingMetadata.method_timings) and profiles memory with
tracemalloc+psutil (benchmarking.py:697-742) but has no structured tracer.
This module provides the TPU-native upgrade:

- `Timer` / `span(...)`: lightweight named spans collected into a
  `ProfileCollector` (per-stage timing in result metadata);
- `trace_to(dir)`: a `jax.profiler` trace context producing TensorBoard-
  compatible device traces;
- `device_memory_stats()`: HBM usage from the backend where available,
  alongside host tracemalloc/psutil numbers.
"""

from __future__ import annotations

import contextlib
import time
import tracemalloc
from collections import defaultdict
from typing import Dict, Optional


class Timer:
    """Context-managed wall-clock timer."""

    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False


class ProfileCollector:
    """Accumulates named span durations; thread-unsafe by design (the
    pipelines are single-threaded hosts driving async device work)."""

    def __init__(self):
        self.spans: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.spans.items():
            out[name] = {"count": len(xs), "total_s": sum(xs),
                         "mean_s": sum(xs) / len(xs)}
        return out

    def reset(self) -> None:
        self.spans.clear()


_GLOBAL = ProfileCollector()


def span(name: str):
    """Global-collector span: `with span("detect"): ...`."""
    return _GLOBAL.span(name)


def global_summary() -> Dict:
    return _GLOBAL.summary()


@contextlib.contextmanager
def trace_to(log_dir: str):
    """jax.profiler device trace (TensorBoard format). Falls back to a
    no-op if the backend doesn't support profiling (e.g. tunneled
    remote-compile devices)."""
    import jax
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def device_memory_stats() -> Dict:
    """HBM + host memory snapshot (reference memory profiling analogue)."""
    out: Dict = {}
    try:
        import jax
        stats = jax.devices()[0].memory_stats()
        if stats:
            out["device_bytes_in_use"] = int(stats.get("bytes_in_use", 0))
            out["device_peak_bytes"] = int(stats.get("peak_bytes_in_use", 0))
            out["device_limit_bytes"] = int(stats.get("bytes_limit", 0))
    except Exception:
        pass
    try:
        import psutil
        out["host_rss_bytes"] = psutil.Process().memory_info().rss
    except Exception:
        pass
    if tracemalloc.is_tracing():
        cur, peak = tracemalloc.get_traced_memory()
        out["traced_current_bytes"] = cur
        out["traced_peak_bytes"] = peak
    return out
