"""Structured metrics + per-stage timing (SURVEY.md §5.1/§5.5).

The reference's observability is cout prose + chrono prints
(`src/System.cc:156-194`, `Examples/Monocular_LoadImages.cpp:112-124`).
Here: a process-wide metrics registry with counters, gauges and stage
timers, dumpable as JSON; `stage_timer` wraps device calls with
block_until_ready so timings are real. Hookable into jax.profiler traces
for xprof.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path


class Metrics:
    def __init__(self):
        self.counters: dict[str, int] = defaultdict(int)
        self.gauges: dict[str, float] = {}
        self.stage_ms: dict[str, list[float]] = defaultdict(list)

    def count(self, name: str, n: int = 1) -> None:
        self.counters[name] += n

    def gauge(self, name: str, value: float) -> None:
        self.gauges[name] = float(value)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """Time a stage; `sync` (e.g. a jax array) is block_until_ready'd
        before stopping the clock so device work is included."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            self.stage_ms[name].append(1e3 * (time.perf_counter() - t0))

    def summary(self) -> dict:
        import numpy as np

        stages = {
            k: {
                "n": len(v),
                "median_ms": float(np.median(v)),
                "p90_ms": float(np.percentile(v, 90)),
                "total_ms": float(np.sum(v)),
            }
            for k, v in self.stage_ms.items() if v
        }
        return {
            "counters": dict(self.counters),
            "gauges": self.gauges,
            "stages": stages,
        }

    def dump(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.summary(), indent=2))


GLOBAL = Metrics()


@contextlib.contextmanager
def profiler_trace(log_dir: str | Path):
    """xprof-compatible device trace (`jax.profiler`), SURVEY §5.1."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
