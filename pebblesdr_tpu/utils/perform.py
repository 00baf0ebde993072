"""Perform: stage timing (min/max/avg) — the reference's rdtsc-style profiler
(pebblelib/perform.h:18-41) as a context-manager, plus jax.profiler hooks."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Perform:
    def __init__(self):
        self.samples: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def stats(self, name: str, skip_warmup: int = 1) -> dict:
        xs = self.samples.get(name, [])
        xs = xs[skip_warmup:] if len(xs) > skip_warmup else xs
        if not xs:
            return {}
        return {
            "min": round(min(xs) * 1e3, 3),
            "max": round(max(xs) * 1e3, 3),
            "avg": round(sum(xs) / len(xs) * 1e3, 3),
            "n": len(xs),
        }

    def report(self) -> dict:
        return {k: self.stats(k) for k in self.samples}


@contextlib.contextmanager
def trace(dirname: str):
    """jax.profiler trace wrapper: with trace('/tmp/jax-trace'): ... then open
    in TensorBoard/XProf (SURVEY.md §5 tracing equivalent)."""
    import jax

    jax.profiler.start_trace(dirname)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
