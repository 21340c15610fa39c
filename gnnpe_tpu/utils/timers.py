"""Stage timing — the framework's observability spine.

The reference scatters chrono spans through the hot paths and prints
ns→ms (GNN-PE/src/main.cpp:148-179, custom.h:386/487/832); here one
timer object collects named stage durations, nests, and can emit a
structured dict for logs/benchmarks.  Every stage also opens a
jax.profiler TraceAnnotation (utils/profiling.annotate), so engine
stages appear by name in TensorBoard timelines whenever a trace is
being captured — at zero cost otherwise."""

from __future__ import annotations

import contextlib
import time
from typing import Dict


class StageTimer:
    def __init__(self):
        self.times_ms: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        from gnnpe_tpu.utils.profiling import annotate
        t0 = time.perf_counter()
        try:
            with annotate(name):
                yield
        finally:
            dt = (time.perf_counter() - t0) * 1e3
            self.times_ms[name] = self.times_ms.get(name, 0.0) + dt

    @property
    def total_ms(self) -> float:
        return sum(self.times_ms.values())

    def __repr__(self):
        parts = ", ".join(f"{k}={v:.2f}ms" for k, v in self.times_ms.items())
        return f"StageTimer({parts})"
