"""Profiling / tracing utilities (SURVEY.md §5.1 — the subsystem the
reference lacks; its only signal is SB3's time/fps column).

Wraps jax.profiler: device traces viewable in TensorBoard/Perfetto, plus a
lightweight section timer for host-side phases.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def device_trace(out_dir: str) -> Iterator[None]:
    """Capture a JAX device trace (XLA ops, TPU timelines) into out_dir.

    View with `tensorboard --logdir <out_dir>` or upload the .perfetto
    trace. Usage:

        with device_trace("outputs/trace"):
            rs, metrics = algo.train_iteration(rs, bank)
            jax.block_until_ready(metrics["reward_mean"])
    """
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Accumulating host-side section timer.

        t = SectionTimer()
        with t.section("rollout"):
            ...
        print(t.report())
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot, n = self.totals[name], self.counts[name]
            lines.append(f"{name:24s} {tot:8.3f}s total  {tot / n * 1e3:8.2f}ms/call  x{n}")
        return "\n".join(lines)


def annotate(name: str):
    """Named region that shows up in device traces (jax.profiler
    TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
