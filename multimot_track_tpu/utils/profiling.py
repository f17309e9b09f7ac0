"""Observability: per-stage timing + JAX profiler hooks.

The reference's tracing is ad-hoc ``std::chrono`` around TrackRGBD
(Examples/RGB-D/rgbd_tum.cc:158-203) and commented clock() probes
(SURVEY.md §5).  Here: a lightweight stage timer whose context managers
block on device results (so device time is attributed truthfully), plus
helpers to capture an XLA profiler trace for tensorboard/xprof.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax


class StageTimer:
    """Accumulates wall-clock per named stage; device-sync on exit."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            out = holder.get("result", result)
            if self.sync and out is not None:
                jax.block_until_ready(out)
            self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for k, v in self.times.items():
            if not v:
                continue
            s = sorted(v)
            out[k] = {
                "n": len(v),
                "mean_s": sum(v) / len(v),
                "median_s": s[len(s) // 2],
                "max_s": s[-1],
            }
        return out

    def report(self) -> str:
        lines = []
        for k, st in sorted(self.summary().items()):
            lines.append(
                f"{k:30s} n={st['n']:4d} mean={st['mean_s']*1e3:8.2f}ms "
                f"median={st['median_s']*1e3:8.2f}ms max={st['max_s']*1e3:8.2f}ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA profiler trace viewable in tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
