"""Per-stage wall-clock timing mirroring the reference's timer placement.

The reference prints tic/toc per stage — data read, pulse compression, MTD,
CFAR, parameter estimation (``DMX_SignalProcessing_main_xzr.m:337-496``).
``StageTimers`` reproduces that breakdown with ``block_until_ready`` fencing
so asynchronous dispatch doesn't hide device time; pair with
``jax.profiler.trace`` for full XLA traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


class StageTimers:
    def __init__(self):
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        """Time a stage; ``fence`` (a jax array/pytree) is blocked on at exit."""
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            obj = holder.get("fence", fence)
            if obj is not None:
                import jax

                jax.block_until_ready(obj)
            self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.records.items():
            out[name] = {
                "count": len(vals),
                "total_s": sum(vals),
                "mean_s": sum(vals) / len(vals),
                "min_s": min(vals),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in self.summary().items():
            lines.append(
                f"{name:<22} n={s['count']:<4} mean={s['mean_s']*1e3:8.2f} ms  "
                f"min={s['min_s']*1e3:8.2f} ms  total={s['total_s']:7.3f} s"
            )
        return "\n".join(lines)
