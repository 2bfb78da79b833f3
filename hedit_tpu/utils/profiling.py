"""Profiling / observability.

The reference's only runtime telemetry is tqdm bars and commented-out
wall-clock scaffolding (SURVEY.md §5.1, ``main_p2p.py:149-150,268-272``).
TPU-native replacements:

* ``trace(logdir)`` — jax.profiler trace context (XPlane, viewable in
  TensorBoard / xprof) around any editing call.
* ``cost_summary(fn, *args)`` — compile-time FLOP/byte estimates from XLA's
  cost analysis for a jitted callable: the per-step cost of the compiled
  scan without running it.
* ``StepTimer`` — lightweight host-side section timing with device sync.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_summary(fn, *args, **kwargs) -> Dict[str, Any]:
    """Lower+compile a callable and report XLA's cost analysis.

    Returns {} fields that the backend does not report.
    """
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    compiled = jitted.lower(*args, **kwargs).compile()
    out: Dict[str, Any] = {}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        for key in ("flops", "bytes accessed", "transcendentals"):
            if key in cost:
                out[key.replace(" ", "_")] = float(cost[key])
    except Exception:
        pass
    try:
        mem = compiled.memory_analysis()
        for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, attr, None)
            if v is not None:
                out[attr] = int(v)
    except Exception:
        pass
    return out


class StepTimer:
    """Named wall-clock sections with an optional device barrier."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.records: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if self.sync:
            try:
                (jax.device_put(0) + 0).block_until_ready()
            except Exception:
                pass
        self.records[name] = self.records.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> Dict[str, float]:
        return dict(sorted(self.records.items(), key=lambda kv: -kv[1]))
