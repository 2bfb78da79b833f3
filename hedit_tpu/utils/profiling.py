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
* ``device_sync(x)`` — an execution barrier that actually works on tunneled
  backends where ``block_until_ready`` lies (see its docstring).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict

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


def device_sync(x) -> float:
    """Reliable execution barrier: fetch ONE scalar of ``x`` to the host.

    ``Array.block_until_ready`` can return as soon as the dispatch is
    acknowledged on remote-tunneled backends (axon: a bf16 8192-matmul chain
    "measured" 83 PFLOP/s with the plain barrier — 400x the chip's peak —
    vs 117 TF/s, a sane v5e number, when a host fetch was the barrier).  A
    host fetch of any element of the output cannot complete until the
    producing executable has actually run, and moves only bytes, so every
    wall-clock measurement in this repo ends a timed region with this
    instead of ``block_until_ready``.

    ``x`` may be an array or a pytree: the first leaf that is actually a
    ``jax.Array`` is probed (host-side scalars/numpy leaves are skipped —
    fetching those would not wait for any device work).  If no leaf is a
    device array the call is a no-op barrier and returns the first leaf
    coerced to float.  Returns the fetched scalar (also a cheap NaN canary
    for callers that want one).
    """
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves:
        if isinstance(leaf, jax.Array):
            return float(jnp.reshape(leaf, (-1,))[0].astype(jnp.float32))
    return float(jnp.asarray(leaves[0]).reshape(-1)[0]) if leaves else 0.0


class StepTimer:
    """Named wall-clock sections with an optional device barrier."""

    _sync_warned = False

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.records: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str, result=None):
        """Time a section.  ``result`` may be the device output to barrier
        on, or a zero-arg callable resolved AFTER the body runs (use a
        callable/holder to pass the section's own output — a plain value is
        bound at context entry, before the body executes)."""
        t0 = time.perf_counter()
        yield
        if self.sync:
            try:
                probe = result() if callable(result) else result
                if probe is not None:
                    device_sync(probe)
                else:
                    # no section output to probe: a fresh dispatch fetched to
                    # host orders behind queued work on the single-stream
                    # runtimes this targets
                    device_sync(jax.device_put(0) + 0)
            except Exception as e:  # barrier failure must not kill the run,
                if not StepTimer._sync_warned:  # but silence would hide it
                    StepTimer._sync_warned = True
                    import logging
                    logging.getLogger(__name__).warning(
                        "StepTimer device barrier failed (%s); timings may "
                        "exclude device time", e)
        self.records[name] = self.records.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> Dict[str, float]:
        return dict(sorted(self.records.items(), key=lambda kv: -kv[1]))
