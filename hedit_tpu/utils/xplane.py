"""Headless xplane.pb parsing for device-plane op times.

jax.profiler traces capture the TPU device plane even through the axon
tunnel, but tensorboard_plugin_profile's converters are version-broken
against the baked-in TF build.  This reads the XSpace proto directly via
the pure-python protobuf implementation and aggregates op durations.
"""

from __future__ import annotations

import glob
import os
import sys

# stale generated _pb2 files need the pure-python protobuf runtime;
# must be set before google.protobuf is imported.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def op_times_from_logdir(logdir: str, verbose: bool = False):
    """Return (total_ps, {op_name: (duration_ps, count)}) aggregated over the
    device plane's 'XLA Ops' line of the newest trace under logdir.

    Falls back to the host plane's XLA lines when no device plane exists
    (CPU backend smoke tests).
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    if verbose:
        print("# planes:", [(p.name, [l.name for l in p.lines])
                            for p in xspace.planes], file=sys.stderr)

    device_planes = [p for p in xspace.planes
                     if "TPU" in p.name or "/device" in p.name]
    if not device_planes:
        device_planes = [p for p in xspace.planes if p.name == "/host:CPU"]

    rows: dict = {}
    total_ps = 0
    for plane in device_planes:
        meta = plane.event_metadata
        has_xla_ops = any(l.name == "XLA Ops" for l in plane.lines)
        for line in plane.lines:
            if has_xla_ops:
                if line.name != "XLA Ops":
                    continue
            elif "xla" not in line.name.lower():
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in meta \
                    else f"id{ev.metadata_id}"
                r = rows.setdefault(name, [0, 0])
                r[0] += ev.duration_ps
                r[1] += 1
                total_ps += ev.duration_ps
    return total_ps, rows


def top_ops(logdir: str, n: int = 30, verbose: bool = False):
    """[(name, total_ms, count)] sorted by time desc, plus grand total ps."""
    total_ps, rows = op_times_from_logdir(logdir, verbose=verbose)
    out = sorted(rows.items(), key=lambda kv: -kv[1][0])[:n]
    return total_ps, [(k, v[0] / 1e9, v[1]) for k, v in out]
