"""CPU-feature-namespaced JAX compilation cache directories.

XLA:CPU's persistent cache stores AOT-compiled machine code but does NOT key
entries on the host's CPU features; loading an entry written by a different
CPU generation can SIGILL the process mid-run (XLA itself warns "could lead
to execution errors such as SIGILL", and a round-3 fast-lane run died exactly
that way on a fresh VM reading the previous session's cache).  Every CPU-side
cache consumer (tests/conftest.py, __graft_entry__.dryrun_multichip)
namespaces its cache dir with :func:`cpu_feature_tag` so a new VM
cold-compiles instead of crashing.
"""

from __future__ import annotations

import hashlib


def cpu_feature_tag() -> str:
    """A short stable hash of this host's CPU feature flags.

    Reads the first ``flags`` line of ``/proc/cpuinfo`` (identical across
    cores on the homogeneous hosts we run on); returns ``"nofeat"`` where
    that file is unavailable (non-Linux) so callers still get a usable —
    merely unpartitioned — subdirectory name.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "nofeat"


def cpu_cache_subdir(base_dir: str) -> str:
    """``<base_dir>/cpu-<feature-hash>`` — the namespaced cache directory."""
    import os

    return os.path.join(base_dir, f"cpu-{cpu_feature_tag()}")
