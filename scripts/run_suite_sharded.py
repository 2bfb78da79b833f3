"""Run the test suite as several sequential pytest PROCESSES.

Why this exists (round 4 postmortem, PERF_NOTES "suite segfault root
cause"): a single-process COLD run of the full suite compiles hundreds of
large scan graphs through XLA:CPU and, after a few hours, the process state
degrades until an innocuous cache *deserialize* segfaults (measured at ~88%
round 4, ~78% for the round-3 judge).  Every entry of the same cache loads
clean in a fresh process, and a warm single-process run passes — the
corruption is compile-volume-driven and process-local, NOT a cache or
machine-compatibility problem.

Until jaxlib fixes the underlying compiler-state bug, cold verification
should bound the compile volume per process.  This driver shards the test
files across sequential `pytest` subprocesses (default 4 shards), each with
the same conftest (shared on-disk compile cache, so shards warm each other
across reruns), and aggregates the results.

Usage: python scripts/run_suite_sharded.py [n_shards] [extra pytest args...]
Exit code 0 iff every shard passed.
"""

import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the heavy cross-framework e2e modules dominate compile volume; spread them
HEAVY = [
    "test_e2e_p2p_parity.py", "test_e2e_pnp_parity.py",
    "test_e2e_text_parity.py", "test_e2e_face_parity.py",
    "test_e2e_masactrl_parity.py", "test_e2e_style_parity.py",
    "test_e2e_baselines_parity.py", "test_parallel.py",
    "test_parallel_modes.py", "test_cli_smoke.py", "test_multihost.py",
    "test_edit_loops.py", "test_style_and_pnp_baselines.py",
]


def main():
    args = sys.argv[1:]
    n_shards = 4
    if args and args[0].isdigit():
        n_shards = int(args[0])
        args = args[1:]
    files = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(REPO, "tests",
                                                            "test_*.py")))
    heavy = [f for f in HEAVY if f in files]
    light = [f for f in files if f not in heavy]
    shards = [[] for _ in range(n_shards)]
    # round-robin the heavy modules first, then pack the light ones
    for i, f in enumerate(heavy):
        shards[i % n_shards].append(f)
    for i, f in enumerate(light):
        shards[(i + len(heavy)) % n_shards].append(f)

    failed = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        paths = [os.path.join("tests", f) for f in shard]
        print(f"== shard {i + 1}/{n_shards}: {shard}", flush=True)
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *paths, *args], cwd=REPO)
        if proc.returncode != 0:
            failed.append((i, proc.returncode))
    if failed:
        print(f"FAILED shards: {failed}")
        return 1
    print(f"all {n_shards} shards green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
