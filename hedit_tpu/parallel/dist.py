"""Multi-host (DCN) execution: process wiring + cross-process batch plumbing.

The reference is strictly single-process/single-GPU (SURVEY.md §2: the only
device control is ``--device_num``, ``text-guided/main_p2p.py:41,87``), so
there is nothing to port — this module DEFINES the framework's pod story,
completing SURVEY.md §5.8's plan ("params replicated over ICI; DCN only for
multi-host dataset sharding"):

* **Process wiring** — :func:`init_distributed` wraps
  ``jax.distributed.initialize`` (coordinator/num_processes/process_id from
  CLI flags or ``HEDIT_DIST_*`` env vars).  On the CPU backend it selects
  gloo collectives so the same code path is testable with two local
  processes (``tests/test_multihost.py``).
* **Global mesh** — ``parallel/mesh.py:make_mesh`` already builds from
  ``jax.devices()``, which in a multi-process runtime is the GLOBAL device
  list; the ``data`` axis therefore spans processes with no further work.
* **Batch plumbing** — every process executes the SAME jit on the SAME
  global batch shapes (SPMD); each process materializes only its own rows:
  inputs via ``jax.make_array_from_process_local_data`` (:func:`put_batch`,
  :func:`put_replicated`), outputs via ``addressable_shards``
  (:func:`owned_rows`).  Per-sample edits are embarrassingly parallel, so
  no cross-process collective appears in the computation itself — DCN
  carries only the startup barrier and compilation-consistency traffic.

Pod recipe (documented contract, see also README):

    # on every host h of H (shared dataset + output filesystem):
    hedit-p2p --data_parallel <B·H> ... \
        --dist_coordinator host0:1234 --dist_num_processes H \
        --dist_process_id h

  All hosts iterate the identical deterministic sample list (the mapping
  file order), so their global batches agree; host h loads/encodes only its
  own B rows and writes only its own outputs (disjoint files).  ``--resume``
  survives a host loss: relaunching re-derives the todo list from output
  existence on the shared filesystem — work already written by ANY host is
  skipped, and the per-sample PRNG keying (one fixed key per sample, not a
  batch-position split) makes the recomputed remainder bit-identical to an
  uninterrupted run.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def add_dist_args(p) -> None:
    p.add_argument("--dist_coordinator", type=str,
                   default=os.environ.get("HEDIT_DIST_COORDINATOR"),
                   metavar="HOST:PORT",
                   help="multi-host mode: coordinator address "
                        "(jax.distributed); all hosts run the same command")
    p.add_argument("--dist_num_processes", type=int,
                   default=int(os.environ.get("HEDIT_DIST_NUM_PROCESSES", 0)),
                   help="multi-host mode: total process count")
    p.add_argument("--dist_process_id", type=int,
                   default=int(os.environ.get("HEDIT_DIST_PROCESS_ID", -1)),
                   help="multi-host mode: this process's id (0-based)")


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: int = 0,
                     process_id: int = -1) -> bool:
    """Initialize the multi-process runtime; returns True when distributed.

    Must run before first backend use.  On CPU platforms the gloo collective
    implementation is selected (the TPU runtime brings its own).  No-op when
    no coordinator is configured.
    """
    if not coordinator:
        return False
    if num_processes <= 0 or process_id < 0:
        raise ValueError(
            "--dist_coordinator requires --dist_num_processes and "
            "--dist_process_id")
    if jax.config.jax_platforms == "cpu" or (
            os.environ.get("JAX_PLATFORMS") == "cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # idempotent re-entry (e.g. a driver main() called twice in one
        # process); any other failure is real
        if "already initialized" not in str(e).lower():
            raise
    return True


def init_distributed_from_args(args) -> bool:
    return init_distributed(getattr(args, "dist_coordinator", None),
                            getattr(args, "dist_num_processes", 0),
                            getattr(args, "dist_process_id", -1))


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def owned_slice(mesh, batch: int) -> slice:
    """This process's contiguous global-row range under ``P('data')``.

    Single-process: the whole batch.  Multi-process: derived from the
    sharding's addressable-device index map (NOT assumed from process_index —
    the mesh's device order is authoritative)."""
    if not is_multiprocess():
        return slice(0, batch)
    sharding = NamedSharding(mesh, P("data"))
    idx_map = sharding.addressable_devices_indices_map((batch,))
    starts, stops = [], []
    for idx in idx_map.values():
        s = idx[0].indices(batch)
        starts.append(s[0]); stops.append(s[1])
    lo, hi = min(starts), max(stops)
    # rows of one process must be contiguous (block-sharded 'data' axis over
    # process-major device order) for the slice-based prep/write path
    span = sorted(zip(starts, stops))
    for (a0, a1), (b0, _) in zip(span, span[1:]):
        assert a1 == b0, f"non-contiguous data shards for this process: {span}"
    return slice(lo, hi)


def put_batch(local_rows, mesh, global_batch: int):
    """Build the global batch array from THIS process's rows.

    ``local_rows``: [B_local, ...] — must equal :func:`owned_slice`'s span.
    Single-process (B_local == global): a plain sharded device_put."""
    spec = P("data", *([None] * (np.ndim(local_rows) - 1)))
    sharding = NamedSharding(mesh, spec)
    if not is_multiprocess():
        return jax.device_put(local_rows, sharding)
    local_rows = np.asarray(local_rows)
    gshape = (global_batch,) + local_rows.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local_rows, gshape)


def put_batch_tree(tree, mesh, global_batch: int):
    return jax.tree_util.tree_map(
        lambda x: put_batch(x, mesh, global_batch), tree)


def put_replicated(tree, mesh):
    """Replicate a pytree over the whole (possibly multi-process) mesh.
    Every process must hold identical values (same checkpoint/seed)."""
    sharding = NamedSharding(mesh, P())

    def place(x):
        if not is_multiprocess():
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    return jax.tree_util.tree_map(place, tree)


def owned_rows(out):
    """[(global_row_index, np_row)] for the rows this process holds.

    Single-process: all rows.  Multi-process: the addressable shards of the
    'data'-sharded output, with their global positions."""
    if not is_multiprocess():
        arr = np.asarray(out)
        return list(enumerate(arr))
    rows = {}
    for shard in out.addressable_shards:
        idx = shard.index[0].indices(out.shape[0])
        data = np.asarray(shard.data)
        for k, gi in enumerate(range(idx[0], idx[1])):
            rows[gi] = data[k]
    return sorted(rows.items())
