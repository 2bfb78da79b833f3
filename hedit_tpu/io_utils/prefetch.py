"""Single-worker input prefetch for the data-parallel sweeps.

The reference has no data loader (images are loaded inline in its serial
per-sample loop, ``text-guided/main_p2p.py:110-159``).  The TPU sweeps batch
B samples per jit call, so each batch pays host-side preparation — PIL
decode + crop-resize, VAE-encode / CLIP text-encode dispatch, controller
preprocessing — between device steps.  ``prefetch_map`` hides that cost by
preparing batch k+1 on a worker thread while the main thread blocks on
device results for batch k (jax dispatch is thread-safe; the blocking
``device_get`` in the consumer releases the GIL, so the overlap is real even
on a 1-core host).
"""

from __future__ import annotations

import concurrent.futures
from typing import Callable, Iterable, Iterator, Tuple, TypeVar

T = TypeVar("T")
U = TypeVar("U")


def prefetch_map(batches: Iterable[T], prepare: Callable[[T], U],
                 depth: int = 1) -> Iterator[Tuple[T, U]]:
    """Yield ``(batch, prepare(batch))`` with up to ``depth`` batches
    prepared ahead on a worker thread.  Exceptions raised in ``prepare``
    surface at the corresponding yield, in order."""
    batches = iter(batches)
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
        pending = []
        for b in batches:
            pending.append((b, ex.submit(prepare, b)))
            if len(pending) > depth:
                done, fut = pending.pop(0)
                yield done, fut.result()
        for done, fut in pending:
            yield done, fut.result()
