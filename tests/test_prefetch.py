"""io_utils.prefetch: ordering, overlap, and error propagation."""

import threading
import time

import pytest

from hedit_tpu.io_utils.prefetch import prefetch_map


def test_prefetch_preserves_order_and_pairs():
    batches = [[i, i + 1] for i in range(0, 10, 2)]
    out = list(prefetch_map(batches, lambda b: sum(b)))
    assert [b for b, _ in out] == batches
    assert [p for _, p in out] == [sum(b) for b in batches]


def test_prefetch_runs_prepare_on_worker_thread():
    main = threading.get_ident()
    tids = []

    def prep(b):
        tids.append(threading.get_ident())
        return b

    list(prefetch_map([1, 2, 3], prep))
    assert all(t != main for t in tids)


def test_prefetch_overlaps_one_batch_ahead():
    """While the consumer sleeps on batch k, batch k+1 must already be
    prepared (depth=1)."""
    prepared = []

    def prep(b):
        prepared.append(b)
        return b

    gen = prefetch_map([0, 1, 2], prep)
    next(gen)  # yields batch 0
    time.sleep(0.1)  # consumer works on 0; worker should finish 1
    assert 1 in prepared
    assert list(gen) == [(1, 1), (2, 2)]


def test_prefetch_propagates_errors_in_order():
    def prep(b):
        if b == 1:
            raise ValueError("boom")
        return b

    gen = prefetch_map([0, 1, 2], prep)
    assert next(gen) == (0, 0)
    with pytest.raises(ValueError, match="boom"):
        next(gen)
