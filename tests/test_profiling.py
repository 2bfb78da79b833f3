"""utils.profiling: barrier probing and StepTimer semantics.

Regression tests for the round-5 advisor fixes: ``device_sync`` must skip
host-side leaves (fetching those would not wait for device work), and
``StepTimer.section`` must be able to barrier on the section's OWN output
via a post-body-resolved callable.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hedit_tpu.utils.profiling import StepTimer, cost_summary, device_sync


def test_device_sync_skips_host_leaves():
    # first pytree leaf is a host scalar; the probe must land on the
    # jax.Array leaf (value 2.0), not the host leaf (3.0)
    v = device_sync({"a_host": 3.0, "b_dev": jnp.full((4,), 2.0)})
    assert v == 2.0


def test_device_sync_numpy_only_tree_is_a_noop_barrier():
    assert device_sync(np.full((3,), 7.0)) == 7.0
    assert device_sync({"x": 1.5}) == 1.5


def test_device_sync_returns_first_scalar():
    x = jnp.arange(6.0).reshape(2, 3) + 1.0
    assert device_sync(x) == 1.0


def test_steptimer_section_callable_result_resolves_after_body():
    t = StepTimer(sync=True)
    holder = {}
    with t.section("s", lambda: holder.get("out")):
        holder["out"] = jnp.zeros((2,)) + 5.0
    assert "s" in t.records and t.records["s"] >= 0.0


def test_steptimer_sync_failure_is_nonfatal_and_warned_once(caplog):
    t = StepTimer(sync=True)

    def boom():
        raise RuntimeError("no barrier here")

    StepTimer._sync_warned = False
    with t.section("a", boom):
        pass
    with t.section("b", boom):
        pass
    assert set(t.records) == {"a", "b"}
    warnings = [r for r in caplog.records if "barrier failed" in r.message]
    assert len(warnings) == 1  # logged once, not per section


def test_steptimer_accumulates_repeated_sections():
    t = StepTimer(sync=False)
    for _ in range(3):
        with t.section("loop"):
            pass
    assert list(t.summary()) == ["loop"]


def test_cost_summary_reports_flops_for_a_matmul():
    import jax.numpy as jnp

    def f(a, b):
        return a @ b

    out = cost_summary(f, jnp.ones((64, 64)), jnp.ones((64, 64)))
    assert isinstance(out, dict)
    # XLA:CPU reports flops for a plain matmul: 2*64^3 (exact value is
    # backend-defined; require the right order of magnitude)
    if "flops" in out:
        assert 1e5 < out["flops"] < 1e7
