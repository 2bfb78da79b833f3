"""Test harness config: run on a virtual 8-device CPU mesh.

Multi-chip shardings are validated with
``xla_force_host_platform_device_count`` fakes (real multi-chip hardware is not
available in CI); the driver separately dry-runs the multi-chip path via
``__graft_entry__.dryrun_multichip``.

NOTE: the axon TPU plugin in this image overrides the JAX_PLATFORMS environment
variable, so the platform must be forced via jax.config *after* import.
"""

import os
import resource

# XLA's CPU compiler recurses deeply on large scan bodies (4-5 UNet calls per
# step); with the default 8MB stack the suite segfaults inside
# backend_compile_and_load once enough graphs have been compiled in one
# process.  The hard limit is unlimited here — raise the soft limit so the
# main-thread stack can grow.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
# A LARGE FINITE soft limit, deliberately not RLIM_INFINITY: glibc sizes
# new pthread stacks from the soft limit only when it is finite (unlimited
# falls back to the ~8MB default), and XLA:CPU compiles/loads on internal
# threads too — an "unlimited" limit would SHRINK their stacks 128x.
_want = 1024 * 1024 * 1024
if _hard == resource.RLIM_INFINITY or _hard >= _want:
    resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
elif _hard >= 256 * 1024 * 1024:
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite's wall-clock is dominated by XLA
# CPU compiles of scan-wrapped edit loops, and the per-module clear_caches()
# below (segfault workaround) would otherwise force identical graphs to
# recompile in every module.  The disk cache survives clear_caches() and
# pytest re-runs; min_compile_time 0.5s keeps tiny graphs out of it.
# Namespaced by CPU identity AND canary-validated (see utils/hostcache.py:
# XLA:CPU AOT entries do not key on machine features, and the incompatibility
# is invisible in /proc/cpuinfo — a foreign dir is probe-deserialized in a
# subprocess and quarantined if its entries were compiled for a different
# machine; round 3's full-suite segfault came from exactly such a dir).
from hedit_tpu.utils.hostcache import ensure_safe_cache_dir  # noqa: E402

_cache_dir = ensure_safe_cache_dir(
    os.environ.get("HEDIT_TEST_CACHE_DIR")
    or os.path.join(os.path.dirname(__file__), ".jax_test_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    float(os.environ.get("HEDIT_TEST_CACHE_MIN", "0.5")))


import pytest  # noqa: E402


# Suite wall-clock: ~21 min warm on this image's single CPU core, dominated
# by tracing/lowering of ~100 distinct scan graphs (XLA compiles are
# amortized by the persistent cache below).  MEASURED dead end: running the
# heavy numerics-equivalence tests eagerly (jax.disable_jit) is SLOWER, not
# faster — 7 tests took 24:41 eager vs ~6 min jitted-warm, because eager
# pays per-op dispatch on every run while compiles are paid once — and one
# bit-exactness assertion (indexed-source recon) only holds under jit.
# With one core there is no parallel lever either; the warm cache is the
# optimum for this box.
@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The XLA CPU compiler segfaults (stack/heap corruption in
    backend_compile_and_load) once enough large scan graphs have been
    compiled and retained in one process; dropping executables between test
    modules keeps it healthy."""
    yield
    import jax as _jax
    _jax.clear_caches()
