"""Canary validation of XLA:CPU AOT compile caches (utils/hostcache.py).

Round-3 postmortem: the judge VM's full-suite run segfaulted loading this
repo's committed-by-another-VM compile cache even though both VMs had
byte-identical ``/proc/cpuinfo`` flags — the AOT incompatibility lives in
LLVM's model-detected tuning features (``+prefer-no-gather``), invisible to
any cpuinfo hash.  These tests drive the replacement: a subprocess canary
that deserializes real cache entries through the XLA:CPU AOT loader and
quarantines dirs that fail.
"""

import json
import os
import subprocess
import sys

import pytest

from hedit_tpu.utils import hostcache


def _write_real_entry(cache_dir: str):
    """Produce a genuine persistent-cache entry (compiled on THIS machine)
    by running a small jit in a subprocess with the cache enabled."""
    code = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"jax.config.update('jax_compilation_cache_dir', {cache_dir!r})\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)\n"
        "import jax.numpy as jnp\n"
        "x = jnp.ones((64, 64))\n"
        "print(float(jax.jit(lambda x: (x @ x.T).sum())(x)))\n"
    )
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_empty_dir_is_adopted_and_premarked(tmp_path):
    base = str(tmp_path / "cache")
    d = hostcache.ensure_safe_cache_dir(base)
    assert d == hostcache.cpu_cache_subdir(base)
    # pre-marked as validated for this VM: later sessions skip the probe
    marks = json.load(open(os.path.join(d, "VALIDATED.json")))
    assert hostcache.machine_fingerprint() in marks["fingerprints"]


def test_probe_accepts_entries_compiled_here(tmp_path):
    d = str(tmp_path / "cache" / "sub")
    os.makedirs(d)
    _write_real_entry(d)
    assert any(n.endswith("-cache") for n in os.listdir(d))
    assert hostcache.probe_cache_dir(d, n_entries=4) == "ok"


def test_foreign_compatible_dir_is_adopted_once(tmp_path, monkeypatch):
    base = str(tmp_path / "cache")
    d = hostcache.cpu_cache_subdir(base)
    os.makedirs(d)
    _write_real_entry(d)  # entries exist but no VALIDATED marker: "foreign"
    probes = []
    real = hostcache.probe_cache_dir
    monkeypatch.setattr(hostcache, "probe_cache_dir",
                        lambda *a, **k: probes.append(1) or real(*a, **k))
    assert hostcache.ensure_safe_cache_dir(base) == d
    assert probes == [1]
    # second call: marker present, no second probe subprocess
    assert hostcache.ensure_safe_cache_dir(base) == d
    assert probes == [1]


def test_incompatible_dir_is_quarantined(tmp_path, monkeypatch):
    base = str(tmp_path / "cache")
    d = hostcache.cpu_cache_subdir(base)
    os.makedirs(d)
    with open(os.path.join(d, "jit_x-00-cache"), "wb") as f:
        f.write(b"\x00" * 64)
    monkeypatch.setattr(hostcache, "probe_cache_dir",
                        lambda *a, **k: "incompatible")
    out = hostcache.ensure_safe_cache_dir(base)
    assert out == d
    assert not os.path.exists(os.path.join(d, "jit_x-00-cache"))
    assert os.path.exists(os.path.join(d + ".bad-0", "jit_x-00-cache"))


def test_probe_crash_counts_as_incompatible(tmp_path, monkeypatch):
    d = str(tmp_path / "c")
    os.makedirs(d)
    with open(os.path.join(d, "jit_x-00-cache"), "wb") as f:
        f.write(b"\x00" * 64)

    class Boom:
        returncode = -11  # SIGSEGV
        stderr = ""
        stdout = ""

    monkeypatch.setattr(hostcache.subprocess, "run", lambda *a, **k: Boom())
    assert hostcache.probe_cache_dir(d) == "incompatible"


def test_probe_ignores_prefer_no_tuning_logs(tmp_path, monkeypatch):
    # MEASURED round 4: cpu_aot_loader's "+prefer-no-gather" feature-mismatch
    # E-log fires even when loading entries compiled on THIS machine — it is
    # universal noise, not an incompatibility signal, and must NOT trigger
    # quarantine (that would cold-compile every single session).
    d = str(tmp_path / "c")
    os.makedirs(d)
    with open(os.path.join(d, "jit_x-00-cache"), "wb") as f:
        f.write(b"\x00" * 64)

    class Warned:
        returncode = 0
        stdout = "probe: 3 entries deserialized\n"
        stderr = ("E0821 .. cpu_aot_loader.cc:210] Loading XLA:CPU AOT "
                  "result. Target machine feature +prefer-no-gather is not "
                  " supported on the host machine.")

    monkeypatch.setattr(hostcache.subprocess, "run", lambda *a, **k: Warned())
    assert hostcache.probe_cache_dir(d) == "ok"


def test_corrupt_entry_is_not_a_machine_mismatch(tmp_path):
    # garbage bytes fail zstd decompress inside the probe; that's a corrupt
    # entry (jax recompiles it), NOT a foreign-machine signal
    d = str(tmp_path / "c")
    os.makedirs(d)
    with open(os.path.join(d, "jit_x-00-cache"), "wb") as f:
        f.write(b"not a real cache entry")
    assert hostcache.probe_cache_dir(d, n_entries=1) == "ok"


def test_tags_are_stable_and_target_extraction_is_live():
    # the target tag keys on what XLA embeds in serialized executables; it
    # must be stable within a process and must come from the extraction
    # path, not the cpuinfo fallback (extraction failure would silently
    # degrade namespacing to the hash round 3 proved insufficient)
    assert hostcache.xla_target_tag() == hostcache.xla_target_tag()
    assert hostcache.machine_fingerprint() == hostcache.machine_fingerprint()
    import jax
    import jax.numpy as jnp

    backend = jax.local_devices(backend="cpu")[0].client
    compiled = (jax.jit(lambda x: x @ x.T).lower(jnp.ones((8, 8))).compile())
    ser = backend.serialize_executable(compiled._executable.xla_executable)
    cpu, feats = hostcache._extract_target(ser)
    assert feats is not None and "," in feats
    assert cpu is None or len(cpu) >= 4


@pytest.mark.slow
def test_end_to_end_adoption_of_own_entries(tmp_path):
    """Full path on real entries: write -> wipe marker -> re-adopt."""
    base = str(tmp_path / "cache")
    d = hostcache.ensure_safe_cache_dir(base)
    _write_real_entry(d)
    os.remove(os.path.join(d, "VALIDATED.json"))
    assert hostcache.ensure_safe_cache_dir(base) == d
    assert os.path.exists(os.path.join(d, "VALIDATED.json"))
