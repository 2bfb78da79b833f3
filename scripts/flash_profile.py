"""Device-time of the flash attention op at UNet shapes (v1 baseline from
the 2026-08-16 profile: 2.20 ms per res-64 op, bf16 [32,4096,128] padded)."""
import os
import sys
import tempfile

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from hedit_tpu.ops.flash_attention import flash_attention  # noqa: E402
from hedit_tpu.utils.xplane import top_ops  # noqa: E402

CASES = [
    ("res64 self", (4, 8, 4096, 40), (4, 8, 4096, 40)),
    ("res32 self", (4, 8, 1024, 80), (4, 8, 1024, 80)),
    ("res64 cross", (4, 8, 4096, 40), (4, 8, 77, 40)),
]

for name, qs, ks in CASES:
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, qs, jnp.bfloat16)
    k = jax.random.normal(key, ks, jnp.bfloat16)
    v = jax.random.normal(key, ks, jnp.bfloat16)
    fn = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    jax.device_get(fn(q, k, v))  # compile+warm
    logdir = tempfile.mkdtemp(prefix="flash_prof_")
    with jax.profiler.trace(logdir):
        o = fn(q, k, v)
        jax.device_get(o)
    total_ps, rows = top_ops(logdir, n=4)
    print(f"== {name}: device total {total_ps / 1e9:.3f} ms")
    for op, ms, cnt in rows:
        print(f"   {op[:70]:<72} {ms:7.3f} ms x{cnt}")
