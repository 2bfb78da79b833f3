"""Device-plane time of the flash BACKWARD at UNet shapes.

Wall-clock on the axon tunnel floors at ~27 ms RPC latency per dispatch
(scripts/flash_bwd_bench.py), so kernel decisions use xplane device totals.
Compares the fused Pallas backward (flash_attention_diff's VJP) against the
XLA-recompute backward (reference_attention under jax.grad).
"""
import os
import sys
import tempfile

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from hedit_tpu.ops.flash_attention import (  # noqa: E402
    flash_attention_diff, reference_attention,
)
from hedit_tpu.utils.xplane import top_ops  # noqa: E402

CASES = [
    ("res64 self", (2, 8, 4096, 40)),
    ("res32 self", (2, 8, 1024, 80)),
]

for dtype in (jnp.bfloat16, jnp.float32):
    dname = "bf16" if dtype == jnp.bfloat16 else "f32"
    for name, qs in CASES:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, qs, dtype) * 0.3
        k = jax.random.normal(jax.random.PRNGKey(1), qs, dtype) * 0.3
        v = jax.random.normal(jax.random.PRNGKey(2), qs, dtype)
        co = jax.random.normal(jax.random.PRNGKey(3), qs, dtype)

        g_pallas = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(
                (flash_attention_diff(q, k, v) * co).astype(jnp.float32)),
            argnums=(0, 1, 2)))
        g_xla = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(
                (reference_attention(q, k, v) * co).astype(jnp.float32)),
            argnums=(0, 1, 2)))

        for label, fn in (("pallas bwd", g_pallas), ("xla bwd   ", g_xla)):
            jax.device_get(fn(q, k, v))  # compile+warm
            logdir = tempfile.mkdtemp(prefix="fbwd_")
            with jax.profiler.trace(logdir):
                jax.device_get(fn(q, k, v))
            total_ps, rows = top_ops(logdir, n=5)
            print(f"== {dname} {name} {label}: device total "
                  f"{total_ps / 1e9:.3f} ms")
            for op, ms, cnt in rows:
                print(f"   {op[:66]:<68} {ms:7.3f} ms x{cnt}")
