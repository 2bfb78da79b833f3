"""Backward-pass cost of the routed attention at the SD hot shapes.

Baselines for the Pallas flash-backward kernel: the current custom-VJP
backward recomputes through XLA reference attention (exact, but
materializes [BH, S, S] probabilities).  Run on the real chip.
"""

import time

import jax
from hedit_tpu.utils.profiling import device_sync  # axon-safe barrier
import jax.numpy as jnp
import numpy as np

from hedit_tpu.ops.flash_attention import (
    flash_attention_bounded, flash_attention_diff, reference_attention,
)


def timeit(f, *args, n=10):
    device_sync(f(*args))  # warm (tuple outputs: first leaf probed)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        device_sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    for dtype in (jnp.bfloat16, jnp.float32):
        for (b, h, s, d) in [(2, 8, 4096, 40), (2, 8, 1024, 80)]:
            rs = np.random.RandomState(0)
            mk = lambda: jnp.asarray(  # noqa: E731
                rs.randn(b, h, s, d).astype(np.float32) * 0.2, dtype)
            q, k, v, co = mk(), mk(), mk(), mk()

            fwd = jax.jit(lambda q, k, v: flash_attention_bounded(q, k, v))
            g_diff = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(
                    (flash_attention_diff(q, k, v) * co).astype(jnp.float32)),
                argnums=(0, 1, 2)))
            g_ref = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(
                    (reference_attention(q, k, v) * co).astype(jnp.float32)),
                argnums=(0, 1, 2)))

            t_fwd = timeit(fwd, q, k, v)
            t_diff = timeit(g_diff, q, k, v)
            t_ref = timeit(g_ref, q, k, v)
            name = "bf16" if dtype == jnp.bfloat16 else "f32"
            print(f"{name} [{b},{h},{s},{d}]: fwd {t_fwd*1e3:.2f} ms | "
                  f"grad(flash fwd + XLA bwd) {t_diff*1e3:.2f} ms | "
                  f"grad(pure XLA) {t_ref*1e3:.2f} ms")


if __name__ == "__main__":
    main()
