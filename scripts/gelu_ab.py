"""A/B the GEGLU feed-forward's gelu form (exact erf vs tanh approx) at the
UNet's dominant FF shapes, device-plane timed.

Context: switching GEGLU to exact erf gelu (torch-parity,
tests/test_torch_parity_sd.py) moved the e2e bench 2.01 -> 2.15 s/image and
the batch-4 forward 33.3 -> 35.3 ms.  This isolates whether erf itself is the
cost (and how much), per shape.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [  # (batch_tokens desc, B, L, C) — SD-1.5 FF sites, batch 4
    ("res64", 4, 4096, 320),
    ("res32", 4, 1024, 640),
    ("res16", 4, 256, 1280),
    ("res8", 4, 64, 1280),
]


def make_ff(exact: bool):
    def ff(x, w1, w2):
        h = x @ w1
        a, gate = jnp.split(h, 2, axis=-1)
        g = jax.nn.gelu(gate, approximate=not exact)
        return (a * g) @ w2

    def loop(x, w1, w2):
        for _ in range(20):  # chained to defeat early block_until_ready
            x = ff(x, w1, w2) + x
        return jnp.float32(x.sum())  # scalar readback forces the full chain

    return jax.jit(loop)


def main():
    import numpy as np

    for name, b, l, c in SHAPES:
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(b, l, c), jnp.bfloat16)
        w1 = jnp.asarray(rs.randn(c, 8 * c) * 0.02, jnp.bfloat16)
        w2 = jnp.asarray(rs.randn(4 * c, c) * 0.02, jnp.bfloat16)
        row = [name]
        for exact in (False, True):
            f = make_ff(exact)
            float(f(x, w1, w2))  # compile + warm
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(f(x, w1, w2))  # device_get: real wall
                ts.append(time.perf_counter() - t0)
            row.append(f"{'erf' if exact else 'tanh'}={min(ts) * 1000 / 20:.3f}ms/call")
        print(" ".join(row), flush=True)


if __name__ == "__main__":
    main()
