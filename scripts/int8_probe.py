"""Probe: do int8 MXU dots beat bf16 on this chip/toolchain?

v5e datasheet throughput is ~197 bf16 TFLOPs vs ~394 int8 TOPS; if XLA
lowers s8xs8->s32 `dot_general` to the int8 MXU path, the flagship's dense
layers (attention projections + GEGLU FF, ~1/3 of the step) could run ~2x.
This measures the hot flagship dense shapes for bf16xbf16->f32 vs
s8xs8->s32 (+ the dynamic activation quant + dequant a real w8a8 layer
pays).

Methodology (two earlier attempts produced garbage, kept here as a
warning):
1. A host-dispatched 16-iteration chain starved under concurrent CPU load
   (46x..0.09x "ratios" = dispatch gaps, not device time).
2. An in-graph fori_loop whose carry consumed only y[0,0] let XLA's
   simplifier shrink the dot to a single output column ("281 TF" > the 197
   peak gave it away).
The loop carry is now the full [m,k] activation, updated through a tanh of
a full-width chunk-sum of y — the nonlinearity blocks dot/sum algebra, so
every iteration must execute the complete [m,k]x[k,n] product.  The tanh/
sum/update VPU tail is identical in both variants and overlaps the MXU.
"""

import time

import jax
from hedit_tpu.utils.profiling import device_sync  # axon-safe barrier
import jax.numpy as jnp
import numpy as np

SHAPES = [
    (16 * 4096, 320, 320),    # res-64 self-attn projection
    (16 * 4096, 320, 2560),   # res-64 GEGLU FF in
    (16 * 1024, 640, 5120),   # res-32 GEGLU FF in
    (16 * 256, 1280, 1280),   # res-16 projection
]
# mix() folds the [m, n] output back to an [m, k] carry via
# reshape(m, n//k, k): n must tile by k or a new entry fails loudly here
# instead of as a confusing in-loop reshape error
for (_m, _k, _n) in SHAPES:
    assert _n % _k == 0, (_k, _n)
REPS = 32


def bench(fn, *args):
    device_sync(fn(*args))  # compile
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.device_get(out))  # forced readback wall
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.default_rng(0)
    for (m, k, n) in SHAPES:
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w_f = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        w_i = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        w_scale = jnp.float32(1.0 / 127)

        def mix(x, y):
            # consume EVERY column of y through a nonlinearity, produce the
            # next [m, k] carry; tanh blocks algebraic dot rewrites
            t = jnp.tanh(y.reshape(m, n // k, k) * 0.001).sum(axis=1)
            return (x * 0.999 + t.astype(x.dtype) * 0.001)

        @jax.jit
        def bf16_loop(x, w):
            def body(_, xc):
                y = jax.lax.dot_general(xc, w, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                return mix(xc, y)
            return jnp.sum(jax.lax.fori_loop(0, REPS, body, x)
                           .astype(jnp.float32))

        @jax.jit
        def int8_loop(x, w):
            def body(_, xc):
                s = jnp.max(jnp.abs(xc)).astype(jnp.float32) / 127
                xi = jnp.clip(jnp.round(xc.astype(jnp.float32) / s),
                              -127, 127).astype(jnp.int8)
                y = jax.lax.dot_general(xi, w, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                yf = y.astype(jnp.float32) * (s * w_scale)
                return mix(xc, yf)
            return jnp.sum(jax.lax.fori_loop(0, REPS, body, x)
                           .astype(jnp.float32))

        t_bf = bench(bf16_loop, a, w_f)
        t_i8 = bench(int8_loop, a, w_i)
        tf_bf = 2 * m * k * n / t_bf / 1e12
        tf_i8 = 2 * m * k * n / t_i8 / 1e12
        print(f"[{m:6d},{k:5d}]x[{k:5d},{n:5d}]  "
              f"bf16 {t_bf * 1e3:7.3f} ms ({tf_bf:5.1f} TF)   "
              f"int8(w8a8+quant) {t_i8 * 1e3:7.3f} ms ({tf_i8:5.1f} TOP)  "
              f"ratio {t_bf / t_i8:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
