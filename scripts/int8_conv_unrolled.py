"""Fair bf16-vs-int8 number for the res-64 960->320 conv (no fori_loop).

int8_conv_probe.py's fori_loop methodology hits a pathological bf16
lowering at this shape (130 ms vs the 2.72 ms the same conv costs in the
step profile), so its ratio is meaningless there.  This unrolls an
8-conv chain (distinct weights per link, tanh-mix carry) inside one jit —
no loop structure, same DCE blocking — giving a fair per-conv wall.
"""

import time

import jax
from hedit_tpu.utils.profiling import device_sync  # axon-safe barrier
import jax.numpy as jnp
import numpy as np

SHAPES = [
    (16, 64, 64, 960, 320),
    (16, 64, 64, 320, 320),
    (16, 32, 32, 1280, 640),
]
for (_b, _h, _w, _ci, _co) in SHAPES:
    assert _ci % _co == 0 or _co >= _ci, (_ci, _co)  # mix() tiling bound
LINKS = 8
DN = ("NHWC", "HWIO", "NHWC")


def bench(fn, *args):
    """min over 3 timed calls (single-shot numbers fed go/no-go tables in
    PERF_NOTES and were once host-load-skewed — advisor r3)."""
    device_sync(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(*args)))
        times.append(time.perf_counter() - t0)
    return min(times) / LINKS


def main():
    rng = np.random.default_rng(0)
    for (b, h, w, ci, co) in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.bfloat16)
        wfs = [jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05,
                           jnp.bfloat16) for _ in range(LINKS)]
        wis = [jnp.asarray(rng.integers(-127, 127, (3, 3, ci, co)), jnp.int8)
               for _ in range(LINKS)]
        w_scale = jnp.float32(1.0 / 127)
        rep = max(1, ci // co)

        def mix(xc, y):
            t = jnp.tanh(y * 0.001)
            t = jnp.concatenate([t] * rep, axis=-1)[..., :ci]
            return xc * 0.999 + t.astype(xc.dtype) * 0.001

        @jax.jit
        def bf16_chain(x0, ws):
            xc = x0
            for wf in ws:
                y = jax.lax.conv_general_dilated(
                    xc, wf, (1, 1), "SAME", dimension_numbers=DN,
                    preferred_element_type=jnp.float32)
                xc = mix(xc, y)
            return jnp.sum(xc.astype(jnp.float32))

        @jax.jit
        def int8_chain(x0, ws):
            xc = x0
            for wi in ws:
                s = jnp.max(jnp.abs(xc)).astype(jnp.float32) / 127
                xi = jnp.clip(jnp.round(xc.astype(jnp.float32) / s),
                              -127, 127).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    xi, wi, (1, 1), "SAME", dimension_numbers=DN,
                    preferred_element_type=jnp.int32)
                xc = mix(xc, y.astype(jnp.float32) * (s * w_scale))
            return jnp.sum(xc.astype(jnp.float32))

        flops = 2 * b * h * w * 9 * ci * co
        t_bf = bench(bf16_chain, x, wfs)
        t_i8 = bench(int8_chain, x, wis)
        print(f"[{b},{h},{w},{ci:4d}->{co:4d}]  "
              f"bf16 {t_bf*1e3:7.3f} ms ({flops/t_bf/1e12:5.1f} TF)   "
              f"int8 {t_i8*1e3:7.3f} ms ({flops/t_i8/1e12:5.1f} TOP)  "
              f"ratio {t_bf/t_i8:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
