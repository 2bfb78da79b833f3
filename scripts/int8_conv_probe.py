"""Probe: int8 convolutions vs bf16 at the flagship's hot conv shapes.

The dense probe (int8_probe.py) showed w8a8 dense layers lose: at k<=1280
the flagship's matmuls are bandwidth/VPU-bound (40-60 TF of the 197 peak),
so the dynamic-quant VPU cost swamps the MXU saving.  The convs are the
opposite regime — the device profile has them at 133-192 TF (kOutput
fusions at roof) and ~70% of the step — so int8 MXU (394 TOPS nominal)
could theoretically ~2x them, and conv arithmetic intensity (9*C flops per
activation byte) amortizes the quant far better.  Same in-graph fori_loop
+ tanh-mix methodology as int8_probe.py (blocks XLA algebra/DCE).
"""

import time

import jax
from hedit_tpu.utils.profiling import device_sync  # axon-safe barrier
import jax.numpy as jnp
import numpy as np

# (B, H, W, Cin, Cout) 3x3 same-pad convs from the step profile
SHAPES = [
    (16, 64, 64, 960, 320),   # up_blocks_3 resnet conv1 (2.72 ms @ 133 TF)
    (16, 64, 64, 320, 320),   # res-64 resnet conv2
    (16, 32, 32, 1280, 640),  # res-32 concat conv
    (16, 16, 16, 2560, 1280), # res-16 concat conv
]
# mix() rebuilds a [.., ci] carry by tiling the [.., co] output; a shape
# with ci % co != 0 (and ci > co) would silently slice-clamp to the wrong
# width and surface as a confusing fori_loop error — fail loudly instead
for (_b, _h, _w, _ci, _co) in SHAPES:
    assert _ci % _co == 0 or _co >= _ci, (_ci, _co)
REPS = 32
DN = ("NHWC", "HWIO", "NHWC")


def bench(fn, *args):
    device_sync(fn(*args))
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.device_get(out))
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.default_rng(0)
    for (b, h, w, ci, co) in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.bfloat16)
        w_f = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05,
                          jnp.bfloat16)
        w_i = jnp.asarray(rng.integers(-127, 127, (3, 3, ci, co)), jnp.int8)
        w_scale = jnp.float32(1.0 / 127)
        rep = max(1, ci // co)

        def mix(xc, y):
            # consume every output channel nonlinearly, rebuild a [.., ci]
            # carry (tile when ci > co)
            t = jnp.tanh(y * 0.001)
            t = jnp.concatenate([t] * rep, axis=-1)[..., :ci]
            return xc * 0.999 + t.astype(xc.dtype) * 0.001

        @jax.jit
        def bf16_loop(x0, wf):
            def body(_, xc):
                y = jax.lax.conv_general_dilated(
                    xc, wf, (1, 1), "SAME", dimension_numbers=DN,
                    preferred_element_type=jnp.float32)
                return mix(xc, y)
            return jnp.sum(jax.lax.fori_loop(0, REPS, body, x0)
                           .astype(jnp.float32))

        @jax.jit
        def int8_loop(x0, wi):
            def body(_, xc):
                s = jnp.max(jnp.abs(xc)).astype(jnp.float32) / 127
                xi = jnp.clip(jnp.round(xc.astype(jnp.float32) / s),
                              -127, 127).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    xi, wi, (1, 1), "SAME", dimension_numbers=DN,
                    preferred_element_type=jnp.int32)
                yf = y.astype(jnp.float32) * (s * w_scale)
                return mix(xc, yf)
            return jnp.sum(jax.lax.fori_loop(0, REPS, body, x0)
                           .astype(jnp.float32))

        flops = 2 * b * h * w * 9 * ci * co
        t_bf = bench(bf16_loop, x, w_f)
        try:
            t_i8 = bench(int8_loop, x, w_i)
        except Exception as e:  # int8 conv may not lower on this toolchain
            print(f"[{b},{h},{w},{ci:4d}->{co:4d}]  bf16 {t_bf*1e3:7.3f} ms "
                  f"({flops/t_bf/1e12:5.1f} TF)   int8 conv FAILED: "
                  f"{str(e)[:120]}", flush=True)
            continue
        print(f"[{b},{h},{w},{ci:4d}->{co:4d}]  "
              f"bf16 {t_bf*1e3:7.3f} ms ({flops/t_bf/1e12:5.1f} TF)   "
              f"int8 {t_i8*1e3:7.3f} ms ({flops/t_i8/1e12:5.1f} TOP)  "
              f"ratio {t_bf/t_i8:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
