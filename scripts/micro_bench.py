"""Micro-benchmarks for the hot executables on the real chip.

Times a batch-4 SD UNet forward under combinations of
{pallas flash attention on/off} x {controlled/uncontrolled} to locate the
per-step wall-clock, plus the isolated attention op at the UNet's shapes.
"""

import dataclasses
import json
import os
import time

import jax


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig
    from hedit_tpu.ops.flash_attention import flash_attention, reference_attention

    results = {}

    # ---- isolated attention at UNet res-64 self-attn shape ---------------- #
    rs = np.random.RandomState(0)
    for (b, h, s, d) in [(4, 8, 4096, 40), (4, 8, 1024, 80)]:
        q = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32)).astype(jnp.bfloat16)
        k, v = q + 0.1, q + 0.2
        t_flash = timeit(lambda q, k, v: flash_attention(q, k, v), q, k, v)
        t_xla = timeit(jax.jit(reference_attention), q, k, v)
        results[f"attn_s{s}_d{d}"] = {"pallas_ms": round(t_flash * 1e3, 2),
                                      "xla_ms": round(t_xla * 1e3, 2)}

    # ---- batch-4 UNet forward, pallas on/off ------------------------------ #
    ucfg = dataclasses.replace(UNetConfig.sd15(), dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)),
        jnp.array(1), jnp.zeros((1, 77, 768)),
    )
    params = jax.tree_util.tree_map(lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes)
    x = jnp.asarray(rs.randn(4, 64, 64, 4).astype(np.float32) * 0.2)
    ctx = jnp.asarray(rs.randn(4, 77, 768).astype(np.float32) * 0.1)

    @jax.jit
    def fwd_pallas(params, x, t, c):
        return unet.apply(params, x, t, c, use_pallas=True)

    @jax.jit
    def fwd_xla(params, x, t, c):
        return unet.apply(params, x, t, c, use_pallas=False)

    results["unet_b4_pallas_ms"] = round(
        timeit(fwd_pallas, params, x, jnp.array(501), ctx) * 1e3, 1)
    results["unet_b4_xla_ms"] = round(
        timeit(fwd_xla, params, x, jnp.array(501), ctx) * 1e3, 1)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
