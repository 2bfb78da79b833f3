"""Probe which scan-wrapped SD-UNet graphs the axon remote-compile service
accepts (VERDICT r1 item 5 / PERF_NOTES "Compile-service constraints").

Usage: python scripts/scan_probe.py CASE
Cases (each is meant to run in its own subprocess under `timeout`):
  scan1     : lax.scan, body = ONE batch-4 UNet call, S=50
  scan2     : lax.scan, body = TWO UNet calls (batch-1 + batch-4; the
              h-Edit step shape), S=50
  scan2x25  : lax.scan over 25 iterations, body = 2 steps unrolled
              (4 UNet calls/body)
  scan2rmt  : scan2 with jax.checkpoint on the step body
  fused     : the library's full h_edit_p2p fused scan (known-fail repro)
Prints `CASE OK <seconds>` after one jitted execution, or raises.
"""
import dataclasses
import os
import sys
import time

import jax
from hedit_tpu.utils.profiling import device_sync  # axon-safe barrier
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from hedit_tpu.core.schedule import Schedule  # noqa: E402
from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig  # noqa: E402

S = 50


def build():
    ucfg = dataclasses.replace(UNetConfig.sd15(), dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)),
        jnp.array(1), jnp.zeros((1, 77, 768)))
    params = jax.tree_util.tree_map(lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes)
    sched = Schedule.create(S)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 64, 64, 4).astype(np.float32) * 0.2)
    ctx = jnp.asarray(rs.randn(4, 77, 768).astype(np.float32) * 0.1)
    return unet, params, sched, x, ctx


def main():
    case = sys.argv[1]
    unet, params, sched, x, ctx = build()
    ts = sched.timesteps

    if case == "scan1":
        @jax.jit
        def run(params, x):
            def body(c, t):
                x4 = jnp.concatenate([c] * 4, axis=0)
                eps = unet.apply(params, x4, jnp.broadcast_to(t, (4,)), ctx)
                return c - 0.01 * eps[0:1], None

            out, _ = jax.lax.scan(body, x, ts)
            return out

    elif case in ("scan2", "scan2rmt"):
        def step(c, t, params):
            e1 = unet.apply(params, c, jnp.broadcast_to(t, (1,)), ctx[0:1])
            x4 = jnp.concatenate([c - 0.01 * e1] * 4, axis=0)
            e2 = unet.apply(params, x4, jnp.broadcast_to(t, (4,)), ctx)
            return c - 0.01 * (e1 + e2[1:2])

        if case == "scan2rmt":
            step = jax.checkpoint(step, static_argnums=())

        @jax.jit
        def run(params, x):
            def body(c, t):
                return step(c, t, params), None

            out, _ = jax.lax.scan(body, x, ts)
            return out

    elif case == "scan2x25":
        @jax.jit
        def run(params, x):
            def body(c, tpair):
                for i in range(2):
                    t = tpair[i]
                    e1 = unet.apply(params, c, jnp.broadcast_to(t, (1,)), ctx[0:1])
                    x4 = jnp.concatenate([c - 0.01 * e1] * 4, axis=0)
                    e2 = unet.apply(params, x4, jnp.broadcast_to(t, (4,)), ctx)
                    c = c - 0.01 * (e1 + e2[1:2])
                return c, None

            out, _ = jax.lax.scan(body, x, ts.reshape(25, 2))
            return out

    elif case == "fused":
        from hedit_tpu.edit.h_edit import HEditConfig
        from hedit_tpu.edit.h_edit_p2p import h_edit_p2p
        from hedit_tpu.invert.ddpm import invert_ddpm

        cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=5.0, cfg_tar=7.5,
                          implicit=True)

        @jax.jit
        def run(params, x):
            def eps_plain(xx, t, c):
                return unet.apply(params, xx, t, c)

            def eps_ctrl(xx, t, c, ctrl):
                return unet.apply(params, xx, t, c, ctrl)

            inv = invert_ddpm(eps_plain, sched, x, uncond_ctx=ctx[0:1],
                              src_ctx=ctx[1:2], cfg_scale_src=1.0, eta=1.0,
                              rng=jax.random.PRNGKey(0), step_chunk=10)
            edited, _ = h_edit_p2p(
                eps_ctrl, sched, inv.xT, inv.zs, uncond_ctx=ctx[0:1],
                src_ctx=ctx[1:2], tar_ctx=ctx[2:3], cfg=cfg,
                after_skip_steps=S)
            return edited
    else:
        raise SystemExit(f"unknown case {case}")

    t0 = time.perf_counter()
    out = run(params, x)
    device_sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = run(params, x * 1.01)
    device_sync(out)
    print(f"{case} OK compile={compile_s:.0f}s run={time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
