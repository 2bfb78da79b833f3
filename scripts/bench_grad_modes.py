"""End-to-end wall-clock of the through-UNet gradient editing modes on chip
(NMG + P2P, null-text + PnP) — the modes accelerated by the fused Pallas
flash backward.  HEDIT_BWD=xla forces the XLA-recompute VJP for the A/B.

SD-1.5-shape UNet in bf16 (seeded random weights; FLOP/byte-exact), 512px
latents, script-default configs (nmg: 50 steps; nt: 50 steps x 10 Adam).
Prints one JSON line per mode.
"""

import dataclasses
import json
import os
import sys
import time

import jax
from hedit_tpu.utils.profiling import device_sync  # axon-safe barrier
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if os.environ.get("HEDIT_BWD") == "xla":
        import hedit_tpu.ops.flash_attention as fa

        fa._BWD_MIN_SEQ = 1 << 30  # route every backward to XLA recompute
        print("# backward forced to XLA recompute", file=sys.stderr)

    from hedit_tpu.control.pnp import pnp_step_gates
    from hedit_tpu.core.schedule import Schedule
    from hedit_tpu.edit.baselines import nmg_p2p
    from hedit_tpu.edit.pnp_baselines import null_text_pnp
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig

    S = 50
    ucfg = dataclasses.replace(UNetConfig.sd15(), dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)),
        jnp.array(1), jnp.zeros((1, 77, 768)))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes)
    sched = Schedule.create(S)
    rs = np.random.RandomState(0)
    xts = jnp.asarray(rs.randn(S + 1, 1, 64, 64, 4).astype(np.float32) * 0.2)
    zs = jnp.asarray(rs.randn(S, 1, 64, 64, 4).astype(np.float32))
    u, sctx, tctx = (jnp.asarray(rs.randn(1, 77, 768).astype(np.float32) * 0.1)
                     for _ in range(3))
    qk_mask, conv_mask = pnp_step_gates(S, 0.35, 0.45)

    which = os.environ.get("HEDIT_GRAD_BENCH", "nmg")
    if which == "nmg":
        @jax.jit
        def run(p, xT, xts, zs):
            eps = lambda x, t, c, co: unet.apply(p, x, t, c, co)  # noqa: E731
            out, _ = nmg_p2p(eps, sched, xT, xts, zs, uncond_ctx=u,
                             src_ctx=sctx, tar_ctx=tctx, cfg_tar=7.5,
                             after_skip_steps=S)
            return out
        metric = "nmg_p2p_50step_wall_s_per_image"
    else:
        @jax.jit
        def run(p, xT, xts, zs):
            eps = lambda x, t, c, co: unet.apply(p, x, t, c, co)  # noqa: E731
            out, _ = null_text_pnp(eps, sched, xT, xts, zs, uncond_ctx=u,
                                   src_ctx=sctx, tar_ctx=tctx, cfg_tar=7.5,
                                   after_skip_steps=S, qk_mask=qk_mask,
                                   conv_mask=conv_mask)
            return out
        metric = "nt_pnp_50step_wall_s_per_image"

    t0 = time.perf_counter()
    out = run(params, xts[S], xts, zs)
    device_sync(out)
    print(f"# {which} cold (compile+run): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(params, xts[S], xts, zs)
        device_sync(out)
        times.append(time.perf_counter() - t0)
    print(f"# {which} timed: {[round(t, 2) for t in times]}", file=sys.stderr)
    print(json.dumps({
        "metric": metric, "value": round(min(times), 3), "unit": "s/image",
        "backward": os.environ.get("HEDIT_BWD", "pallas"),
    }))


if __name__ == "__main__":
    main()
