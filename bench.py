"""Flagship benchmark: PieBench-config 50-step edit wall-clock per image.

Measures the complete flagship pipeline of the reference's SOTA config
(``main_p2p.py --mode h_edit_R_p2p --implicit``, SURVEY.md §3.1) at full
SD-1.5 shapes on one TPU chip:

  DDPM edit-friendly inversion (50 steps, chunked batched UNet calls)
  + implicit h-Edit + P2P scan (50 steps: batch-4 base pass, batch-1 source
    pass, batch-3 controlled pass with probability-path attention on the
    P2P-edited layers, LocalBlend)

Weights are seeded-random (no pretrained checkpoints exist in this image —
zero egress); FLOP/byte traffic, and therefore wall-clock, match the real
model exactly.  Compute dtype bfloat16 (MXU-native), posterior math float32.

Baseline for ``vs_baseline``: the reference publishes NO wall-clock numbers
(timing commented out, ``main_p2p.py:149-150,268-272``).  We use an estimated
A100 diffusers fp16 cost of the same call pattern: ~550 batch-1-equivalent
UNet passes/image (SURVEY.md §6) at ~20 ms/pass ~= 11.0 s/image.
vs_baseline = 11.0 / measured_seconds (>1 means faster than the A100
estimate; the north star is >= 3).
"""

from __future__ import annotations

import json
import time

A100_BASELINE_S = 11.0


def main():
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from hedit_tpu.control.base import NO_CONTROL
    from hedit_tpu.control.p2p import LocalBlendState, P2PControl
    from hedit_tpu.core.schedule import Schedule
    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.edit.h_edit_p2p import h_edit_p2p
    from hedit_tpu.invert.ddpm import invert_ddpm
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig

    S = 50
    # Zero-init UNet only (no 859M random-init graph, no unused VAE/text
    # compiles) — wall-clock per step is identical to trained weights.
    ucfg = UNetConfig.sd15()
    import dataclasses as _dc

    ucfg = _dc.replace(ucfg, dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)),
        jnp.array(1), jnp.zeros((1, 77, 768)),
    )
    unet_params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes
    )

    class _Pipe:
        def unet_eps(self, x, t, c, control=NO_CONTROL, use_pallas=True):
            if getattr(control, "stores_attn", False):
                out, aux = unet.apply(
                    unet_params, x, t, c, control, use_pallas,
                    mutable=["attn_store"],
                )
                return out, aux.get("attn_store", {})
            return unet.apply(unet_params, x, t, c, control, use_pallas)

    pipe = _Pipe()
    sched = Schedule.create(S)

    rs = np.random.RandomState(0)
    w0 = jnp.asarray(rs.randn(1, 64, 64, 4).astype(np.float32) * 0.2)
    uncond = jnp.asarray(rs.randn(1, 77, 768).astype(np.float32) * 0.1)
    src = jnp.asarray(rs.randn(1, 77, 768).astype(np.float32) * 0.1)
    tar = jnp.asarray(rs.randn(1, 77, 768).astype(np.float32) * 0.1)

    eps_plain = lambda x, t, c: pipe.unet_eps(x, t, c)  # noqa: E731
    eps_ctrl = lambda x, t, c, ctrl: pipe.unet_eps(x, t, c, ctrl)  # noqa: E731

    control = P2PControl(
        step=jnp.zeros((), jnp.int32),
        cross_alpha=jnp.asarray(
            (np.arange(S + 1) < int(0.4 * (S + 1))).astype(np.float32)[:, None]
            * np.ones((1, 77), np.float32)
        ),
        refine_mapper=jnp.arange(77),
        refine_alphas=jnp.ones(77),
        replace_mapper=jnp.eye(77),
        equalizer=jnp.full((77,), 2.0),
        mode="refine",
        use_reweight=True,
        self_replace_until=int(0.35 * S),
        blend_px=256,
    )
    alpha = np.zeros((2, 77), np.float32)
    alpha[:, 5] = 1.0
    lb = LocalBlendState(
        alpha_layers=jnp.asarray(alpha),
        store_sum=jnp.zeros((5, 2, 8, 256, 77), jnp.float32),
        start_blend=int(0.2 * S), res=16,
    )
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=5.0, cfg_tar=7.5, implicit=True)

    @jax.jit
    def edit_one(w0, rng):
        inv = invert_ddpm(
            eps_plain, sched, w0, uncond_ctx=uncond, src_ctx=src,
            cfg_scale_src=1.0, eta=1.0, rng=rng, step_chunk=10,
        )
        edited, _ = h_edit_p2p(
            eps_ctrl, sched, inv.xT, inv.zs, uncond_ctx=uncond, src_ctx=src,
            tar_ctx=tar, cfg=cfg, after_skip_steps=S, control=control,
            local_blend=lb,
        )
        return edited

    # warm-up / compile
    out = edit_one(w0, jax.random.PRNGKey(0))
    out.block_until_ready()

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = edit_one(w0, jax.random.PRNGKey(i + 1))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    sec = min(times)

    print(json.dumps({
        "metric": "piebench_50step_hedit_R_p2p_implicit_wall_s_per_image",
        "value": round(sec, 3),
        "unit": "s/image",
        "vs_baseline": round(A100_BASELINE_S / sec, 2),
    }))


if __name__ == "__main__":
    main()
