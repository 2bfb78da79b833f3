"""End-to-end A/B of the HEDIT_INT8_CONV lever on the flagship edit.

Measures the SHIPPING path (``parallel/sweep.py:make_flagship_runner``, the
same executable pair bench.py and the ``--data_parallel`` CLI dispatch) at
SD-1.5 shape, batch N, with and without ``HEDIT_INT8_CONV=1`` — wall-clock
per image plus the seeded-weights output drift (latent MAE / max / relative
norm; the returned latents have already passed through LocalBlend, so mask
instability would surface here).  Round-3 kernel probes put the ceiling at
~5-9% e2e (PERF_NOTES "int8 convs"); this script records what the flag
actually buys ON CHIP.  Usage: ``python scripts/int8_conv_e2e.py [N]``.
"""

import dataclasses
import json
import os
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hedit_tpu.utils.profiling import device_sync  # noqa: E402  axon-safe barrier

S = 50


def build_inputs(jnp, np, jax, n_images):
    from hedit_tpu.control.p2p import LocalBlendState, P2PControl
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig
    from hedit_tpu.parallel.sweep import stack_pytrees

    ucfg = dataclasses.replace(UNetConfig.sd15(), dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)),
        jnp.array(1), jnp.zeros((1, 77, 768)),
    )
    # seeded RANDOM weights (not constants): constant weights make the
    # per-channel quantization degenerate and would understate drift
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        (jax.random.normal(k, s.shape, jnp.float32) * 0.02).astype(s.dtype)
        for k, s in zip(keys, leaves)
    ])

    rs = np.random.RandomState(0)
    w0 = jnp.asarray(rs.randn(1, 64, 64, 4).astype(np.float32) * 0.2)
    uncond = jnp.asarray(rs.randn(1, 77, 768).astype(np.float32) * 0.1)
    src = jnp.asarray(rs.randn(1, 77, 768).astype(np.float32) * 0.1)
    tar = jnp.asarray(rs.randn(1, 77, 768).astype(np.float32) * 0.1)
    control = P2PControl(
        step=jnp.zeros((), jnp.int32),
        cross_alpha=jnp.asarray(
            (np.arange(S + 1) < int(0.4 * (S + 1))).astype(np.float32)[:, None]
            * np.ones((1, 77), np.float32)),
        refine_mapper=jnp.arange(77), refine_alphas=jnp.ones(77),
        replace_mapper=jnp.eye(77), equalizer=jnp.full((77,), 2.0),
        mode="refine", use_reweight=True,
        self_replace_until=int(0.35 * S), blend_px=256,
    )
    alpha = np.zeros((2, 77), np.float32)
    alpha[:, 5] = 1.0
    lb0 = LocalBlendState(
        alpha_layers=jnp.asarray(alpha),
        store_sum=jnp.zeros((5, 2, 8, 256, 77), jnp.float32),
        start_blend=int(0.2 * S), res=16,
    )
    ctx4 = jnp.concatenate([uncond, src, src, tar], axis=0)
    return dict(
        unet=unet, params=params,
        x0b=jnp.broadcast_to(w0[None], (n_images,) + w0.shape),
        ctx4s=jnp.broadcast_to(ctx4, (n_images,) + ctx4.shape),
        controls=stack_pytrees([control] * n_images),
        blends=stack_pytrees([lb0] * n_images),
    )


def run_mode(jax, inp, sched, cfg, n_images, label):
    from hedit_tpu.parallel.sweep import make_flagship_runner

    run = make_flagship_runner(inp["unet"], sched, cfg, after_skip_steps=S)
    t0 = time.perf_counter()
    out = run(inp["params"], inp["x0b"], inp["ctx4s"], inp["controls"],
              inp["blends"], jax.random.PRNGKey(0))
    device_sync(out)
    print(f"# {label} warmup: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = run(inp["params"], inp["x0b"], inp["ctx4s"], inp["controls"],
                  inp["blends"], jax.random.PRNGKey(1))  # fixed key: A/B-able
        device_sync(out)
        times.append(time.perf_counter() - t0)
    print(f"# {label} timed: {[round(t, 2) for t in times]}", file=sys.stderr)
    return min(times) / n_images, out


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    os.environ.pop("HEDIT_INT8_CONV", None)
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from hedit_tpu.core.schedule import Schedule
    from hedit_tpu.edit.h_edit import HEditConfig

    sched = Schedule.create(S)
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=5.0, cfg_tar=7.5,
                      implicit=True)
    inp = build_inputs(jnp, np, jax, n_images)

    base_s, base_out = run_mode(jax, inp, sched, cfg, n_images, "bf16")

    os.environ["HEDIT_INT8_CONV"] = "1"  # read at trace time of the new jits
    int8_s, int8_out = run_mode(jax, inp, sched, cfg, n_images, "int8")

    a = np.asarray(base_out, np.float32)
    b = np.asarray(int8_out, np.float32)
    mae = float(np.mean(np.abs(a - b)))
    print(json.dumps({
        "metric": "flagship_50step_int8_conv_e2e",
        "bf16_s_per_image": round(base_s, 3),
        "int8_s_per_image": round(int8_s, 3),
        "speedup": round(base_s / int8_s, 4),
        "batch_images": n_images,
        "drift_latent_mae": round(mae, 6),
        "drift_latent_max": round(float(np.max(np.abs(a - b))), 5),
        "drift_rel": round(float(np.linalg.norm(a - b) / np.linalg.norm(a)), 5),
        "latent_rms": round(float(np.sqrt(np.mean(a * a))), 4),
    }))


if __name__ == "__main__":
    main()
