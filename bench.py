"""Flagship benchmark: PieBench-config 50-step edit wall-clock per image.

Measures the complete flagship pipeline of the reference's SOTA config
(``main_p2p.py --mode h_edit_R_p2p --implicit``, SURVEY.md §3.1) at full
SD-1.5 shapes on one TPU chip:

  DDPM edit-friendly inversion (50 steps, batched pairs)
  + implicit h-Edit + P2P (50 steps: batch-4 base pass, batch-1 source pass,
    batch-3 controlled pass with probability-path attention on the P2P-edited
    layers, LocalBlend)

Weights are seeded (no pretrained checkpoints in this zero-egress image);
FLOP/byte traffic, and therefore wall-clock, match the real model exactly.
Compute dtype bfloat16 (MXU-native), posterior math float32.

Execution structure (HEDIT_BENCH_MODE):
* batch (default): the LIBRARY flagship runner
  (``parallel/sweep.py:make_flagship_runner``) vmapped over
  HEDIT_BENCH_BATCH images — two shared executables per step.  Batch sweep
  on chip (round 3): 1.955 s/image at batch 4, 1.921 at batch 8 (best —
  the default), 2.023 at batch 16 (activation working set spills past the
  ~1.9 s/image MXU plateau).
* scan: the library's fused lax.scan pipeline in ONE jit with params passed
  as an ARGUMENT (closing over concrete params would bake 3.4GB of
  constants into the HLO and break the remote compiler).  With
  HEDIT_BENCH_BATCH=n the scan is vmapped over n images.  Measured 2.209
  s/image at batch 1, 1.970 at batch 4 (PERF_NOTES round 3): the round-2
  scan-vs-hostloop gap was batch-4 MXU amortization, not scan overhead.
  On a real pod the scan form remains the zero-host-sync route.
* hostloop / split / stepjit: earlier structures kept for ablation.

Baseline for ``vs_baseline``: the reference publishes NO wall-clock numbers
(timing commented out, ``main_p2p.py:149-150,268-272``).  We use an estimated
A100 diffusers fp16 cost of the same call pattern: ~550 batch-1-equivalent
UNet passes/image (SURVEY.md §6) at 20 ms/pass ~= 11.0 s/image.  The 20 ms
figure is the FAST end of public A100 SD-1.5 fp16 benchmarks (50-step
generation at ~2.0-3.0 s/image = 100 batch-1-equivalent passes -> 20-30
ms/pass); full derivation and cross-checks in BASELINE.md ("A100 wall-clock
denominator").  vs_baseline = 11.0 / measured_seconds (>1 is faster; the
north star is >=3).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

A100_BASELINE_S = 11.0
S = 50


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    # axon-tunnel-safe execution barrier: block_until_ready can return
    # before remote execution completes (measured 83 PFLOP/s "effective"
    # = bogus); every timed region ends with a one-scalar host fetch
    from hedit_tpu.utils.profiling import device_sync

    from hedit_tpu.control.base import NO_CONTROL
    from hedit_tpu.control.p2p import (
        LocalBlendState, P2PControl, accumulate_store, apply_local_blend,
    )
    from hedit_tpu.core.schedule import Schedule
    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.edit.h_edit_p2p import flatten_attn_store
    from hedit_tpu.invert.ddpm import sample_xts_from_x0
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig

    ucfg = dataclasses.replace(UNetConfig.sd15(), dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)),
        jnp.array(1), jnp.zeros((1, 77, 768)),
    )
    params = jax.tree_util.tree_map(lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes)

    sched = Schedule.create(S)
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=5.0, cfg_tar=7.5, implicit=True)

    rs = np.random.RandomState(0)
    w0 = jnp.asarray(rs.randn(1, 64, 64, 4).astype(np.float32) * 0.2)
    uncond = jnp.asarray(rs.randn(1, 77, 768).astype(np.float32) * 0.1)
    src = jnp.asarray(rs.randn(1, 77, 768).astype(np.float32) * 0.1)
    tar = jnp.asarray(rs.randn(1, 77, 768).astype(np.float32) * 0.1)

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

    # ---------------------------- split mode ------------------------------- #
    def run_split():
        """Inversion scan and edit scan as TWO jits (2 dispatches/image).

        The all-in-one jit fails the axon remote compiler; each half contains
        at most two UNet instances and compiles."""
        from hedit_tpu.edit.h_edit_p2p import h_edit_p2p
        from hedit_tpu.invert.ddpm import invert_ddpm

        @jax.jit
        def invert_jit(params, w0, key):
            def eps_plain(x, t, c):
                return unet.apply(params, x, t, c)

            inv = invert_ddpm(
                eps_plain, sched, w0, uncond_ctx=uncond, src_ctx=src,
                cfg_scale_src=1.0, eta=1.0, rng=key, step_chunk=10,
            )
            return inv.xT, inv.zs

        @jax.jit
        def edit_jit(params, xT, zs):
            def eps_ctrl(x, t, c, ctrl):
                if getattr(ctrl, "stores_attn", False):
                    out, aux = unet.apply(params, x, t, c, ctrl, True,
                                          mutable=["attn_store"])
                    return out, aux["attn_store"]
                return unet.apply(params, x, t, c, ctrl)

            edited, _ = h_edit_p2p(
                eps_ctrl, sched, xT, zs, uncond_ctx=uncond, src_ctx=src,
                tar_ctx=tar, cfg=cfg, after_skip_steps=S, control=control,
                local_blend=lb0,
            )
            return edited

        def one(key):
            xT, zs = invert_jit(params, w0, key)
            return edit_jit(params, xT, zs)

        out = one(jax.random.PRNGKey(0))
        device_sync(out)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out = one(jax.random.PRNGKey(i + 1))
            device_sync(out)
            times.append(time.perf_counter() - t0)
        return min(times)

    # --------------------------- stepjit mode ------------------------------ #
    def run_stepjit():
        """One fused per-step executable (base UNet + controlled UNet + all
        posterior/update/blend math, no scan wrapper) + the chunked inversion.

        The compile helper rejects scan-wrapped UNet graphs; an unrolled
        2-UNet step compiles.  ~75 dispatches/image vs hostloop's ~300."""
        from hedit_tpu.invert.ddpm import sample_xts_from_x0

        ctx4l = jnp.concatenate([uncond, uncond, src, src], axis=0)
        ctx4cl = jnp.concatenate([uncond, src, src, tar], axis=0)

        @jax.jit
        def inv_chunk(params, x_chunk, t_chunk):
            n = x_chunk.shape[0]
            both = jnp.concatenate([x_chunk, x_chunk], axis=0)
            t2 = jnp.concatenate([t_chunk, t_chunk], axis=0)
            ctx = jnp.concatenate(
                [jnp.broadcast_to(uncond, (n, 77, 768)),
                 jnp.broadcast_to(src, (n, 77, 768))], axis=0)
            eps = unet.apply(params, both, t2, ctx)
            return eps[:n] + cfg.cfg_src * (eps[n:] - eps[:n])

        @jax.jit
        def residuals(xts, eps_all):
            ts = sched.timesteps
            x_in = xts[1:][::-1]
            x_prev = xts[:-1][::-1]
            abar_t = jnp.take(sched.alphas_cumprod, ts).reshape(S, 1, 1, 1)
            abar_prev = sched.abar_prev(ts).reshape(S, 1, 1, 1)
            var = sched.variance(ts).reshape(S, 1, 1, 1)
            x0p = (x_in - jnp.sqrt(1 - abar_t) * eps_all) / jnp.sqrt(abar_t)
            mu = jnp.sqrt(abar_prev) * x0p + jnp.sqrt(1 - abar_prev - var) * eps_all
            return ((x_prev - mu) / jnp.sqrt(var))[::-1]

        @jax.jit
        def step_fn(params, x_orig, x_edit, z, t, tt, i, lb):
            pair = jnp.concatenate([x_orig, x_edit], axis=0)
            eps4 = unet.apply(
                params, jnp.concatenate([pair, pair], axis=0),
                jnp.broadcast_to(t, (4,)), ctx4l,
            )
            eps_src = eps4[0:2] + cfg.cfg_src * (eps4[2:4] - eps4[0:2])
            prev = sched.reverse_step(eps_src, t, pair, eta=1.0,
                                      variance_noise=z)
            x_prev_orig, x_opt = prev[0:1], prev[1:2]

            ctrl = dataclasses.replace(control, step=i, cond_start=2)
            eps4c, aux = unet.apply(
                params,
                jnp.concatenate([x_opt, x_opt, x_prev_orig, x_opt], axis=0),
                jnp.broadcast_to(tt, (4,)), ctx4cl, ctrl, True,
                mutable=["attn_store"],
            )
            lb = accumulate_store(lb, flatten_attn_store(aux["attn_store"]))
            coeff = sched.h_edit_coeff(t, tt, 1.0)
            u_tar, cond_src, c_tar = eps4c[0:1], eps4c[1:2], eps4c[3:4]
            eps_se = u_tar + cfg.cfg_src_edit * (cond_src - u_tar)
            eps_ta = u_tar + cfg.cfg_tar * (c_tar - u_tar)
            x_opt = x_opt + coeff * (eps_ta - eps_se)
            pair_out = apply_local_blend(
                lb, jnp.concatenate([x_prev_orig, x_opt], axis=0), i)
            return pair_out[0:1], pair_out[1:2], lb

        ts_dev = sched.timesteps
        tts_dev = jnp.concatenate([ts_dev[1:], jnp.zeros((1,), ts_dev.dtype)])

        def one(key):
            xts, _ = sample_xts_from_x0(sched, w0, key)
            x_in = xts[1:][::-1]
            eps_list = [
                inv_chunk(params, x_in[c0:c0 + 2], ts_dev[c0:c0 + 2])
                for c0 in range(0, S, 2)
            ]
            zs_loop = residuals(xts, jnp.concatenate(eps_list, axis=0))[::-1]
            x_orig = x_edit = xts[S][None]
            lb = lb0
            for i in range(S):
                x_orig, x_edit, lb = step_fn(
                    params, x_orig, x_edit, zs_loop[i][None], ts_dev[i],
                    tts_dev[i], jnp.array(i, jnp.int32), lb,
                )
            return x_edit

        out = one(jax.random.PRNGKey(0))
        device_sync(out)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out = one(jax.random.PRNGKey(i + 1))
            device_sync(out)
            times.append(time.perf_counter() - t0)
        return min(times)

    # --------------------------- batch mode -------------------------------- #
    def run_batch(n_images: int):
        """Throughput mode: the LIBRARY flagship runner
        (``hedit_tpu/parallel/sweep.py:make_flagship_runner`` — promoted out
        of this file in round 3, VERDICT r2 #2) over N images (effective UNet
        batch 4N).  This is the production executable pair the CLI
        ``--data_parallel`` sweep dispatches, so the benchmark measures the
        shipping path, not a private fork.  Reports wall / N s per image."""
        from hedit_tpu.parallel.sweep import make_flagship_runner, stack_pytrees

        run = make_flagship_runner(unet, sched, cfg, after_skip_steps=S)
        ctx4 = jnp.concatenate([uncond, src, src, tar], axis=0)  # [4,77,D]
        ctx4s = jnp.broadcast_to(ctx4, (n_images,) + ctx4.shape)
        controls = stack_pytrees([control] * n_images)
        blends = stack_pytrees([lb0] * n_images)
        x0b = jnp.broadcast_to(w0[None], (n_images,) + w0.shape)

        dump = os.environ.get("HEDIT_BENCH_DUMP_HLO")

        def one(key, dump_hlo=None):
            return run(params, x0b, ctx4s, controls, blends, key,
                       dump_hlo=dump_hlo)

        t_setup = time.perf_counter()
        out = one(jax.random.PRNGKey(0), dump_hlo=dump)
        device_sync(out)
        print(f"# batch warmup (compile/cache-load + 1 run): "
              f"{time.perf_counter() - t_setup:.1f}s", file=sys.stderr)
        if dump:
            print(f"# step-executable HLO -> {dump}", file=sys.stderr)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out = one(jax.random.PRNGKey(i + 1))
            device_sync(out)
            times.append(time.perf_counter() - t0)
        print(f"# batch timed runs: {[round(t, 2) for t in times]}",
              file=sys.stderr)

        prof_dir = os.environ.get("HEDIT_BENCH_PROFILE")
        if prof_dir:
            # device-plane breakdown of one full edit (stderr; stdout stays
            # the single JSON line)
            with jax.profiler.trace(prof_dir):
                out = one(jax.random.PRNGKey(99))
                device_sync(out)
            from hedit_tpu.utils.xplane import top_ops
            total_ps, rows = top_ops(prof_dir, n=25)
            print(f"# device total {total_ps / 1e9:.1f} ms for {n_images} "
                  f"images", file=sys.stderr)
            for name, ms, cnt in rows:
                print(f"#  {name[:76]:<78} {ms:8.2f} ms x{cnt}",
                      file=sys.stderr)
        return min(times) / n_images

    # ---------------------------- scan mode -------------------------------- #
    def run_scan():
        from hedit_tpu.edit.h_edit_p2p import h_edit_p2p
        from hedit_tpu.invert.ddpm import invert_ddpm

        @jax.jit
        def edit_full(params, w0, uncond, src, tar, key):
            # params is an ARGUMENT: the weights stay out of the HLO.
            # ctrl defaults to None so the same callable honours the 3-arg
            # eps_fn contract of invert_ddpm (exercised when skip_zs is
            # flipped off to A/B the explicit-zs route).
            def eps_ctrl(x, t, c, ctrl=None):
                if getattr(ctrl, "stores_attn", False):
                    out, aux = unet.apply(params, x, t, c, ctrl, True,
                                          mutable=["attn_store"])
                    return out, aux["attn_store"]
                return unet.apply(params, x, t, c, ctrl)

            # skip_zs + derive_zs: the inversion is pure q-sampling (zero
            # UNet passes) and the edit scan derives each inversion
            # residual on the fly from its own controller-source row —
            # equivalence-tested vs the explicit-zs route
            # (tests/test_p2p.py).  The fused jit contains ONLY the single
            # edit scan's 2 UNet bodies (no control-window segmentation:
            # the P2P edits ride the fused path with dynamic step gates).
            inv = invert_ddpm(
                eps_ctrl, sched, w0, uncond_ctx=uncond, src_ctx=src,
                cfg_scale_src=1.0, eta=1.0, rng=key, skip_zs=True,
            )
            edited, _ = h_edit_p2p(
                eps_ctrl, sched, inv.xT, None, uncond_ctx=uncond,
                src_ctx=src, tar_ctx=tar, cfg=cfg, after_skip_steps=S,
                control=control, local_blend=lb0, xts=inv.xts[: S + 1],
                derive_zs=True,
            )
            return edited

        n = int(os.environ.get("HEDIT_BENCH_BATCH", "1"))
        if n > 1:
            # VERDICT r2 #6: the batched scan — vmap n images over the fused
            # single-jit scan, the same amortization lever batch mode proved
            # (batch-1 scan measured 2.209 s/image in round 2 vs 1.964
            # batched hostloop; the MXU under-utilizes at effective UNet
            # batch 4, not because of the scan structure itself).
            single = edit_full
            edit_full = jax.jit(jax.vmap(single, in_axes=(None, 0, 0, 0, 0, 0)))
            w0b = jnp.broadcast_to(w0, (n,) + w0.shape)
            ub = jnp.broadcast_to(uncond, (n,) + uncond.shape)
            sb = jnp.broadcast_to(src, (n,) + src.shape)
            tb = jnp.broadcast_to(tar, (n,) + tar.shape)

            def run(key):
                return edit_full(params, w0b, ub, sb, tb,
                                 jax.random.split(key, n))
        else:
            def run(key):
                return edit_full(params, w0, uncond, src, tar, key)

        t_setup = time.perf_counter()
        out = run(jax.random.PRNGKey(0))
        device_sync(out)
        print(f"# scan warmup (n={n}): {time.perf_counter() - t_setup:.1f}s",
              file=sys.stderr)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out = run(jax.random.PRNGKey(i + 1))
            device_sync(out)
            times.append(time.perf_counter() - t0)
        print(f"# scan timed runs: {[round(t, 2) for t in times]}",
              file=sys.stderr)
        return min(times) / n

    # -------------------------- hostloop mode ------------------------------ #
    @jax.jit
    def eps_plain(params, x, t, c):
        return unet.apply(params, x, t, c)

    @jax.jit
    def eps_p2p(params, x, t, c, ctrl):
        out, aux = unet.apply(params, x, t, c, ctrl, True, mutable=["attn_store"])
        return out, aux["attn_store"]

    @jax.jit
    def inversion_residuals(xts, eps_all):
        ts = sched.timesteps
        x_in = xts[1:][::-1]
        x_prev = xts[:-1][::-1]
        abar_t = jnp.take(sched.alphas_cumprod, ts).reshape(S, 1, 1, 1)
        abar_prev = sched.abar_prev(ts).reshape(S, 1, 1, 1)
        var = sched.variance(ts).reshape(S, 1, 1, 1)
        x0p = (x_in - jnp.sqrt(1 - abar_t) * eps_all) / jnp.sqrt(abar_t)
        mu = jnp.sqrt(abar_prev) * x0p + jnp.sqrt(1 - abar_prev - var) * eps_all
        return ((x_prev - mu) / jnp.sqrt(var))[::-1]

    @jax.jit
    def base_step(eps4, t, pair, z):
        eps_src = eps4[0:2] + cfg.cfg_src * (eps4[2:4] - eps4[0:2])
        prev = sched.reverse_step(eps_src, t, pair, eta=1.0, variance_noise=z)
        return prev[0:1], prev[1:2]

    @jax.jit
    def update_step(eps4c, t, tt, x_opt, lb, i, x_prev_orig):
        coeff = sched.h_edit_coeff(t, tt, 1.0)
        u_tar, cond_src, c_tar = eps4c[0:1], eps4c[1:2], eps4c[3:4]
        eps_se = u_tar + cfg.cfg_src_edit * (cond_src - u_tar)
        eps_ta = u_tar + cfg.cfg_tar * (c_tar - u_tar)
        x_opt = x_opt + coeff * (eps_ta - eps_se)
        pair = jnp.concatenate([x_prev_orig, x_opt], axis=0)
        pair = apply_local_blend(lb, pair, i)
        return pair[0:1], pair[1:2]

    ts_np = np.asarray(sched.timesteps)
    ctx4 = jnp.concatenate([uncond, uncond, src, src], axis=0)
    ctx4c = jnp.concatenate([uncond, src, src, tar], axis=0)

    def edit_one(w0, key):
        # ---- inversion: 25 batch-4 calls (2 steps x CFG pair each) -------- #
        xts, _ = sample_xts_from_x0(sched, w0, key)
        x_in = xts[1:][::-1]
        eps_list = []
        for c0 in range(0, S, 2):
            xc = jnp.concatenate(
                [x_in[c0:c0 + 2], x_in[c0:c0 + 2]], axis=0)
            tc = jnp.concatenate([sched.timesteps[c0:c0 + 2]] * 2)
            ctx = jnp.concatenate([uncond, uncond, src, src], axis=0)
            eps = eps_plain(params, xc, tc, ctx)
            eps_list.append(eps[0:2] + cfg.cfg_src * (eps[2:4] - eps[0:2]))
        eps_all = jnp.concatenate(eps_list, axis=0)
        zs = inversion_residuals(xts, eps_all)
        zs_loop = zs[::-1]

        # ---- edit loop ---------------------------------------------------- #
        x_orig = x_edit = xts[S][None]
        lb = lb0
        for i in range(S):
            t = int(ts_np[i])
            tt = int(ts_np[i + 1]) if i < S - 1 else 0
            pair = jnp.concatenate([x_orig, x_edit], axis=0)
            eps4 = eps_plain(
                params, jnp.concatenate([pair, pair], axis=0),
                jnp.full((4,), t, jnp.int32), ctx4,
            )
            x_prev_orig, x_opt = base_step(eps4, t, pair, zs_loop[i][None])
            # one batch-4 controlled call; row 1 carries the controller-
            # invisible source eps (cond_start=2) — 2 UNet dispatches/step.
            # One executable: the P2P edits are dynamically step-gated fused-
            # path rewrites (identity outside their windows).
            ctrl = dataclasses.replace(
                control, step=jnp.array(i, jnp.int32), cond_start=2,
            )
            eps4c, aux = eps_p2p(
                params,
                jnp.concatenate([x_opt, x_opt, x_prev_orig, x_opt], axis=0),
                jnp.full((4,), tt, jnp.int32), ctx4c, ctrl,
            )
            lb = accumulate_store(lb, flatten_attn_store(aux))
            x_orig, x_edit = update_step(
                eps4c, t, tt, x_opt, lb, jnp.array(i, jnp.int32), x_prev_orig,
            )
        return x_edit

    def run_hostloop():
        out = edit_one(w0, jax.random.PRNGKey(0))
        device_sync(out)  # warm-up / compile
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out = edit_one(w0, jax.random.PRNGKey(i + 1))
            device_sync(out)
            times.append(time.perf_counter() - t0)
        return min(times)

    mode = os.environ.get("HEDIT_BENCH_MODE", "batch")
    if mode == "scan":
        try:
            sec = run_scan()
        except Exception as e:  # remote-compile hiccups: fall back
            print(f"# scan mode failed: {type(e).__name__}: {str(e)[:500]}; hostloop fallback")
            sec = run_hostloop()
    elif mode == "split":
        try:
            sec = run_split()
        except Exception as e:
            print(f"# split mode failed: {type(e).__name__}: {str(e)[:300]}; hostloop fallback")
            sec = run_hostloop()
    elif mode == "stepjit":
        try:
            sec = run_stepjit()
        except Exception as e:
            print(f"# stepjit mode failed: {type(e).__name__}: {str(e)[:300]}; hostloop fallback")
            sec = run_hostloop()
    elif mode == "batch":
        n = int(os.environ.get("HEDIT_BENCH_BATCH", "8"))
        try:
            sec = run_batch(n)
        except Exception as e:
            print(f"# batch mode failed: {type(e).__name__}: {str(e)[:300]}; hostloop fallback")
            sec = run_hostloop()
    else:
        sec = run_hostloop()

    out = {
        "metric": "piebench_50step_hedit_R_p2p_implicit_wall_s_per_image",
        "value": round(sec, 3),
        "unit": "s/image",
        "vs_baseline": round(A100_BASELINE_S / sec, 2),
        # always quote the denominator with its provenance (VERDICT r3 weak
        # #3): the reference publishes NO wall-clock; 11.0 s/image is the
        # constructed A100+diffusers estimate derived in BASELINE.md, and
        # the honest floor is "measured s/image, >=3x under any defensible
        # A100 assumption"
        "baseline_s_per_image": A100_BASELINE_S,
        "baseline_provenance": "constructed A100+diffusers estimate (BASELINE.md); reference publishes no wall-clock",
    }
    if mode == "batch":
        # throughput view of the same measurement (the 700-image PieBench
        # sweep is a throughput job; per-image latency understates batching)
        out["images_per_s"] = round(1.0 / sec, 3)
        out["batch_images"] = int(os.environ.get("HEDIT_BENCH_BATCH", "8"))
    # Roofline sanity guard: ~550 batch-1-equivalent UNet passes/image at
    # ~0.68 TFLOP/pass = ~374 TFLOP/image; even a hypothetical 1 PFLOP/s
    # chip cannot go below ~0.37 s/image.  A smaller number means the
    # barrier was fooled (the tunnel once "measured" 0.039 s/image with a
    # lying block_until_ready) — flag it rather than record a phantom.
    # The floor scales with the chips sharing the sweep: an N-chip
    # data-parallel run legitimately divides per-image wall-clock by N.
    if sec < 0.37 / max(1, jax.device_count()):
        out["suspect_timing"] = True
        print("# WARNING: measured s/image is below the single-chip "
              "roofline floor; timing barrier likely broken", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
