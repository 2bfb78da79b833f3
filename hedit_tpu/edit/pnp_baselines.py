"""Baseline editing methods under Plug-and-Play injection.

Parity: ``text-guided/inversion/pnp_baselines.py`` —
* EF / PnP-Inv + PnP (:317-392): pair sampling; conditional noise from a
  batch-2 [source, target] call (PnP active), unconditional noise from
  per-row batch-1 calls (PnP inactive by construction — docs.md:39-46).
* NMG + PnP (:32-126): the NMG gradient step on the reconstruction branch
  then the PnP pair step, eta=0.
* Null-text + PnP (:130-238): per step, up-to-10 Adam iterations optimizing
  the unconditional embedding toward the stored x_{t-1}^orig (lr
  1e-2*(1-i/100), early stop at loss < 1e-5 + i*2e-5), then the pair step
  using the optimized embedding; tar cfg scale on both rows (:231-234).
* Negative-prompt + PnP (:244-309): the "uncond" embedding is simply the
  source prompt embedding.

All loops compile to a single lax.scan; the per-step Adam of null-text runs
as a lax.while_loop with the reference's post-update break predicate, so a
converged step skips the remaining UNet fwd+bwd passes instead of masking
them out.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import NO_CONTROL
from hedit_tpu.control.pnp import PnPControl
from hedit_tpu.core.schedule import Schedule
from hedit_tpu.edit.h_edit import make_step_grid, traj_inputs


def _pnp_pair_eps(eps_fn, x_pair, t, src_ctx, tar_ctx, uncond_ctx, cfg_tar,
                  qk_on, conv_on, uncond_override=None):
    """(eps_src, eps_tar) with conditional batch-2 under PnP and per-row
    unconditional batch-1 calls (injection-free)."""
    ctrl = PnPControl(qk_on=qk_on, conv_on=conv_on)
    ctx_pair = jnp.concatenate([src_ctx, tar_ctx], axis=0)
    cond = eps_fn(x_pair, jnp.broadcast_to(t, (2,)), ctx_pair, ctrl)
    u_ctx = uncond_ctx if uncond_override is None else uncond_override
    u_src = eps_fn(x_pair[0:1], jnp.broadcast_to(t, (1,)), u_ctx, NO_CONTROL)
    u_tar = eps_fn(x_pair[1:2], jnp.broadcast_to(t, (1,)), u_ctx, NO_CONTROL)
    eps_src = u_src + cfg_tar * (cond[0:1] - u_src)
    eps_tar = u_tar + cfg_tar * (cond[1:2] - u_tar)
    return eps_src, eps_tar


def ef_or_pnp_inv_w_pnp(
    eps_fn, schedule: Schedule, xT, zs, *, uncond_ctx, src_ctx, tar_ctx,
    cfg_src: float, cfg_tar: float, eta: float, is_ddim_inversion: bool,
    after_skip_steps: int, qk_mask, conv_mask, xts=None,
    derive_zs: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """xts: stored inversion trajectory — indexes the source branch instead
    of stepping it (reconstruction identity).  The conditional source ROW
    stays in the pair (PnP injects its q/k into the target), but its uncond
    counterpart — which only fed the source-branch CFG step — disappears:
    4 UNet rows/step -> 3.

    derive_zs (requires xts): the pair's source-row output is plain
    eps(xts[t], t, src) — PnP injection only writes the target row — so the
    inversion residual is rebuilt in-loop and the phase-2 inversion pass is
    skipped (invert with skip_zs=True, zs=None)."""
    N = after_skip_steps
    use_xts, x_orig_seq, x_prev_seq = traj_inputs(xts, xT, N)
    if derive_zs:
        assert use_xts, "derive_zs requires the stored trajectory (xts)"
        assert eta > 0 or is_ddim_inversion, "derive_zs needs eta>0 (DDPM)"
        # the inversion computed residuals from CFG source noise; the in-loop
        # row is pure cond(src), so they agree only at cfg_src == 1 (for DDIM
        # the edit branch is an eta=0 step and z is unused anyway)
        assert cfg_src == 1.0 or is_ddim_inversion, \
            "derive_zs (DDPM) requires cfg_src == 1.0"
        if zs is None:
            zs = jnp.zeros((N,) + xT.shape[1:], xT.dtype)
    grid = make_step_grid(schedule, zs, N)
    steps = jnp.arange(N, dtype=jnp.int32)

    def body(carry, inputs):
        x_orig, x_edit = carry
        i, t, tt, z, qk_on, conv_on, x_orig_t, x_prev_orig_t = inputs
        if use_xts:
            x_orig = x_orig_t
        pair = jnp.concatenate([x_orig, x_edit], axis=0)
        ctrl = PnPControl(qk_on=qk_on, conv_on=conv_on)
        ctx_pair = jnp.concatenate([src_ctx, tar_ctx], axis=0)
        cond = eps_fn(pair, jnp.broadcast_to(t, (2,)), ctx_pair, ctrl)
        u_tar = eps_fn(x_edit, jnp.broadcast_to(t, (1,)), uncond_ctx, NO_CONTROL)
        eps_tar = u_tar + cfg_tar * (cond[1:2] - u_tar)

        if use_xts:
            x_prev_orig = x_prev_orig_t
            if derive_zs and eta > 0:
                # cond[0] == eps(xts[t], t, src): rebuild the inversion
                # residual in-loop (see docstring).  Both denominator forms
                # scale with eta; at eta == 0 (DDIM / PnP-Inv) the edit step
                # below ignores z entirely, so the division is skipped
                # rather than silently producing NaNs.
                mu = schedule.reverse_step(
                    cond[0:1], t, x_orig, eta=eta,
                    is_ddim_inversion=is_ddim_inversion,
                )
                denom = eta if is_ddim_inversion \
                    else eta * jnp.sqrt(schedule.variance(t))
                z = (x_prev_orig_t - mu) / denom
        else:
            u_src = eps_fn(x_orig, jnp.broadcast_to(t, (1,)), uncond_ctx,
                           NO_CONTROL)
            eps_src = u_src + cfg_src * (cond[0:1] - u_src)
            x_prev_orig = schedule.reverse_step(
                eps_src, t, x_orig, eta=eta, variance_noise=z,
                is_ddim_inversion=is_ddim_inversion,
            )
        if is_ddim_inversion:
            x_prev_edit = schedule.reverse_step(eps_tar, t, x_edit, eta=0.0)
        else:
            x_prev_edit = schedule.reverse_step(
                eps_tar, t, x_edit, eta=eta, variance_noise=z,
            )
        return (x_prev_orig, x_prev_edit), None

    (x_orig, x_edit), _ = jax.lax.scan(
        body, (xT, xT),
        (steps, grid.ts, grid.tts, grid.zs, qk_mask, conv_mask,
         x_orig_seq, x_prev_seq),
    )
    return x_edit, x_orig


def nmg_pnp_loop(
    eps_fn, schedule: Schedule, xT, xts_ori, zs, *, uncond_ctx, src_ctx,
    tar_ctx, cfg_tar: float, after_skip_steps: int, qk_mask, conv_mask,
    guidance_noise_map: float = 10.0, grad_scale: float = 5e3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N = after_skip_steps
    grid = make_step_grid(schedule, zs, N)
    steps = jnp.arange(N, dtype=jnp.int32)
    gt_prev = xts_ori[::-1][1:]

    def body(carry, inputs):
        x_orig, x_edit = carry
        i, t, tt, x_ori_gt, qk_on, conv_on = inputs

        def loss_fn(x_in):
            eps_u = eps_fn(x_in, jnp.broadcast_to(t, (1,)), uncond_ctx, NO_CONTROL)
            x_pred = schedule.reverse_step(eps_u, t, x_in, eta=0.0)
            return jnp.mean(jnp.abs(x_pred - x_ori_gt))

        grad = -jax.grad(loss_fn)(x_orig)
        eps_u = eps_fn(x_orig, jnp.broadcast_to(t, (1,)), uncond_ctx, NO_CONTROL)
        abar_t = jnp.take(schedule.alphas_cumprod, t)
        eps_cond = eps_u - jnp.sqrt(1.0 - abar_t) * grad * grad_scale
        eps_nmg = eps_u + guidance_noise_map * (eps_cond - eps_u)
        x_orig = schedule.reverse_step(eps_nmg, t, x_orig, eta=0.0)

        pair = jnp.concatenate([x_orig, x_edit], axis=0)
        eps_src, eps_tar = _pnp_pair_eps(
            eps_fn, pair, t, src_ctx, tar_ctx, uncond_ctx, cfg_tar, qk_on, conv_on
        )
        x_prev_orig = schedule.reverse_step(eps_src, t, x_orig, eta=0.0)
        x_prev_edit = schedule.reverse_step(eps_tar, t, x_edit, eta=0.0)
        return (x_prev_orig, x_prev_edit), None

    (x_orig, x_edit), _ = jax.lax.scan(
        body, (xT, xT),
        (steps, grid.ts, grid.tts, gt_prev[:, None], qk_mask, conv_mask),
    )
    return x_edit, x_orig


def null_text_pnp(
    eps_fn, schedule: Schedule, xT, xts_ori, zs, *, uncond_ctx, src_ctx,
    tar_ctx, cfg_tar: float, after_skip_steps: int, qk_mask, conv_mask,
    optimization_steps: int = 10, epsilon: float = 1e-5, lr_base: float = 1e-2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N = after_skip_steps
    grid = make_step_grid(schedule, zs, N)
    steps = jnp.arange(N, dtype=jnp.int32)
    gt_prev = xts_ori[::-1][1:]
    b1, b2, adam_eps = 0.9, 0.999, 1e-8

    def body(carry, inputs):
        x_orig, x_edit = carry
        i, t, tt, xtm1_ori, qk_on, conv_on = inputs

        cond_src = eps_fn(x_orig, jnp.broadcast_to(t, (1,)), src_ctx, NO_CONTROL)
        lr = lr_base * (1.0 - i.astype(jnp.float32) / 100.0)
        thresh = epsilon + i.astype(jnp.float32) * 2e-5

        # The reference applies the Adam update, THEN breaks when that
        # iteration's loss is under the threshold
        # (text-guided/inversion/pnp_baselines.py:195-215).  A while_loop
        # reproduces that exactly — the stopping iteration's update lands,
        # nothing runs after — and, unlike a masked fixed-length fori, skips
        # the remaining UNet fwd+bwd passes once converged (the dominant
        # per-step cost: each Adam iteration is a full UNet VJP).
        def adam_cond(state):
            j, _, _, _, stopped = state
            return jnp.logical_and(j < optimization_steps,
                                   jnp.logical_not(stopped))

        def adam_step(state):
            j, u, m, v, _ = state

            def loss_fn(uu):
                eps_u = eps_fn(x_orig, jnp.broadcast_to(t, (1,)), uu, NO_CONTROL)
                eps_cfg = eps_u + cfg_tar * (cond_src - eps_u)
                x_pred = schedule.reverse_step(eps_cfg, t, x_orig, eta=0.0)
                return jnp.mean((x_pred - xtm1_ori) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(u)
            m2 = b1 * m + (1 - b1) * g
            v2 = b2 * v + (1 - b2) * g * g
            jf = j + 1
            mhat = m2 / (1 - b1**jf)
            vhat = v2 / (1 - b2**jf)
            u2 = u - lr * mhat / (jnp.sqrt(vhat) + adam_eps)
            return (jf, u2, m2, v2, loss < thresh)

        u0 = uncond_ctx
        _, u_opt, _, _, _ = jax.lax.while_loop(
            adam_cond, adam_step,
            (jnp.array(0, jnp.int32), u0, jnp.zeros_like(u0),
             jnp.zeros_like(u0), jnp.array(False)),
        )

        pair = jnp.concatenate([x_orig, x_edit], axis=0)
        eps_src, eps_tar = _pnp_pair_eps(
            eps_fn, pair, t, src_ctx, tar_ctx, uncond_ctx, cfg_tar, qk_on,
            conv_on, uncond_override=u_opt,
        )
        x_prev_orig = schedule.reverse_step(eps_src, t, x_orig, eta=0.0)
        x_prev_edit = schedule.reverse_step(eps_tar, t, x_edit, eta=0.0)
        return (x_prev_orig, x_prev_edit), None

    (x_orig, x_edit), _ = jax.lax.scan(
        body, (xT, xT),
        (steps, grid.ts, grid.tts, gt_prev[:, None], qk_mask, conv_mask),
    )
    return x_edit, x_orig


def negative_prompt_pnp(
    eps_fn, schedule: Schedule, xT, zs, *, uncond_ctx, src_ctx, tar_ctx,
    cfg_tar: float, after_skip_steps: int, qk_mask, conv_mask,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N = after_skip_steps
    grid = make_step_grid(schedule, zs, N)
    steps = jnp.arange(N, dtype=jnp.int32)

    def body(carry, inputs):
        x_orig, x_edit = carry
        i, t, tt, z, qk_on, conv_on = inputs
        pair = jnp.concatenate([x_orig, x_edit], axis=0)
        eps_src, eps_tar = _pnp_pair_eps(
            eps_fn, pair, t, src_ctx, tar_ctx, uncond_ctx, cfg_tar, qk_on,
            conv_on, uncond_override=src_ctx,
        )
        x_prev_orig = schedule.reverse_step(eps_src, t, x_orig, eta=0.0)
        x_prev_edit = schedule.reverse_step(eps_tar, t, x_edit, eta=0.0)
        return (x_prev_orig, x_prev_edit), None

    (x_orig, x_edit), _ = jax.lax.scan(
        body, (xT, xT), (steps, grid.ts, grid.tts, grid.zs, qk_mask, conv_mask)
    )
    return x_edit, x_orig
