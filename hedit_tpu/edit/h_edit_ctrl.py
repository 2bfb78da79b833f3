"""h-Edit with MasaCtrl / PnP control — implicit-form scans.

Parity targets:
* ``text-guided/inversion/masactrl_h_edit.py:14-155`` — base pass with editor
  OFF, controlled batch-4 correction pass ([x_{t-1}^orig, x_opt] x 2, MasaCtrl
  modifies BOTH CFG halves so the uncond source row is genuinely needed —
  batch-4 is kept, unlike the P2P case), CFG recombination against
  uncond_out_tar, 1-opt-step convention (:24).
* ``text-guided/inversion/pnp_h_edit.py:33-167`` — batch-4 base pass escapes
  injection in the reference because PnP only fires at batch size 2
  (docs.md:39-46); here the base pass simply gets NO_CONTROL.  Correction:
  eps(x_opt, tt, src) and eps(x_opt, tt, null) on SINGLE samples (:138-139,
  deliberately uncontrolled), then the controlled PAIR call
  [x_{t-1}^orig(src), x_opt(tar)] (:141-146).

The MasaCtrl source-prompt convention (empty source prompt,
``main_masactrl.py:180``) is the caller's responsibility: pass src_ctx =
uncond_ctx.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import NO_CONTROL
from hedit_tpu.control.masactrl import MasaCtrlControl
from hedit_tpu.control.pnp import PnPControl
from hedit_tpu.core.schedule import Schedule
from hedit_tpu.edit.h_edit import HEditConfig, make_step_grid, traj_inputs


def h_edit_masactrl(
    eps_fn,
    schedule: Schedule,
    xT: jnp.ndarray,
    zs: jnp.ndarray,
    *,
    uncond_ctx: jnp.ndarray,
    src_ctx: jnp.ndarray,
    tar_ctx: jnp.ndarray,
    cfg: HEditConfig,
    after_skip_steps: int,
    start_step: int = 4,
    start_layer: int = 10,
    xts=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N = after_skip_steps
    grid = make_step_grid(schedule, zs, N)
    steps = jnp.arange(N, dtype=jnp.int32)
    ctx4_base = jnp.concatenate([uncond_ctx, uncond_ctx, src_ctx, src_ctx], axis=0)
    ctx4_edit = jnp.concatenate([uncond_ctx, uncond_ctx, src_ctx, tar_ctx], axis=0)
    ctx2_base = jnp.concatenate([uncond_ctx, src_ctx], axis=0)
    use_xts, x_orig_seq, x_prev_seq = traj_inputs(xts, xT, N)

    def body(carry, inputs):
        x_orig, x_edit = carry
        i, t, tt, z, _x_orig_t, x_prev_orig_t = inputs

        # cfg_src == 1.0: the uncond rows cancel (u + 1.0*(c-u) == c) and
        # are skipped at trace time.
        if use_xts:
            # source branch = stored inversion trajectory (see traj_inputs)
            x_prev_orig = x_prev_orig_t
            if cfg.cfg_src == 1.0:
                eps_src_base = eps_fn(
                    x_edit, jnp.broadcast_to(t, (1,)), src_ctx, NO_CONTROL)
            else:
                xin2 = jnp.concatenate([x_edit, x_edit], axis=0)
                eps2 = eps_fn(xin2, jnp.broadcast_to(t, (2,)), ctx2_base, NO_CONTROL)
                eps_src_base = eps2[0:1] + cfg.cfg_src * (eps2[1:2] - eps2[0:1])
            x_prev_base = schedule.reverse_step(
                eps_src_base, t, x_edit, eta=cfg.eta, variance_noise=z,
                is_ddim_inversion=cfg.is_ddim_inversion,
            )
        else:
            pair = jnp.concatenate([x_orig, x_edit], axis=0)
            if cfg.cfg_src == 1.0:
                ctx2src = jnp.concatenate([src_ctx, src_ctx], axis=0)
                eps_src_orig = eps_fn(
                    pair, jnp.broadcast_to(t, (2,)), ctx2src, NO_CONTROL)
            else:
                xin4 = jnp.concatenate([pair, pair], axis=0)
                eps4 = eps_fn(xin4, jnp.broadcast_to(t, (4,)), ctx4_base, NO_CONTROL)
                eps_src_orig = eps4[0:2] + cfg.cfg_src * (eps4[2:4] - eps4[0:2])
            x_prev_pair = schedule.reverse_step(
                eps_src_orig, t, pair, eta=cfg.eta, variance_noise=z,
                is_ddim_inversion=cfg.is_ddim_inversion,
            )
            x_prev_orig, x_prev_base = x_prev_pair[0:1], x_prev_pair[1:2]

        coeff = schedule.h_edit_coeff(
            t, tt, cfg.eta, is_ddim_inversion=cfg.is_ddim_inversion
        )

        x_opt = x_prev_base
        for _ in range(cfg.optimization_steps):
            cond_out_src = eps_fn(x_opt, jnp.broadcast_to(tt, (1,)), src_ctx, NO_CONTROL)
            ctrl = MasaCtrlControl(
                step=i, start_step=start_step, start_layer=start_layer
            )
            pair_opt = jnp.concatenate([x_prev_orig, x_opt], axis=0)
            xin = jnp.concatenate([pair_opt, pair_opt], axis=0)
            eps_c = eps_fn(xin, jnp.broadcast_to(tt, (4,)), ctx4_edit, ctrl)
            uncond_out_tar, cond_out_tar = eps_c[1:2], eps_c[3:4]
            eps_src_edit = uncond_out_tar + cfg.cfg_src_edit * (cond_out_src - uncond_out_tar)
            eps_tar = uncond_out_tar + cfg.cfg_tar * (cond_out_tar - uncond_out_tar)
            x_opt = x_opt + coeff * (eps_tar - eps_src_edit)

        return (x_prev_orig, x_opt), None

    (x_orig, x_edit), _ = jax.lax.scan(
        body, (xT, xT),
        (steps, grid.ts, grid.tts, grid.zs, x_orig_seq, x_prev_seq))
    return x_edit, x_orig


def h_edit_pnp(
    eps_fn,
    schedule: Schedule,
    xT: jnp.ndarray,
    zs: jnp.ndarray,
    *,
    uncond_ctx: jnp.ndarray,
    src_ctx: jnp.ndarray,
    tar_ctx: jnp.ndarray,
    cfg: HEditConfig,
    after_skip_steps: int,
    qk_mask: jnp.ndarray,    # [N] bool — from pnp_step_gates
    conv_mask: jnp.ndarray,  # [N] bool
    xts=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N = after_skip_steps
    grid = make_step_grid(schedule, zs, N)
    steps = jnp.arange(N, dtype=jnp.int32)
    # The reference gates injection on the time the UNet is CALLED at: the
    # correction pair runs at tt = timesteps[i+1] (``pnp_h_edit.py:131-146``
    # register_time(model, tt) before the pair call), so schedule membership
    # is i+1 < int(N*frac) — shift the step masks by one (last step's
    # tt = 0 is never in the schedule).  The baseline loops' pair calls run
    # at t and keep the unshifted masks.
    false1 = jnp.zeros((1,), bool)
    qk_mask = jnp.concatenate([jnp.asarray(qk_mask)[1:], false1])
    conv_mask = jnp.concatenate([jnp.asarray(conv_mask)[1:], false1])
    ctx4_base = jnp.concatenate([uncond_ctx, uncond_ctx, src_ctx, src_ctx], axis=0)
    ctx2_base = jnp.concatenate([uncond_ctx, src_ctx], axis=0)
    ctx_pair = jnp.concatenate([src_ctx, tar_ctx], axis=0)
    use_xts, x_orig_seq, x_prev_seq = traj_inputs(xts, xT, N)

    def body(carry, inputs):
        x_orig, x_edit = carry
        i, t, tt, z, qk_on, conv_on, _x_orig_t, x_prev_orig_t = inputs

        # cfg_src == 1.0: the uncond rows cancel (u + 1.0*(c-u) == c) and
        # are skipped at trace time.
        if use_xts:
            # source branch = stored inversion trajectory (see traj_inputs)
            x_prev_orig = x_prev_orig_t
            if cfg.cfg_src == 1.0:
                eps_src_base = eps_fn(
                    x_edit, jnp.broadcast_to(t, (1,)), src_ctx, NO_CONTROL)
            else:
                xin2 = jnp.concatenate([x_edit, x_edit], axis=0)
                eps2 = eps_fn(xin2, jnp.broadcast_to(t, (2,)), ctx2_base, NO_CONTROL)
                eps_src_base = eps2[0:1] + cfg.cfg_src * (eps2[1:2] - eps2[0:1])
            x_prev_base = schedule.reverse_step(
                eps_src_base, t, x_edit, eta=cfg.eta, variance_noise=z,
                is_ddim_inversion=cfg.is_ddim_inversion,
            )
        else:
            pair = jnp.concatenate([x_orig, x_edit], axis=0)
            if cfg.cfg_src == 1.0:
                ctx2src = jnp.concatenate([src_ctx, src_ctx], axis=0)
                eps_src_orig = eps_fn(
                    pair, jnp.broadcast_to(t, (2,)), ctx2src, NO_CONTROL)
            else:
                xin4 = jnp.concatenate([pair, pair], axis=0)
                eps4 = eps_fn(xin4, jnp.broadcast_to(t, (4,)), ctx4_base, NO_CONTROL)
                eps_src_orig = eps4[0:2] + cfg.cfg_src * (eps4[2:4] - eps4[0:2])
            x_prev_pair = schedule.reverse_step(
                eps_src_orig, t, pair, eta=cfg.eta, variance_noise=z,
                is_ddim_inversion=cfg.is_ddim_inversion,
            )
            x_prev_orig, x_prev_base = x_prev_pair[0:1], x_prev_pair[1:2]

        coeff = schedule.h_edit_coeff(
            t, tt, cfg.eta, is_ddim_inversion=cfg.is_ddim_inversion
        )

        x_opt = x_prev_base
        for _ in range(cfg.optimization_steps):
            cond_out_src = eps_fn(x_opt, jnp.broadcast_to(tt, (1,)), src_ctx, NO_CONTROL)
            uncond_out_tar = eps_fn(x_opt, jnp.broadcast_to(tt, (1,)), uncond_ctx, NO_CONTROL)
            ctrl = PnPControl(qk_on=qk_on, conv_on=conv_on)
            pair_opt = jnp.concatenate([x_prev_orig, x_opt], axis=0)
            eps_c = eps_fn(pair_opt, jnp.broadcast_to(tt, (2,)), ctx_pair, ctrl)
            cond_out_tar = eps_c[1:2]
            eps_src_edit = uncond_out_tar + cfg.cfg_src_edit * (cond_out_src - uncond_out_tar)
            eps_tar = uncond_out_tar + cfg.cfg_tar * (cond_out_tar - uncond_out_tar)
            x_opt = x_opt + coeff * (eps_tar - eps_src_edit)

        return (x_prev_orig, x_opt), None

    (x_orig, x_edit), _ = jax.lax.scan(
        body, (xT, xT),
        (steps, grid.ts, grid.tts, grid.zs, qk_mask, conv_mask,
         x_orig_seq, x_prev_seq)
    )
    return x_edit, x_orig
