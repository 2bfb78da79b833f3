"""Baseline editing methods with P2P — EF / PnP-Inv pair sampling and NMG.

Parity: ``text-guided/inversion/p2p_baselines.py``
* ``ef_or_pnp_inv_w_p2p`` (:102-188): per step one batch-4 CONTROLLED call
  [x_orig, x_edit] x [null, src|tar]; both uncond rows are consumed (separate
  CFG per branch), so the batch-4 layout is kept (cond_start=2).  The source
  branch steps with eta; the edited branch uses eta=0 when PnP-Inv
  (is_ddim_inversion) else eta (:176-181).
* ``nmg_p2p`` (:195-293): eta=0 throughout; per step, a Noise-Map-Guidance
  gradient step on the reconstruction branch — L1 between the DDIM-predicted
  x_{t-1} and the inversion's stored x_{t-1}^orig, backpropagated THROUGH the
  UNet (:255-264) — then a P2P-controlled pair step.  Note the reference
  applies the TARGET cfg scale to the source row (:281 —
  ``cfg_scales_tensor_tar`` quirk, reproduced).

The no-control EF baseline lives in ``hedit_tpu/edit/h_edit.py:ef_sample``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import NO_CONTROL
from hedit_tpu.control.p2p import (
    LocalBlendState,
    P2PControl,
    accumulate_store,
    apply_local_blend,
)
from hedit_tpu.core.schedule import Schedule
from hedit_tpu.edit.h_edit import make_step_grid, traj_inputs
from hedit_tpu.edit.h_edit_p2p import flatten_attn_store


def _with_step(control, i, **kw):
    """dataclasses.replace(control, step=i, **kw) keeping only fields the
    control actually has — lets the pair baselines drive P2P and MasaCtrl
    controls through one code path."""
    fields = {f.name for f in dataclasses.fields(control)}
    updates = {k: v for k, v in dict(step=i, **kw).items() if k in fields}
    return dataclasses.replace(control, **updates)


def ef_or_pnp_inv_p2p(
    eps_fn,
    schedule: Schedule,
    xT: jnp.ndarray,
    zs: jnp.ndarray,
    *,
    uncond_ctx: jnp.ndarray,
    src_ctx: jnp.ndarray,
    tar_ctx: jnp.ndarray,
    cfg_src: float,
    cfg_tar: float,
    eta: float = 1.0,
    is_ddim_inversion: bool = False,
    after_skip_steps: int,
    control: Optional[P2PControl] = None,
    local_blend: Optional[LocalBlendState] = None,
    xts: Optional[jnp.ndarray] = None,
    derive_zs: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """xts: optional stored inversion trajectory ([N+1, ...], xts[N] == xT).
    When given, the source branch is INDEXED instead of recomputed (the same
    reconstruction identity as h_edit_p2p) and the per-step call drops from
    batch-4 to batch-3 [x_edit(null), x_orig(src), x_edit(tar)] — the
    controller-base row stays (P2P reads its attention; LocalBlend stores
    its maps) but the two rows that only fed the source-branch CFG step
    disappear.  Only valid for P2P/no control: MasaCtrl's mutual attention
    consumes the uncond source row (its k/v feed row 1), so callers driving
    MasaCtrl through this loop must not pass xts.

    derive_zs (requires xts): inversion-free stepping.  The controller-base
    row's output is exactly eps(xts[t], t, src) — P2P's edit writes only the
    target row — i.e. THIS step's inversion evaluation, so the residual z is
    rebuilt in-loop and the standalone phase-2 inversion pass is skipped
    entirely (invert with skip_zs=True, pass zs=None)."""
    N = after_skip_steps
    use_xts, x_orig_seq, x_prev_seq = traj_inputs(xts, xT, N)
    if use_xts and control is not None and not hasattr(control, "edit_pair"):
        raise ValueError(
            "indexed-source fast path (xts) is only exact for P2P/no "
            "control — this control may consume the uncond source row")
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
    ctx4 = jnp.concatenate([uncond_ctx, uncond_ctx, src_ctx, tar_ctx], axis=0)
    ctx3 = jnp.concatenate([uncond_ctx, src_ctx, tar_ctx], axis=0)

    no_blend = local_blend is None
    if local_blend is None:
        px = getattr(control, "blend_px", 256) if control is not None else 256
        local_blend = LocalBlendState(
            alpha_layers=jnp.zeros((2, 77), jnp.float32),
            store_sum=jnp.zeros((5, 2, 1, px, 77), jnp.float32),
            start_blend=N + 2, res=int(px**0.5),
        )

    def body(carry, inputs):
        x_orig, x_edit, lb = carry
        i, t, tt, z, x_orig_t, x_prev_orig_t = inputs

        if use_xts:
            x_orig = x_orig_t
            xin3 = jnp.concatenate([x_edit, x_orig, x_edit], axis=0)
            if control is not None:
                ctrl = _with_step(control, i, save_attn=True, cond_start=1)
                out = eps_fn(xin3, jnp.broadcast_to(t, (3,)), ctx3, ctrl)
                if getattr(ctrl, "stores_attn", False):
                    eps3, aux = out
                    if not no_blend:
                        lb = accumulate_store(lb, flatten_attn_store(aux))
                else:
                    eps3 = out
            else:
                eps3 = eps_fn(xin3, jnp.broadcast_to(t, (3,)), ctx3, NO_CONTROL)
            eps_tar = eps3[0:1] + cfg_tar * (eps3[2:3] - eps3[0:1])
            x_prev_orig = x_prev_orig_t
            if derive_zs and eta > 0:
                # eps3[1] == eps(xts[t], t, src): rebuild this step's
                # inversion residual in-loop (see docstring).  Both
                # denominator forms scale with eta; at eta == 0 (DDIM /
                # PnP-Inv) the edit step below ignores z entirely, so the
                # division is skipped rather than silently producing NaNs.
                mu = schedule.reverse_step(
                    eps3[1:2], t, x_orig, eta=eta,
                    is_ddim_inversion=is_ddim_inversion,
                )
                denom = eta if is_ddim_inversion \
                    else eta * jnp.sqrt(schedule.variance(t))
                z = (x_prev_orig_t - mu) / denom
        else:
            pair = jnp.concatenate([x_orig, x_edit], axis=0)
            xin4 = jnp.concatenate([pair, pair], axis=0)
            if control is not None:
                ctrl = _with_step(control, i, save_attn=True, cond_start=2)
                out = eps_fn(xin4, jnp.broadcast_to(t, (4,)), ctx4, ctrl)
                if getattr(ctrl, "stores_attn", False):
                    eps4, aux = out
                    if not no_blend:
                        lb = accumulate_store(lb, flatten_attn_store(aux))
                else:
                    eps4 = out
            else:
                eps4 = eps_fn(xin4, jnp.broadcast_to(t, (4,)), ctx4, NO_CONTROL)

            eps_src = eps4[0:1] + cfg_src * (eps4[2:3] - eps4[0:1])
            eps_tar = eps4[1:2] + cfg_tar * (eps4[3:4] - eps4[1:2])

            x_prev_orig = schedule.reverse_step(
                eps_src, t, x_orig, eta=eta, variance_noise=z,
                is_ddim_inversion=is_ddim_inversion,
            )
        if is_ddim_inversion:
            # PnP-Inv edited branch: pure DDIM step, eta=0 (:176-178)
            x_prev_edit = schedule.reverse_step(eps_tar, t, x_edit, eta=0.0)
        else:
            x_prev_edit = schedule.reverse_step(
                eps_tar, t, x_edit, eta=eta, variance_noise=z,
            )

        pair_out = jnp.concatenate([x_prev_orig, x_prev_edit], axis=0)
        if not no_blend:
            pair_out = apply_local_blend(lb, pair_out, i)
        return (pair_out[0:1], pair_out[1:2], lb), None

    (x_orig, x_edit, _), _ = jax.lax.scan(
        body, (xT, xT, local_blend),
        (steps, grid.ts, grid.tts, grid.zs, x_orig_seq, x_prev_seq),
    )
    return x_edit, x_orig


def nmg_p2p(
    eps_fn,
    schedule: Schedule,
    xT: jnp.ndarray,
    xts_ori: jnp.ndarray,   # [N+1, H, W, C] — wts[:after_skip+1] (:243)
    zs: jnp.ndarray,
    *,
    uncond_ctx: jnp.ndarray,
    src_ctx: jnp.ndarray,
    tar_ctx: jnp.ndarray,
    cfg_tar: float,
    after_skip_steps: int,
    control: Optional[P2PControl] = None,
    local_blend: Optional[LocalBlendState] = None,
    guidance_noise_map: float = 10.0,
    grad_scale: float = 5e3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N = after_skip_steps
    grid = make_step_grid(schedule, zs, N)
    steps = jnp.arange(N, dtype=jnp.int32)
    ctx4 = jnp.concatenate([uncond_ctx, uncond_ctx, src_ctx, tar_ctx], axis=0)
    # ground-truth x_{t-1}^orig at loop i: xT_ori[len-i-2] (:248)
    gt_prev = xts_ori[::-1][1:]  # position i -> xts_ori[N - 1 - i]

    no_blend = local_blend is None
    if local_blend is None:
        px = getattr(control, "blend_px", 256) if control is not None else 256
        local_blend = LocalBlendState(
            alpha_layers=jnp.zeros((2, 77), jnp.float32),
            store_sum=jnp.zeros((5, 2, 1, px, 77), jnp.float32),
            start_blend=N + 2, res=int(px**0.5),
        )

    def body(carry, inputs):
        x_orig, x_edit, lb = carry
        i, t, _tt, x_ori_gt = inputs

        # --- NMG gradient step on the reconstruction branch (:253-269) ----- #
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

        # --- P2P-controlled pair step (:271-289) --------------------------- #
        pair = jnp.concatenate([x_orig, x_edit], axis=0)
        xin4 = jnp.concatenate([pair, pair], axis=0)
        if control is not None:
            ctrl = _with_step(control, i, save_attn=True, cond_start=2)
            out = eps_fn(xin4, jnp.broadcast_to(t, (4,)), ctx4, ctrl)
            if getattr(ctrl, "stores_attn", False):
                eps4, aux = out
                if not no_blend:
                    lb = accumulate_store(lb, flatten_attn_store(aux))
            else:
                eps4 = out
        else:
            eps4 = eps_fn(xin4, jnp.broadcast_to(t, (4,)), ctx4, NO_CONTROL)

        # NOTE: tar scale on BOTH rows (:281 reference quirk)
        eps_src = eps4[0:1] + cfg_tar * (eps4[2:3] - eps4[0:1])
        eps_tar = eps4[1:2] + cfg_tar * (eps4[3:4] - eps4[1:2])
        x_prev_orig = schedule.reverse_step(eps_src, t, x_orig, eta=0.0)
        x_prev_edit = schedule.reverse_step(eps_tar, t, x_edit, eta=0.0)

        pair_out = jnp.concatenate([x_prev_orig, x_prev_edit], axis=0)
        if not no_blend:
            pair_out = apply_local_blend(lb, pair_out, i)
        return (pair_out[0:1], pair_out[1:2], lb), None

    (x_orig, x_edit, _), _ = jax.lax.scan(
        body, (xT, xT, local_blend), (steps, grid.ts, grid.tts, gt_prev[:, None])
    )
    return x_edit, x_orig
