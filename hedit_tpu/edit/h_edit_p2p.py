"""h-Edit-D / h-Edit-R with Prompt-to-Prompt control, as single lax.scans.

Semantics parity: ``text-guided/inversion/p2p_h_edit.py``
* ``h_Edit_p2p_explicit``  (:380-523)
* ``h_Edit_p2p_implicit``  (:529-701) — the flagship PieBench-SOTA config.

Per-step structure (implicit):
1. base pass, controller OFF, batch-4 [x_orig, x_edit] x [null, src]
   (:602-616) -> CFG eps_src_orig for BOTH branches -> reverse_step.
2. per optimization loop k: ONE batch-4 CONTROLLED pass at tt with rows
   [x_opt(null), x_opt(src), x_prev_orig(src), x_opt(tar)] and cond_start=2.
   The reference issues a batch-1 controller-OFF call for eps(x_opt, tt, src)
   (:643-644) plus a batch-4 controlled call whose (x_prev_orig, null) row is
   consumed nowhere (:647-652).  The controller only reads/edits the rows
   [cond_start, cond_start+2) (ptp_classes.py:96-98), so row 1 here rides
   through the SAME pass untouched and IS the reference's separate
   source-eps call — identical numerics, one less UNet dispatch per loop and
   no wasted row.  CFG combos AGAINST uncond_out_tar (:658-660), correction,
   coeff, L1-reconstruction pull for k>0 (:670-686), update (:692).
   Only the LAST loop saves attention (save_attn flag, :636-640).
3. LocalBlend step callback on [x_{t-1}^orig, x_{t-1}^edit] (:698-699).

Attention-store plumbing: stored maps come back through flax's ``attn_store``
mutable collection and are summed into the scan-carried LocalBlend state.
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
from hedit_tpu.edit.h_edit import (
    HEditConfig, _l1_grad, _rms, make_step_grid, traj_inputs)


def flatten_attn_store(tree) -> dict:
    """Collect sown attention maps from the nested mutable collection into
    {store_name: array} (sow wraps each value in a 1-tuple)."""
    out = {}

    def walk(node):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v)
            else:
                out[k] = v[0] if isinstance(v, tuple) else v

    walk(tree)
    return out


def h_edit_p2p(
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
    control: P2PControl,
    local_blend: Optional[LocalBlendState] = None,
    style_fn=None,
    xts: Optional[jnp.ndarray] = None,
    derive_zs: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """h-Edit +P2P (explicit or implicit by cfg.implicit).

    eps_fn(x, t, ctx, control) -> eps or (eps, attn_store_tree) when the
    control stores attention.  Returns (edited, reconstructed).

    xts: optional [N+1, 1, H, W, C] stored inversion trajectory with
    xts[N] == xT.  When given, the source branch is INDEXED instead of
    recomputed: by the reconstruction identity, reverse_step on xts[t] with
    the inversion residual z reproduces xts[t-1] exactly (LocalBlend maps
    the source row to itself), so the controller-OFF base call shrinks from
    batch-4 to batch-2 — 25% fewer UNet rows per step, identical numerics
    up to f32 accumulation order.

    derive_zs: inversion-free stepping (requires xts, implicit, cfg_src=1,
    eta>0).  The inversion residual z at step i is derived on the fly from
    eps(xts[t_i], t_i, src) — which step i-1's controlled call already
    computed as its controller-source row (P2P's edit_probs writes only the
    target row, so that output is untouched; step 0's z comes from the base
    call since x_edit == x_orig == xT there).  The standalone phase-2
    inversion UNet pass becomes unnecessary: pass zs=None.
    """
    N = after_skip_steps
    if derive_zs:
        assert xts is not None and cfg.implicit and cfg.cfg_src == 1.0 \
            and cfg.eta > 0, \
            "derive_zs needs xts + implicit + cfg_src==1.0 + eta>0"
        if zs is None:
            zs = jnp.zeros((N,) + xT.shape[1:], xT.dtype)
    grid = make_step_grid(schedule, zs, N)
    steps = jnp.arange(N, dtype=jnp.int32)

    use_xts, x_orig_seq, x_prev_seq = traj_inputs(xts, xT, N)

    ctx4 = jnp.concatenate([uncond_ctx, uncond_ctx, src_ctx, src_ctx], axis=0)
    ctx4c = jnp.concatenate([uncond_ctx, src_ctx, src_ctx, tar_ctx], axis=0)

    no_blend = local_blend is None
    if local_blend is None:
        # carry a dummy that is never touched (start_blend > N, no accumulate)
        px = control.blend_px
        local_blend = LocalBlendState(
            alpha_layers=jnp.zeros((2, 77), jnp.float32),
            store_sum=jnp.zeros((5, 2, 1, px, 77), jnp.float32),
            start_blend=N + 2,
            res=int(px**0.5),
        )

    def cfg_pair(e_u, e_c, scale):
        return e_u + scale * (e_c - e_u)

    ctx2 = jnp.concatenate([uncond_ctx, src_ctx], axis=0)

    def body_impl(control, carry, inputs):
        x_orig, x_edit, lb, eps_orig_c = carry
        i, t, tt, z, x_orig_t, x_prev_orig_t = inputs

        # ---- 1. base: x_{t-1}^orig and x_{t-1}^base (controller OFF) ------ #
        # cfg_src == 1.0 (the PieBench config): u + 1.0*(c-u) == c, so the
        # uncond rows cancel algebraically and are skipped at trace time.
        if use_xts:
            x_orig = x_orig_t
            x_prev_orig = x_prev_orig_t
            if cfg.cfg_src == 1.0:
                eps_src_base = eps_fn(
                    x_edit, jnp.broadcast_to(t, (1,)), src_ctx, NO_CONTROL)
            else:
                xin2 = jnp.concatenate([x_edit, x_edit], axis=0)
                eps2 = eps_fn(xin2, jnp.broadcast_to(t, (2,)), ctx2, NO_CONTROL)
                eps_src_base = cfg_pair(eps2[0:1], eps2[1:2], cfg.cfg_src)
            if derive_zs:
                # inversion residual on the fly (see docstring)
                eps_orig = jnp.where(i == 0, eps_src_base, eps_orig_c)
                mu = schedule.reverse_step(
                    eps_orig, t, x_orig_t, eta=cfg.eta,
                    is_ddim_inversion=cfg.is_ddim_inversion,
                )
                denom = cfg.eta if cfg.is_ddim_inversion \
                    else cfg.eta * jnp.sqrt(schedule.variance(t))
                z = (x_prev_orig_t - mu) / denom
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
                eps4 = eps_fn(xin4, jnp.broadcast_to(t, (4,)), ctx4, NO_CONTROL)
                eps_src_orig = cfg_pair(eps4[0:2], eps4[2:4], cfg.cfg_src)
            x_prev_pair = schedule.reverse_step(
                eps_src_orig, t, pair, eta=cfg.eta, variance_noise=z,
                is_ddim_inversion=cfg.is_ddim_inversion,
            )
            x_prev_orig, x_prev_base = x_prev_pair[0:1], x_prev_pair[1:2]

        coeff = schedule.h_edit_coeff(
            t, tt, cfg.eta, is_ddim_inversion=cfg.is_ddim_inversion
        )

        def controlled_call(x_base_row, x_edit_row, t_eval, save):
            """-> (uncond_out_tar, cond_out_src, cond_out_tar,
                   cond_src_at_base, store)."""
            ctrl = dataclasses.replace(control, step=i, save_attn=save,
                                       cond_start=2)
            xin4 = jnp.concatenate(
                [x_edit_row, x_edit_row, x_base_row, x_edit_row], axis=0)
            out = eps_fn(xin4, jnp.broadcast_to(t_eval, (4,)), ctx4c, ctrl)
            if save:
                eps4c, aux = out
                store = flatten_attn_store(aux)
            else:
                eps4c, store = out, {}
            return eps4c[0:1], eps4c[1:2], eps4c[3:4], eps4c[2:3], store

        eps_orig_next = eps_orig_c
        if not cfg.implicit:
            # ---- explicit (:475-514): correction at (x_t, t) ------------- #
            uncond_out_tar, cond_out_src, cond_out_tar, _, store = controlled_call(
                x_orig, x_edit, t, True
            )
            eps_src_edit = cfg_pair(uncond_out_tar, cond_out_src, cfg.cfg_src_edit)
            eps_tar = cfg_pair(uncond_out_tar, cond_out_tar, cfg.cfg_tar)
            x_opt = x_prev_base + coeff * (eps_tar - eps_src_edit)
            if not no_blend:
                lb = accumulate_store(lb, store)
        else:
            # ---- implicit (:631-692): optimize x_{t-1} at tt ------------- #
            x_opt = x_prev_base
            K = cfg.optimization_steps
            for k in range(K):
                save = k == K - 1
                uncond_out_tar, cond_out_src, cond_out_tar, eps_orig_next, store = (
                    controlled_call(x_prev_orig, x_opt, tt, save)
                )
                # the eps carry must keep the carry dtype (f32) even when the
                # UNet computes in bf16, or lax.scan rejects the body
                eps_orig_next = eps_orig_next.astype(eps_orig_c.dtype)
                eps_src_edit = cfg_pair(uncond_out_tar, cond_out_src, cfg.cfg_src_edit)
                eps_tar = cfg_pair(uncond_out_tar, cond_out_tar, cfg.cfg_tar)
                correction = eps_tar - eps_src_edit
                if k > 0:
                    g = _l1_grad(x_opt, x_prev_base)
                    rho = _rms(correction) / (_rms(g) + 1e-8) * cfg.weight_reconstruction
                    rec_term = x_opt - rho * g
                else:
                    rec_term = x_opt
                x_opt = rec_term + coeff * correction
                if style_fn is not None:
                    # style reward step after the text update
                    # (text-guided-n-style/inversion/h_edit.py:160-182)
                    x_opt = style_fn(x_opt, eps_tar, tt, correction)
                if save and not no_blend:
                    lb = accumulate_store(lb, store)

        # ---- 3. LocalBlend step callback (:698-699) ----------------------- #
        pair_out = jnp.concatenate([x_prev_orig, x_opt], axis=0)
        if not no_blend:
            pair_out = apply_local_blend(lb, pair_out, i)
        x_prev_orig, x_opt = pair_out[0:1], pair_out[1:2]

        return (x_prev_orig, x_opt, lb, eps_orig_next), None

    # ONE scan, 2 UNet instantiations.  No control-window segmentation is
    # needed: every P2P edit rides the fused attention path with dynamic
    # step gates that are exact identities outside their windows (the
    # map_qkv q/k row-select and the linear-v cross rewrite — see
    # control/p2p.py); only the res-16 store layers materialize
    # probabilities, and LocalBlend reads those every step anyway.
    xs_all = (steps, grid.ts, grid.tts, grid.zs, x_orig_seq, x_prev_seq)
    carry = (xT, xT, local_blend, jnp.zeros_like(xT))
    carry, _ = jax.lax.scan(
        lambda c, x: body_impl(control, c, x), carry, xs_all,
    )
    x_orig, x_edit = carry[0], carry[1]
    return x_edit, x_orig
