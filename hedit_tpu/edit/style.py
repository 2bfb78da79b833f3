"""Combined text + CLIP-style editing (text-guided-n-style workload).

Parity: ``text-guided-n-style/inversion/h_edit.py:14-191`` — the p2p-implicit
h-Edit loop with an extra style step per optimization loop: Tweedie x0 from
the CFG target noise at tt, VAE decode, CLIP Gram residual vs the style
image, Frobenius-norm loss, gradient step on x_{t-1} with an RMS-normalized
step size rho = RMS(correction)/RMS(grad) * weight_edit_clip (:160-182).

Also the EF+style baseline (``text-guided-n-style/inversion/ef.py:14-131``):
pair sampling with the style gradient taken at x_t.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import NO_CONTROL
from hedit_tpu.control.p2p import LocalBlendState, P2PControl
from hedit_tpu.core.schedule import Schedule
from hedit_tpu.edit.h_edit import HEditConfig, _rms, make_step_grid
from hedit_tpu.edit.h_edit_p2p import h_edit_p2p
from hedit_tpu.rewards.clip_style import style_loss


def make_style_step(vae_decode, vision_apply, ref_gram, schedule: Schedule,
                    weight_edit_clip: float, clip_size: int = 224):
    """Returns style_fn(x_opt, eps_tar, tt, correction) for h_edit_p2p."""

    def style_fn(x_opt, eps_tar, tt, correction):
        eps = jax.lax.stop_gradient(eps_tar)

        def obj(x):
            x0 = schedule.tweedie_x0(eps, tt, x)
            img = vae_decode(x0)
            return style_loss(vision_apply, img, ref_gram, size=clip_size)

        g = jax.grad(obj)(x_opt)
        rho = _rms(correction) / (_rms(g) + 1e-12) * weight_edit_clip
        return x_opt - rho * g

    return style_fn


def h_edit_style(
    eps_fn,
    schedule: Schedule,
    xT,
    zs,
    *,
    uncond_ctx,
    src_ctx,
    tar_ctx,
    cfg: HEditConfig,
    after_skip_steps: int,
    control: P2PControl,
    local_blend: Optional[LocalBlendState] = None,
    style_fn=None,
    xts=None,
    derive_zs: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Thin wrapper: p2p-implicit h-Edit + style step.  The style workload
    disables LocalBlend and heuristic eq_params by policy
    (``main_edit.py:178-180``); callers simply pass local_blend=None."""
    return h_edit_p2p(
        eps_fn, schedule, xT, zs, uncond_ctx=uncond_ctx, src_ctx=src_ctx,
        tar_ctx=tar_ctx, cfg=cfg, after_skip_steps=after_skip_steps,
        control=control, local_blend=local_blend, style_fn=style_fn,
        xts=xts, derive_zs=derive_zs,
    )


def ef_style(
    eps_fn,
    schedule: Schedule,
    xT,
    zs,
    *,
    uncond_ctx,
    src_ctx,
    tar_ctx,
    cfg_src: float,
    cfg_tar: float,
    eta: float = 1.0,
    after_skip_steps: int,
    control: Optional[P2PControl] = None,
    vae_decode=None,
    vision_apply=None,
    ref_gram=None,
    weight_edit_clip_for_ef: float = 1.5,
    clip_size: int = 224,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EF + P2P + style (``text-guided-n-style/inversion/ef.py:14-131``).

    Per step: P2P-controlled batch-4 pair step, then a style gradient taken at
    x_t through a FRESH uncontrolled CFG call — the gradient flows through the
    UNet, the Tweedie estimate, the VAE decoder, and the CLIP tower (:93-121);
    rho normalizes by the raw CFG delta's RMS (:120-121); the update applies
    to the already-computed x_{t-1}^edit (:124-125)."""
    N = after_skip_steps
    grid = make_step_grid(schedule, zs, N)
    steps = jnp.arange(N, dtype=jnp.int32)
    ctx4 = jnp.concatenate([uncond_ctx, uncond_ctx, src_ctx, tar_ctx], axis=0)
    ctx2_tar = jnp.concatenate([uncond_ctx, tar_ctx], axis=0)
    with_style = vae_decode is not None and vision_apply is not None

    def body(carry, inputs):
        x_orig, x_edit = carry
        i, t, tt, z = inputs
        pair = jnp.concatenate([x_orig, x_edit], axis=0)
        xin4 = jnp.concatenate([pair, pair], axis=0)
        if control is not None:
            ctrl = dataclasses.replace(control, step=i, save_attn=True, cond_start=2)
            eps4, _ = eps_fn(xin4, jnp.broadcast_to(t, (4,)), ctx4, ctrl)
        else:
            eps4 = eps_fn(xin4, jnp.broadcast_to(t, (4,)), ctx4, NO_CONTROL)
        eps_src = eps4[0:1] + cfg_src * (eps4[2:3] - eps4[0:1])
        eps_tar = eps4[1:2] + cfg_tar * (eps4[3:4] - eps4[1:2])

        x_prev_orig = schedule.reverse_step(
            eps_src, t, x_orig, eta=eta, variance_noise=z,
        )
        x_prev_edit = schedule.reverse_step(
            eps_tar, t, x_edit, eta=eta, variance_noise=z,
        )
        if with_style:
            def obj(x):
                xin2 = jnp.concatenate([x, x], axis=0)
                eps2 = eps_fn(xin2, jnp.broadcast_to(t, (2,)), ctx2_tar, NO_CONTROL)
                u, c = eps2[0:1], eps2[1:2]
                eps_cfg = u + cfg_tar * (c - u)
                x0 = schedule.tweedie_x0(eps_cfg, t, x)
                img = vae_decode(x0)
                return style_loss(vision_apply, img, ref_gram, size=clip_size), c - u

            g, corr = jax.grad(obj, has_aux=True)(x_edit)
            rho = _rms(corr) / (_rms(g) + 1e-12) * weight_edit_clip_for_ef
            x_prev_edit = x_prev_edit - rho * g
        return (x_prev_orig, x_prev_edit), None

    (x_orig, x_edit), _ = jax.lax.scan(body, (xT, xT), (steps, grid.ts, grid.tts, grid.zs))
    return x_edit, x_orig


def make_style_runner(
    unet,
    vae_decode_fn,
    vision_apply,
    schedule: Schedule,
    cfg: HEditConfig,
    *,
    after_skip_steps: int,
    weight_edit_clip: float,
    clip_size: int = 224,
):
    """Hostloop-form style editor: the remote-compile path for
    ``h_edit_R_p2p + style`` (VERDICT r2 #5 — the fused 50-step scan's
    single-jit graph stalled the axon remote-compile service for >9 min in
    round 2; these per-step executables each hold at most one network tower).

    Three executables, dispatched per step like the flagship runner
    (``parallel/sweep.py:make_flagship_runner``):

    * ``base``: single-row source eps (cfg_src == 1 cancellation),
    * ``step``: the batch-4 controlled call + implicit h-Edit posterior math
      (returns x_opt BEFORE the style step, plus eps_tar / correction and the
      controller-source row that seeds the next step's derived inversion
      residual),
    * ``style``: the style VJP — Tweedie x0 -> VAE decode -> CLIP Gram loss,
      gradient wrt x_opt with eps stopped (``h_edit.py:160-182``).  No UNet
      in this graph.

    Numerics match ``h_edit_style`` (the fused scan form) exactly; the
    equivalence is pinned by ``tests/test_style_and_pnp_baselines.py``.

    Returns ``run(unet_params, vae_params_closure..., x0 latent [1,H,W,C],
    ctx4c [4,77,D], control, rng, ref_gram) -> edited [1,H,W,C]``.  Style
    policy disables LocalBlend (``main_edit.py:178-180``), so no store carry.
    ``ref_gram`` (the style image's Gram pyramid) is a jit ARGUMENT, not a
    constructor closure: build the runner ONCE per sweep and reuse its three
    executables across samples — baking each sample's Gram into the HLO as a
    constant would force a fresh style-VJP compile per style image.
    """
    assert cfg.implicit and cfg.cfg_src == 1.0 and cfg.eta > 0 and \
        cfg.optimization_steps == 1, "style runner implements the script config"
    S = after_skip_steps
    from hedit_tpu.invert.ddpm import sample_xts_from_x0

    def base_eps(params, x_edit, t, src_ctx):
        return unet.apply(params, x_edit, jnp.broadcast_to(t, (1,)), src_ctx)

    def step_fn(params, x_edit, eps_src, eps_orig, x_orig_t, x_prev_orig,
                t, tt, i, ctrl, ctx4c):
        mu = schedule.reverse_step(eps_orig, t, x_orig_t, eta=cfg.eta,
                                   variance_noise=jnp.zeros_like(x_orig_t))
        z = (x_prev_orig - mu) / jnp.sqrt(schedule.variance(t))
        x_opt = schedule.reverse_step(eps_src, t, x_edit, eta=cfg.eta,
                                      variance_noise=z)
        ctrl = dataclasses.replace(ctrl, step=i, cond_start=2)
        eps4c = unet.apply(
            params,
            jnp.concatenate([x_opt, x_opt, x_prev_orig, x_opt], axis=0),
            jnp.broadcast_to(tt, (4,)), ctx4c, ctrl,
        )
        coeff = schedule.h_edit_coeff(t, tt, cfg.eta)
        u_tar, cond_src, c_tar = eps4c[0:1], eps4c[1:2], eps4c[3:4]
        eps_se = u_tar + cfg.cfg_src_edit * (cond_src - u_tar)
        eps_ta = u_tar + cfg.cfg_tar * (c_tar - u_tar)
        correction = eps_ta - eps_se
        return x_opt + coeff * correction, eps_ta, correction, eps4c[2:3]

    def style_step(x_opt, eps_tar, tt, correction, ref_gram):
        eps = jax.lax.stop_gradient(eps_tar)

        def obj(x):
            x0 = schedule.tweedie_x0(eps, tt, x)
            img = vae_decode_fn(x0)
            return style_loss(vision_apply, img, ref_gram, size=clip_size)

        g = jax.grad(obj)(x_opt)
        rho = _rms(correction) / (_rms(g) + 1e-12) * weight_edit_clip
        return x_opt - rho * g

    base_jit = jax.jit(base_eps)
    step_jit = jax.jit(step_fn)
    style_jit = jax.jit(style_step)

    # after-skip grid (make_step_grid semantics: op = timesteps[-S:])
    ts_dev = schedule.timesteps[-S:]
    tts_dev = jnp.concatenate([ts_dev[1:], jnp.zeros((1,), ts_dev.dtype)])

    def run(params, x0, ctx4c, control, rng, ref_gram):
        xts, _ = sample_xts_from_x0(schedule, x0, rng)  # [S+1, H, W, C]
        src_ctx = ctx4c[1:2]
        x_edit = xts[S][None]
        eps_orig = None
        for i in range(S):
            x_orig_t = xts[S - i][None]
            x_prev_orig = xts[S - 1 - i][None]
            eps_src = base_jit(params, x_edit, ts_dev[i], src_ctx)
            if eps_orig is None:
                eps_orig = eps_src  # step 0: x_edit == xT == x_orig
            x_opt, eps_tar, corr, eps_orig = step_jit(
                params, x_edit, eps_src, eps_orig, x_orig_t, x_prev_orig,
                ts_dev[i], tts_dev[i], jnp.array(i, jnp.int32), control,
                ctx4c,
            )
            x_edit = style_jit(x_opt, eps_tar, tts_dev[i], corr, ref_gram)
        return x_edit

    run.base_jit, run.step_jit, run.style_jit = base_jit, step_jit, style_jit
    return run
