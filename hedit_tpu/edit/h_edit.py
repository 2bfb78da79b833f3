"""h-Edit sampling loops (no attention control), compiled as single lax.scans.

Semantics parity: ``text-guided/inversion/p2p_h_edit.py`` —
* ``h_Edit_R_explicit``  (:21-156)
* ``h_Edit_R_implicit``  (:162-362) including the step-0 pre-optimization at
  ``time_ahead`` when skip > 0 (:216-267) and the L1-reconstruction pull with
  RMS-normalized step size for opt_step > 0 (:328-344).

TPU re-design — fused CFG batch layout
--------------------------------------
The reference issues, per timestep, a batch-2 UNet call ([x_edit, x_edit] with
[null, src]) for the base step plus a batch-4 call ([x]*4 with
[null, null, src, tar]) for the correction (:88-98, :119-123, :242-245,
:304-315).  Rows 0 and 1 of the batch-4 call are the *same input with the same
null context*, so ``uncond_out_src == uncond_out_tar`` identically; a batch-3
call [null, src, tar] produces the exact same three distinct eps tensors.  The
explicit form needs only ONE batch-3 call per step (base and correction are
evaluated at the same (x_edit, t)).  This halves UNet work with numerics
unchanged; the equivalence is asserted in tests/test_h_edit.py.

The per-step recipe (SURVEY.md §2.3):
  base:        x_{t-1}^base = reverse_step(eps_src(x_edit), t, x, eta, z_t)
  correction:  f = eps_tar - eps_src_edit              (three CFG combos)
  coeff:       full_coeff(t,tt) - sqrt(1-abar_t)*sqrt(abar_tt/abar_t)
  update:      x_{t-1} = rec_term + coeff * f
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.core.schedule import Schedule


@dataclasses.dataclass(frozen=True)
class HEditConfig:
    """Static editing configuration (CLI parity: ``main_p2p.py:49-70``)."""

    cfg_src: float = 1.0        # w^orig      (--cfg_src)
    cfg_src_edit: float = 5.0   # \hat{w}^orig (--cfg_src_edit)
    cfg_tar: float = 7.5        # w^edit      (--cfg_tar)
    eta: float = 1.0
    is_ddim_inversion: bool = False
    optimization_steps: int = 1      # --optimization_steps
    weight_reconstruction: float = 0.1  # --weight_reconstruction
    implicit: bool = True


class StepGrid(NamedTuple):
    """Per-step scan inputs for the after-skip editing loop."""

    ts: jnp.ndarray   # [N] current timesteps (op)
    tts: jnp.ndarray  # [N] next timesteps (op shifted; last = 0)
    zs: jnp.ndarray   # [N, H, W, C] posterior noise, loop order


def make_step_grid(schedule: Schedule, zs: jnp.ndarray, after_skip_steps: int) -> StepGrid:
    """op = timesteps[-N:]; z at loop position i is zs[N-1-i]
    (index algebra of ``p2p_h_edit.py:83-84``)."""
    N = after_skip_steps
    op = schedule.timesteps[-N:]
    tts = jnp.concatenate([op[1:], jnp.zeros((1,), op.dtype)])
    zs_loop = zs[:N][::-1]
    return StepGrid(ts=op, tts=tts, zs=zs_loop)


def traj_inputs(xts, xT, n_steps):
    """(use_xts, x_orig_seq, x_prev_seq) for the stored-trajectory fast path.

    When the inversion xts are supplied, the source branch of an edit loop is
    the stored trajectory itself (reconstruction identity: reverse_step on
    xts[t] with the inversion residual reproduces xts[t-1] exactly), so the
    loop can INDEX the source latents instead of spending UNet rows
    recomputing them.  Accepts [N+1, H, W, C] or [N+1] + xT.shape with
    xts[N] == xT; returns per-step sequences ordered like the step grid.
    """
    if xts is None:
        dummy = jnp.zeros((n_steps,) + xT.shape, xT.dtype)
        return False, dummy, dummy
    assert xts.shape[0] == n_steps + 1, (
        f"xts must hold {n_steps + 1} trajectory points (got {xts.shape[0]})")
    xts = xts.reshape((n_steps + 1,) + xT.shape)
    return True, xts[1:][::-1], xts[:-1][::-1]


def _rms(x):
    return jnp.sqrt(jnp.mean(x * x))


def _l1_grad(x, ref):
    """grad of mean-|x - ref| wrt x — closed form of the reference's autograd
    through F.l1_loss (:331-334); torch's sign convention (sign(0)=0) matches."""
    return jnp.sign(x - ref) / x.size


def h_edit_r(
    eps_fn,
    schedule: Schedule,
    xT: jnp.ndarray,          # [1, H, W, C]
    zs: jnp.ndarray,          # [S, H, W, C] from DDPM inversion
    *,
    uncond_ctx: jnp.ndarray,  # [1, 77, D]
    src_ctx: jnp.ndarray,
    tar_ctx: jnp.ndarray,
    cfg: HEditConfig,
    after_skip_steps: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """h-Edit-R without attention control; explicit or implicit by cfg.implicit.

    Returns (edited_x0_latents, reconstructed_branch) matching the reference's
    ``return xt[1], xt[0]`` (:156, :362 — the second output is the
    along-for-the-ride branch the reference labels "WRONG ... we do not care"
    for h-Edit-R).
    """
    assert not cfg.is_ddim_inversion, "h-Edit-R requires DDPM inversion (:50)"
    N = after_skip_steps
    S = schedule.num_inference_steps
    grid = make_step_grid(schedule, zs, N)
    ctx3 = jnp.concatenate([uncond_ctx, src_ctx, tar_ctx], axis=0)

    def three_eps(x, t):
        """eps at (x, t) under [null, src, tar] -> (eps_uncond, eps_src, eps_tar)."""
        xin = jnp.concatenate([x, x, x], axis=0)
        tin = jnp.broadcast_to(t, (3,))
        eps = eps_fn(xin, tin, ctx3)
        return eps[0:1], eps[1:2], eps[2:3]

    def cfg_combos(e_u, e_s, e_t):
        eps_src_orig = e_u + cfg.cfg_src * (e_s - e_u)
        eps_src_edit = e_u + cfg.cfg_src_edit * (e_s - e_u)
        eps_tar = e_u + cfg.cfg_tar * (e_t - e_u)
        return eps_src_orig, eps_src_edit, eps_tar

    # --- step-0 pre-optimization (implicit only, skip > 0; :238-267) -------- #
    x_edit0 = xT
    if cfg.implicit and N != S:
        time_ahead = schedule.timesteps[-(N + 1)]
        t0 = grid.ts[0]
        # NOTE (:245): the UNet is evaluated at t (the first after-skip step);
        # only the coefficient uses time_ahead.
        e_u, e_s, e_t = three_eps(xT, t0)
        _, eps_src_edit, eps_tar = cfg_combos(e_u, e_s, e_t)
        coeff0 = schedule.h_edit_coeff(
            time_ahead, t0, cfg.eta, is_ddim_inversion=cfg.is_ddim_inversion
        )
        x_edit0 = xT + coeff0 * (eps_tar - eps_src_edit)

    def body(carry, inputs):
        x_orig, x_edit = carry
        t, tt, z = inputs

        e_u, e_s, e_t = three_eps(x_edit, t)
        eps_src_orig, eps_src_edit, eps_tar = cfg_combos(e_u, e_s, e_t)

        # base step applies the x_edit-based eps to BOTH branches (:104-107)
        pair = jnp.concatenate([x_orig, x_edit], axis=0)
        x_prev_pair = schedule.reverse_step(
            eps_src_orig, t, pair, eta=cfg.eta, variance_noise=z,
            is_ddim_inversion=cfg.is_ddim_inversion,
        )
        x_prev_orig, x_prev_base = x_prev_pair[0:1], x_prev_pair[1:2]

        coeff = schedule.h_edit_coeff(
            t, tt, cfg.eta, is_ddim_inversion=cfg.is_ddim_inversion
        )

        if not cfg.implicit:
            # explicit (:130-147): correction from the SAME (x_edit, t) eps
            correction = eps_tar - eps_src_edit
            x_opt = x_prev_base + coeff * correction
        else:
            # implicit (:302-353): optimize on x_{t-1} at time tt
            x_opt = x_prev_base
            for k in range(cfg.optimization_steps):
                e_u2, e_s2, e_t2 = three_eps(x_opt, tt)
                _, eps_src_edit2, eps_tar2 = cfg_combos(e_u2, e_s2, e_t2)
                correction = eps_tar2 - eps_src_edit2
                if k > 0:
                    g = _l1_grad(x_opt, x_prev_base)
                    rho = _rms(correction) / (_rms(g) + 1e-8) * cfg.weight_reconstruction
                    rec_term = x_opt - rho * g
                else:
                    rec_term = x_opt
                x_opt = rec_term + coeff * correction

        return (x_prev_orig, x_opt), None

    (x_orig, x_edit), _ = jax.lax.scan(
        body, (xT, x_edit0), (grid.ts, grid.tts, grid.zs)
    )
    return x_edit, x_orig


def ef_sample(
    eps_fn,
    schedule: Schedule,
    xT: jnp.ndarray,
    zs: jnp.ndarray,
    *,
    uncond_ctx: jnp.ndarray,
    tar_ctx: jnp.ndarray,
    cfg_tar: float,
    eta: float = 1.0,
    after_skip_steps: int,
    is_ddim_inversion: bool = False,
) -> jnp.ndarray:
    """Edit-friendly baseline without P2P: plain CFG sampling on the target
    prompt reusing inverted zs (``p2p_baselines.py:19-95``)."""
    N = after_skip_steps
    grid = make_step_grid(schedule, zs, N)
    ctx2 = jnp.concatenate([uncond_ctx, tar_ctx], axis=0)

    def body(x, inputs):
        t, tt, z = inputs
        xin = jnp.concatenate([x, x], axis=0)
        eps = eps_fn(xin, jnp.broadcast_to(t, (2,)), ctx2)
        eps_cfg = eps[0:1] + cfg_tar * (eps[1:2] - eps[0:1])
        x = schedule.reverse_step(
            eps_cfg, t, x, eta=eta, variance_noise=z,
            is_ddim_inversion=is_ddim_inversion,
        )
        return x, None

    x, _ = jax.lax.scan(body, xT, (grid.ts, grid.tts, grid.zs))
    return x
