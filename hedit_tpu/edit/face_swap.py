"""Face-swapping editing loops: reward-model (ArcFace ID + LPIPS) guidance.

Parity:
* ``face-swapping/inversion/h_edit_R.py:7-137`` — per step: eta=0.5-split
  posterior step to x_{t-1}^base, then K optimization loops; each loop
  computes eps(x_{t-1}^k, t-1) WITHOUT gradient, Tweedie x0, and descends the
  ID cosine loss then (after recomputing eps and x0) the LPIPS loss, both with
  rho = sqrt(abar_{t-1}) * weight (:98-132).  Gradients flow through
  Tweedie -> crop -> pool -> network while eps is held constant
  (stop_gradient), exactly the ``jax.grad(lambda x: loss(tweedie(x,
  stop_grad(eps))))`` form (SURVEY.md §3.3).  The last step (tm1 == 0) skips
  optimization (:90-91).
* ``face-swapping/inversion/ef.py:7-114`` — gradients taken at x_t THROUGH
  the UNet (eps under enable_grad), rho = sqrt(abar_t) * weight (:86-108);
  the reference `break`s at tm1==0 AFTER computing but BEFORE applying the
  final posterior step, returning the penultimate sample — reproduced.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from hedit_tpu.core.schedule import Schedule
from hedit_tpu.invert.sde import face_step_coeffs


def _grid(schedule: Schedule, zs, after_skip_steps: int):
    N = after_skip_steps
    op = schedule.timesteps[-N:]
    tm1s = jnp.concatenate([op[1:], jnp.zeros((1,), op.dtype)])
    return op, tm1s, zs[:N][::-1]


def h_edit_r_face(
    eps_fn,
    schedule: Schedule,
    xT: jnp.ndarray,
    zs: jnp.ndarray,
    *,
    id_loss_fn: Optional[Callable] = None,
    lpips_loss_fn: Optional[Callable] = None,
    weight_edit_face: float = 50.0,
    eta: float = 1.0,
    optimization_steps: int = 3,
    after_skip_steps: int,
    soft_face_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """loss fns map [B, H, W, 3] (x0-prediction, [-1,1]) -> scalar."""
    op, tm1s, zs_loop = _grid(schedule, zs, after_skip_steps)
    steps = jnp.arange(after_skip_steps, dtype=jnp.int32)
    N = after_skip_steps

    def body(xt, inputs):
        i, t, tm1, z = inputs
        eps_t = eps_fn(xt, jnp.broadcast_to(t, (xt.shape[0],)))
        abar_t = jnp.take(schedule.alphas_cumprod, t)
        x0_hat = (xt - jnp.sqrt(1.0 - abar_t) * eps_t) / jnp.sqrt(abar_t)
        c1, c2, sq_abar = face_step_coeffs(schedule, t, tm1)
        x_opt = sq_abar * x0_hat + c2 * eps_t + eta * c1 * z

        abar_tm1 = jnp.take(schedule.alphas_cumprod, tm1)
        rho = jnp.sqrt(abar_tm1) * weight_edit_face
        is_last = i == N - 1  # tm1 == 0: skip optimization (:90-91)

        for _ in range(optimization_steps):
            if id_loss_fn is not None:
                eps_tm1 = jax.lax.stop_gradient(
                    eps_fn(x_opt, jnp.broadcast_to(tm1, (x_opt.shape[0],)))
                )

                def id_obj(x):
                    x0p = (x - jnp.sqrt(1.0 - abar_tm1) * eps_tm1) / jnp.sqrt(abar_tm1)
                    return id_loss_fn(x0p)

                g = jax.grad(id_obj)(x_opt)
                if soft_face_mask is not None:
                    g = g * soft_face_mask
                x_opt = jnp.where(is_last, x_opt, x_opt - rho * g)
            if lpips_loss_fn is not None:
                eps_tm1 = jax.lax.stop_gradient(
                    eps_fn(x_opt, jnp.broadcast_to(tm1, (x_opt.shape[0],)))
                )

                def lp_obj(x):
                    x0p = (x - jnp.sqrt(1.0 - abar_tm1) * eps_tm1) / jnp.sqrt(abar_tm1)
                    return lpips_loss_fn(x0p)

                g = jax.grad(lp_obj)(x_opt)
                x_opt = jnp.where(is_last, x_opt, x_opt - rho * g)

        return x_opt, None

    out, _ = jax.lax.scan(body, xT, (steps, op, tm1s, zs_loop))
    return out


def ef_face(
    eps_fn,
    schedule: Schedule,
    xT: jnp.ndarray,
    zs: jnp.ndarray,
    *,
    id_loss_fn: Optional[Callable] = None,
    lpips_loss_fn: Optional[Callable] = None,
    weight_edit_face: float = 100.0,
    eta: float = 1.0,
    after_skip_steps: int,
    soft_face_mask: Optional[jnp.ndarray] = None,
    remat: bool = False,
) -> jnp.ndarray:
    """remat=True rematerializes the UNet in the through-model VJP
    (``jax.checkpoint``) — trades ~1 extra forward for O(depth) activation
    memory; recommended at the 256x256 pixel resolution on small-HBM parts."""
    op, tm1s, zs_loop = _grid(schedule, zs, after_skip_steps)
    steps = jnp.arange(after_skip_steps, dtype=jnp.int32)
    N = after_skip_steps
    if remat:
        eps_grad_fn = jax.checkpoint(lambda x, t: eps_fn(x, t))
    else:
        eps_grad_fn = eps_fn

    def body(xt, inputs):
        i, t, tm1, z = inputs
        abar_t = jnp.take(schedule.alphas_cumprod, t)
        tb = jnp.broadcast_to(t, (xt.shape[0],))

        eps_t = eps_fn(xt, tb)
        c1, c2, sq_abar = face_step_coeffs(schedule, t, tm1)
        x0_hat = (xt - jnp.sqrt(1.0 - abar_t) * eps_t) / jnp.sqrt(abar_t)
        x_tm1 = sq_abar * x0_hat + c2 * eps_t + eta * c1 * z

        rho = jnp.sqrt(abar_t) * weight_edit_face

        # gradients at x_t THROUGH the UNet (enable_grad in reference, :64-67)
        def x0_of(x):
            e = eps_grad_fn(x, tb)
            return (x - jnp.sqrt(1.0 - abar_t) * e) / jnp.sqrt(abar_t)

        if id_loss_fn is not None:
            g = jax.grad(lambda x: id_loss_fn(x0_of(x)))(xt)
            if soft_face_mask is not None:
                g = g * soft_face_mask
            x_tm1 = x_tm1 - rho * g
        if lpips_loss_fn is not None:
            g = jax.grad(lambda x: lpips_loss_fn(x0_of(x)))(xt)
            x_tm1 = x_tm1 - rho * g

        # reference `break`s before applying the final step (:80-82): the
        # carried sample stays unchanged on the last iteration.
        is_last = i == N - 1
        out = jnp.where(is_last, xt, x_tm1)
        return out, None

    out, _ = jax.lax.scan(body, xT, (steps, op, tm1s, zs_loop))
    return out
