"""Plain text-to-image sampling (no editing).

Parity: ``text-guided/p2p/ptp_utils.py:text2image_ldm_stable`` (:237-280) —
CFG sampling from Gaussian noise with an optional controller and an optional
restored (xT, zs) trajectory, via `diffusion_step` (:166-180).  The scheduler
step there is plain DDIM (scheduler.step with default eta=0).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import NO_CONTROL
from hedit_tpu.core.schedule import Schedule


def text2image(
    eps_fn,
    schedule: Schedule,
    *,
    uncond_ctx: jnp.ndarray,
    cond_ctx: jnp.ndarray,
    guidance_scale: float = 7.5,
    latent: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    latent_shape: Tuple[int, int, int] = (64, 64, 4),
    eta: float = 0.0,
    zs: Optional[jnp.ndarray] = None,
    control=NO_CONTROL,
) -> jnp.ndarray:
    """CFG sampling over the full schedule; returns final latents [B, H, W, C].

    latent: starting noise [B, H, W, C]; drawn from rng when None.
    zs: optional per-step noises (restored trajectories); else eta=0 DDIM.
    """
    B = cond_ctx.shape[0]
    if latent is None:
        assert rng is not None, "need rng when latent is None"
        latent = jax.random.normal(rng, (1,) + latent_shape)
    x = jnp.broadcast_to(latent, (B,) + latent.shape[1:])
    ctx = jnp.concatenate([uncond_ctx, cond_ctx], axis=0)
    S = schedule.num_inference_steps
    steps = jnp.arange(S, dtype=jnp.int32)
    zs_arr = zs if zs is not None else jnp.zeros((S,) + x.shape[1:], x.dtype)

    def body(x, inputs):
        i, t, z = inputs
        xin = jnp.concatenate([x, x], axis=0)
        ctrl = (
            dataclasses.replace(control, step=i)
            if hasattr(control, "step") else control
        )
        eps = eps_fn(xin, jnp.broadcast_to(t, (2 * B,)), ctx, ctrl)
        if isinstance(eps, tuple):
            eps = eps[0]
        eps_cfg = eps[:B] + guidance_scale * (eps[B:] - eps[:B])
        x = schedule.reverse_step(
            eps_cfg, t, x, eta=eta,
            variance_noise=None if zs is None else z[None],
        )
        return x, None

    x, _ = jax.lax.scan(body, x, (steps, schedule.timesteps, zs_arr))
    return x
