"""DDIM (deterministic) inversion — TPU design.

Semantics parity: ``text-guided/inversion/ddim_inversion.py:55-131``:
phase 1 — forward Euler inversion x0 -> xT with CFG noise (sequential, one
``lax.scan``); phase 2 — recompute per-step UN-normalized residuals
z = x_{t-1} - mu_xt against the phase-1 trajectory and "re-anchor"
(:102-129).  As in the DDPM case the re-anchoring is algebraically the
identity, so phase 2 is independent across steps and is batched in chunks.

The zs from this inversion are consumed downstream with eta=1 and
``is_ddim_inversion=True`` ("to account for u_t^orig",
``main_p2p.py:164-165``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hedit_tpu.invert.ddpm import InversionResult


def invert_ddim(
    eps_fn,
    schedule,
    x0,
    *,
    uncond_ctx,
    src_ctx,
    cfg_scale: float = 1.0,
    step_chunk: int = 10,
    skip_zs: bool = False,
) -> InversionResult:
    """skip_zs=True: run only phase 1 and return zs=None — the residuals are
    derivable on the fly by edit loops that support derive_zs (the phase-2
    eps(latents[t], t) evaluations are exactly the controlled calls'
    controller-source rows)."""
    S = schedule.num_inference_steps
    ts = schedule.timesteps  # descending

    def cfg_eps(x, t):
        n = x.shape[0]
        if cfg_scale == 1.0:
            # u + 1.0*(c-u) == c: skip the uncond half
            t1 = t if t.ndim else jnp.broadcast_to(t, (n,))
            return eps_fn(x, t1,
                          jnp.broadcast_to(src_ctx, (n,) + src_ctx.shape[1:]))
        both = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0) if t.ndim else jnp.broadcast_to(t, (2 * n,))
        ctx = jnp.concatenate(
            [
                jnp.broadcast_to(uncond_ctx, (n,) + uncond_ctx.shape[1:]),
                jnp.broadcast_to(src_ctx, (n,) + src_ctx.shape[1:]),
            ],
            axis=0,
        )
        eps = eps_fn(both, t2, ctx)
        unc, cond = jnp.split(eps, 2, axis=0)
        return unc + cfg_scale * (cond - unc)

    # ---- phase 1: sequential forward inversion (reference :82-86) --------- #
    # iterates timesteps ascending: t = ts[S-1-i]
    ts_asc = ts[::-1]

    def fwd(latent, t):
        eps = cfg_eps(latent, jnp.broadcast_to(t, (1,)))
        nxt = schedule.next_step(eps, t, latent)
        return nxt, nxt

    xT, lat_traj = jax.lax.scan(fwd, x0, ts_asc)
    # latents list parity (:78-88): latents[0]=x0, latents[i+1]=after step i
    latents = jnp.concatenate([x0, lat_traj[:, 0]], axis=0)  # [S+1, H, W, C]

    if skip_zs:
        return InversionResult(xT=xT, zs=None, xts=latents,
                               noise_added=jnp.zeros_like(latents))

    # ---- phase 2: residuals vs the trajectory (reference :102-129) -------- #
    # loop t desc, idx = S - pos(t) - 1: xt = latents[idx+1], xtm1 = latents[idx]
    x_in = latents[1:][::-1]   # position i (t = ts[i]) -> latents[S-i]
    x_prev = latents[:-1][::-1]

    n_chunks = -(-S // step_chunk)
    pad = n_chunks * step_chunk - S
    x_in_p = jnp.concatenate([x_in, jnp.zeros((pad,) + x_in.shape[1:], x_in.dtype)], 0) if pad else x_in
    ts_p = jnp.concatenate([ts, jnp.ones((pad,), ts.dtype)], 0) if pad else ts

    def body(_, inputs):
        x_chunk, t_chunk = inputs
        return None, cfg_eps(x_chunk, t_chunk)

    _, eps_all = jax.lax.scan(
        body,
        None,
        (
            x_in_p.reshape(n_chunks, step_chunk, *x_in.shape[1:]),
            ts_p.reshape(n_chunks, step_chunk),
        ),
    )
    eps_all = eps_all.reshape(n_chunks * step_chunk, *x_in.shape[1:])[:S]

    abar_t = jnp.take(schedule.alphas_cumprod, ts).reshape(S, 1, 1, 1)
    abar_prev = schedule.abar_prev(ts).reshape(S, 1, 1, 1)
    pred_x0 = (x_in - jnp.sqrt(1.0 - abar_t) * eps_all) / jnp.sqrt(abar_t)
    mu = jnp.sqrt(abar_prev) * pred_x0 + jnp.sqrt(1.0 - abar_prev) * eps_all
    z = x_prev - mu  # UN-normalized (DDIM case, :124-125)

    zs = z[::-1]
    return InversionResult(xT=xT, zs=zs, xts=latents, noise_added=jnp.zeros_like(latents))
