"""DDPM "edit-friendly" (random) inversion — TPU design.

Semantics parity: ``text-guided/inversion/ddpm_inversion.py`` —
(1) draw INDEPENDENT x_t ~ q(x_t|x0) for every inference step
    (``sample_xts_from_x0``, :40-50); this independence is the edit-friendly
    trick and must not be replaced with an ancestral chain;
(2) for each step, CFG eps at x_{t(idx+1)}, posterior mean mu_xt, and the
    normalized residual z = (x_{t-1} - mu) / (eta * sqrt(var)) (:144-158).

TPU re-design: the reference's "re-anchoring" ``xts[idx] = mu + eta*sqrt(var)*z``
(:161-162) is algebraically the identity (z was just solved from that exact
equation), so steps are INDEPENDENT given the pre-sampled xts.  The 2x50
serial UNet calls of the reference therefore become ceil(S/chunk) batched
calls of size 2*chunk — the single biggest inversion speedup on MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class InversionResult(NamedTuple):
    xT: jnp.ndarray        # [1, H, W, C] — starting latent for editing (xts[S])
    zs: jnp.ndarray        # [S, H, W, C] — posterior residuals, zs[S-1] first step
    xts: jnp.ndarray       # [S+1, H, W, C] — xts[0] = x0
    noise_added: jnp.ndarray  # [S+1, H, W, C] — q-sampling noises (diag output)


def sample_xts_from_x0(schedule, x0, rng):
    """Independent q(x_t | x0) draws per inference step (:40-50).

    x0: [1, H, W, C].  Returns (xts [S+1,...], noise [S+1,...]):
    xts[0] = x0, xts[idx] drawn at t = timesteps[S - idx].
    """
    S = schedule.num_inference_steps
    ts = schedule.timesteps  # [S] descending
    abar_t = jnp.take(schedule.alphas_cumprod, ts)  # [S]
    noise = jax.random.normal(rng, (S,) + x0.shape[1:], dtype=x0.dtype)
    # xts index idx corresponds to ts[S - idx]; build in idx order 1..S
    a = jnp.sqrt(abar_t)[::-1].reshape(S, 1, 1, 1)          # idx 1..S
    b = jnp.sqrt(1.0 - abar_t)[::-1].reshape(S, 1, 1, 1)
    xts_body = x0[0][None] * a + noise * b                   # [S, H, W, C]
    xts = jnp.concatenate([x0, xts_body], axis=0)            # [S+1, ...]
    noise_full = jnp.concatenate([jnp.zeros_like(x0), noise], axis=0)
    return xts, noise_full


def invert_ddpm(
    eps_fn,
    schedule,
    x0,
    *,
    uncond_ctx,
    src_ctx=None,
    cfg_scale_src: float = 1.0,
    eta: float = 1.0,
    rng,
    step_chunk: int = 10,
    skip_zs: bool = False,
) -> InversionResult:
    """Edit-friendly inversion (``inversion_forward_process_ddpm``, :54-167).

    eps_fn(x [B,H,W,C], t [B] int32, ctx [B,77,D]) -> eps.
    Steps are batched `step_chunk` at a time (2*chunk rows per UNet call when a
    source prompt is given: uncond half + cond half).

    skip_zs=True: return zs=None and run NO UNet passes — the xts are pure
    q-samples and the residuals are derivable on the fly by edit loops that
    support derive_zs (h_edit_p2p), making the inversion UNet-free.
    """
    assert eta > 0, "edit-friendly inversion requires eta > 0 (reference asserts)"
    S = schedule.num_inference_steps
    ts = schedule.timesteps  # [S] descending; loop idx = S-1 .. 0 maps to ts[i]
    xts, noise_added = sample_xts_from_x0(schedule, x0, rng)
    if skip_zs:
        return InversionResult(xT=xts[S][None], zs=None, xts=xts,
                               noise_added=noise_added)

    # At loop position i (timestep ts[i]): idx = S - i - 1;
    # x_t = xts[idx+1] = xts[S - i], x_{t-1} = xts[idx].
    x_in = xts[1:][::-1]      # [S, H, W, C]: position i -> xts[S-i]
    x_prev = xts[:-1][::-1]   # position i -> xts[S-i-1]

    def chunk_eps(x_chunk, t_chunk):
        n = x_chunk.shape[0]
        if src_ctx is None:
            return eps_fn(x_chunk, t_chunk, jnp.broadcast_to(uncond_ctx, (n,) + uncond_ctx.shape[1:]))
        if cfg_scale_src == 1.0:
            # u + 1.0*(c - u) == c: the uncond half cancels algebraically,
            # halving the inversion's UNet rows (PieBench h-edit config)
            return eps_fn(x_chunk, t_chunk, jnp.broadcast_to(src_ctx, (n,) + src_ctx.shape[1:]))
        both = jnp.concatenate([x_chunk, x_chunk], axis=0)
        t2 = jnp.concatenate([t_chunk, t_chunk], axis=0)
        ctx = jnp.concatenate(
            [
                jnp.broadcast_to(uncond_ctx, (n,) + uncond_ctx.shape[1:]),
                jnp.broadcast_to(src_ctx, (n,) + src_ctx.shape[1:]),
            ],
            axis=0,
        )
        eps = eps_fn(both, t2, ctx)
        unc, cond = jnp.split(eps, 2, axis=0)
        return unc + cfg_scale_src * (cond - unc)

    n_chunks = -(-S // step_chunk)
    pad = n_chunks * step_chunk - S
    x_in_p = jnp.concatenate([x_in, jnp.zeros((pad,) + x_in.shape[1:], x_in.dtype)], 0) if pad else x_in
    ts_p = jnp.concatenate([ts, jnp.ones((pad,), ts.dtype)], 0) if pad else ts

    def body(_, inputs):
        x_chunk, t_chunk = inputs
        return None, chunk_eps(x_chunk, t_chunk)

    _, eps_all = jax.lax.scan(
        body,
        None,
        (
            x_in_p.reshape(n_chunks, step_chunk, *x_in.shape[1:]),
            ts_p.reshape(n_chunks, step_chunk),
        ),
    )
    eps_all = eps_all.reshape(n_chunks * step_chunk, *x_in.shape[1:])[:S]

    # posterior mean + residual, vectorized over all steps
    abar_t = jnp.take(schedule.alphas_cumprod, ts).reshape(S, 1, 1, 1)
    abar_prev = schedule.abar_prev(ts).reshape(S, 1, 1, 1)
    var = schedule.variance(ts).reshape(S, 1, 1, 1)
    pred_x0 = (x_in - jnp.sqrt(1.0 - abar_t) * eps_all) / jnp.sqrt(abar_t)
    direction = jnp.sqrt(1.0 - abar_prev - (eta**2) * var) * eps_all
    mu = jnp.sqrt(abar_prev) * pred_x0 + direction
    z = (x_prev - mu) / (eta * jnp.sqrt(var))

    # zs[idx] with idx = S-1-i  ->  reverse the loop-ordered z
    zs = z[::-1]
    return InversionResult(xT=xts[S][None], zs=zs, xts=xts, noise_added=noise_added)
