"""SDE ("edit-friendly") inversion for the pixel-space face DDPM.

Parity: ``face-swapping/inversion/sde_inversion.py:52-158`` — same
edit-friendly structure as the latent DDPM inversion but with the face
model's internal eta=0.5 split:

    c1 = sqrt(1 - abar_{t-1}) * 0.5
    c2 = sqrt(1 - abar_{t-1}) * sqrt(1 - 0.25)
    mu = sqrt(abar_{t-1}) * x0_hat + c2 * eps
    z  = (x_{t-1} - mu) / (eta * c1)

where t-1 is the NEXT timestep in the sequence (0 at the end), NOT t - ratio.
The reference fixes the q-sampling seed to 42 (:22-23); here the caller
passes an explicit PRNG key.  As with the other inversions, the re-anchoring
is the identity, so steps are independent given the pre-sampled xts and are
batched in chunks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hedit_tpu.invert.ddpm import InversionResult, sample_xts_from_x0


def face_step_coeffs(schedule, t, tm1):
    """(c1, c2, sqrt_abar_tm1) of the eta=0.5 split (:140-145)."""
    abar_tm1 = jnp.take(schedule.alphas_cumprod, tm1)
    c1 = jnp.sqrt(1.0 - abar_tm1) * 0.5
    c2 = jnp.sqrt(1.0 - abar_tm1) * jnp.sqrt(1.0 - 0.25)
    return c1, c2, jnp.sqrt(abar_tm1)


def invert_sde(
    eps_fn,
    schedule,
    x0,
    *,
    eta: float = 1.0,
    rng,
    step_chunk: int = 10,
) -> InversionResult:
    """eps_fn(x [B,H,W,C], t [B]) -> eps (unconditional face model)."""
    assert eta > 0
    S = schedule.num_inference_steps
    ts = schedule.timesteps  # descending; loop position i -> ts[i]
    tm1s = jnp.concatenate([ts[1:], jnp.zeros((1,), ts.dtype)])

    xts, noise_added = sample_xts_from_x0(schedule, x0, rng)
    x_in = xts[1:][::-1]     # position i -> xts[S - i]
    x_prev = xts[:-1][::-1]

    n_chunks = -(-S // step_chunk)
    pad = n_chunks * step_chunk - S
    xp = jnp.concatenate([x_in, jnp.zeros((pad,) + x_in.shape[1:], x_in.dtype)], 0) if pad else x_in
    tp = jnp.concatenate([ts, jnp.ones((pad,), ts.dtype)], 0) if pad else ts

    def body(_, inp):
        x_chunk, t_chunk = inp
        return None, eps_fn(x_chunk, t_chunk)

    _, eps_all = jax.lax.scan(
        body, None,
        (xp.reshape(n_chunks, step_chunk, *x_in.shape[1:]),
         tp.reshape(n_chunks, step_chunk)),
    )
    eps_all = eps_all.reshape(n_chunks * step_chunk, *x_in.shape[1:])[:S]

    abar_t = jnp.take(schedule.alphas_cumprod, ts).reshape(S, 1, 1, 1)
    x0_hat = (x_in - jnp.sqrt(1.0 - abar_t) * eps_all) / jnp.sqrt(abar_t)
    c1, c2, sq_abar = face_step_coeffs(schedule, ts, tm1s)
    c1, c2, sq_abar = (c.reshape(S, 1, 1, 1) for c in (c1, c2, sq_abar))
    mu = sq_abar * x0_hat + c2 * eps_all
    z = (x_prev - mu) / (eta * c1)

    return InversionResult(xT=xts[S][None], zs=z[::-1], xts=xts,
                           noise_added=noise_added)
