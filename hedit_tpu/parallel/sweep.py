"""Data-parallel editing sweep: many images per jit call over the mesh.

The PieBench workload is 700 independent images (SURVEY.md §5.8); the sweep
vmaps the full edit (inversion + h-Edit scan) over a sample batch whose
leading axis is sharded over the mesh's 'data' axis, with UNet params either
replicated or tensor-sharded over 'model'.  One compilation serves the whole
dataset (static shapes).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from hedit_tpu.edit.h_edit import HEditConfig, h_edit_r
from hedit_tpu.invert.ddpm import invert_ddpm


def edit_batch_fn(
    pipe,
    cfg: HEditConfig,
    *,
    after_skip_steps: int,
    cfg_scale_src: float = 1.0,
    inv_eta: float = 1.0,
    step_chunk: int = 10,
):
    """Returns a jittable fn over batched samples:

    (params, x0 [B,H,W,C], uncond [B,77,D], src [B,77,D], tar [B,77,D],
     rngs [B,2]) -> edited latents [B,H,W,C]
    """
    sched = pipe.schedule

    def one(params, x0, uncond, src, tar, rng):
        eps_fn = lambda x, t, c: pipe.unet.apply(params, x, t, c)  # noqa: E731
        inv = invert_ddpm(
            eps_fn, sched, x0[None], uncond_ctx=uncond[None], src_ctx=src[None],
            cfg_scale_src=cfg_scale_src, eta=inv_eta, rng=rng,
            step_chunk=step_chunk,
        )
        N = after_skip_steps
        xT = inv.xts[N][None]
        edited, _ = h_edit_r(
            eps_fn, sched, xT, inv.zs, uncond_ctx=uncond[None], src_ctx=src[None],
            tar_ctx=tar[None], cfg=cfg, after_skip_steps=N,
        )
        return edited[0]

    def batched(params, x0s, unconds, srcs, tars, rngs):
        return jax.vmap(partial(one, params))(x0s, unconds, srcs, tars, rngs)

    return batched
