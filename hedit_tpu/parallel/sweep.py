"""Data-parallel editing sweep: many images per jit call over the mesh.

The PieBench workload is 700 independent images (SURVEY.md §5.8); the sweep
vmaps the full edit (inversion + h-Edit scan) over a sample batch whose
leading axis is sharded over the mesh's 'data' axis, with UNet params either
replicated or tensor-sharded over 'model'.  One compilation serves the whole
dataset (static shapes).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from hedit_tpu.control.p2p import (
    LocalBlendState,
    P2PControl,
    accumulate_store,
    apply_local_blend,
)
from hedit_tpu.edit.h_edit import HEditConfig, h_edit_r
from hedit_tpu.invert.ddpm import invert_ddpm, sample_xts_from_x0


def edit_batch_fn(
    pipe,
    cfg: HEditConfig,
    *,
    mode: str = "h_edit_R",
    after_skip_steps: int,
    cfg_scale_src: float = 1.0,
    inv_eta: float = 1.0,
    step_chunk: int = 10,
):
    """Returns a jittable fn over batched samples:

    (params, x0 [B,H,W,C], uncond [B,77,D], src [B,77,D], tar [B,77,D],
     rngs [B,2]) -> edited latents [B,H,W,C]

    modes: h_edit_R (DDPM inversion + h-Edit-R) or ef (DDPM inversion +
    plain target-prompt CFG sampling reusing the inverted zs —
    ``p2p_baselines.py:19-95``); both controller-less.
    """
    from hedit_tpu.edit.h_edit import ef_sample

    sched = pipe.schedule
    if mode not in ("h_edit_R", "ef"):
        raise ValueError(f"unsupported batch mode: {mode}")

    def one(params, x0, uncond, src, tar, rng):
        eps_fn = lambda x, t, c: pipe.unet.apply(params, x, t, c)  # noqa: E731
        inv = invert_ddpm(
            eps_fn, sched, x0[None], uncond_ctx=uncond[None], src_ctx=src[None],
            cfg_scale_src=cfg_scale_src, eta=inv_eta, rng=rng,
            step_chunk=step_chunk,
        )
        N = after_skip_steps
        xT = inv.xts[N][None]
        if mode == "ef":
            edited = ef_sample(
                eps_fn, sched, xT, inv.zs, uncond_ctx=uncond[None],
                tar_ctx=tar[None], cfg_tar=cfg.cfg_tar, eta=cfg.eta,
                after_skip_steps=N,
            )
        else:
            edited, _ = h_edit_r(
                eps_fn, sched, xT, inv.zs, uncond_ctx=uncond[None],
                src_ctx=src[None], tar_ctx=tar[None], cfg=cfg,
                after_skip_steps=N,
            )
        return edited[0]

    def batched(params, x0s, unconds, srcs, tars, rngs):
        return jax.vmap(partial(one, params))(x0s, unconds, srcs, tars, rngs)

    return batched


# --------------------------------------------------------------- P2P batch #
# The flagship production job is 700 PieBench images through
# ``h_edit_R_p2p --implicit`` (reference serial loop:
# ``text-guided/main_p2p.py:110-280``).  Per-sample P2P state (time-word
# alphas, mappers, equalizer, LocalBlend word masks) is a pytree of dynamic
# leaves, so a batch is simply those leaves stacked on a leading axis and
# vmapped; the batch axis shards over the mesh 'data' axis.


def stack_pytrees(items: Sequence):
    """Stack a list of identical-structure pytrees leaf-wise (leading axis).

    Static fields (part of the treedef for the registered control
    dataclasses) must match across the batch — callers group samples by
    static signature (controller mode / reweight) before stacking."""
    try:
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *items)
    except ValueError as e:
        raise ValueError(
            "stack_pytrees: mismatched tree structures — static fields "
            "(controller mode / use_reweight / self_replace_until / "
            "cond_start / blend_px) must be identical across a batch; "
            f"group samples by static signature first ({e})"
        ) from e


def neutral_control(num_steps: int, blend_px: int,
                    cond_start: int = 1) -> P2PControl:
    """A P2P control whose every edit is the identity (alphas zero,
    equalizer ones) — used to batch controller-less samples alongside
    controlled ones."""
    MAX_LEN = 77
    return P2PControl(
        step=jnp.zeros((), jnp.int32),
        cross_alpha=jnp.zeros((num_steps + 1, MAX_LEN)),
        refine_mapper=jnp.arange(MAX_LEN),
        refine_alphas=jnp.ones(MAX_LEN),
        replace_mapper=jnp.eye(MAX_LEN),
        equalizer=jnp.ones(MAX_LEN),
        cond_start=cond_start,
        blend_px=blend_px,
    )


def neutral_blend(num_steps: int, heads: int, res: int) -> LocalBlendState:
    """A LocalBlend that never activates (start_blend > num_steps): lets
    no-blend samples ride in the same batch as blended ones."""
    MAX_LEN = 77
    return LocalBlendState(
        alpha_layers=jnp.zeros((2, MAX_LEN), jnp.float32),
        store_sum=jnp.zeros((5, 2, heads, res * res, MAX_LEN), jnp.float32),
        start_blend=num_steps + 2,
        res=res,
    )


def edit_batch_p2p_fn(
    pipe,
    cfg: HEditConfig,
    *,
    mode: str = "h_edit_R_p2p",
    after_skip_steps: int,
    step_chunk: int = 10,
):
    """Scan-form batched P2P editor (the pod / fused-compiler path).

    Returns a jittable fn over batched samples:

        (params, x0 [B,H,W,C], uncond [B,77,D], src [B,77,D], tar [B,77,D],
         rngs [B,2], controls (P2PControl, leaves stacked [B,...]),
         blends (LocalBlendState, leaves stacked [B,...]))
        -> edited latents [B,H,W,C]

    modes: h_edit_R_p2p / h_edit_D_p2p (implicit or explicit by cfg),
    ef_p2p / pnp_inv_p2p, nmg_p2p (DDIM + per-step L1 noise-map-guidance
    gradient on the reconstruction branch — the through-UNet ``jax.grad``
    rides the routed Pallas flash backward).  The same algebraic
    eliminations as the single-sample drivers apply (indexed source branch;
    derive_zs inversion-free stepping when cfg permits).
    """
    from hedit_tpu.edit.baselines import ef_or_pnp_inv_p2p, nmg_p2p
    from hedit_tpu.edit.h_edit_p2p import h_edit_p2p
    from hedit_tpu.invert.ddim import invert_ddim

    sched = pipe.schedule
    N = after_skip_steps
    is_ddim = cfg.is_ddim_inversion
    if mode in ("h_edit_R_p2p", "h_edit_D_p2p"):
        derive = cfg.implicit and cfg.cfg_src == 1.0 and cfg.eta > 0
    elif mode in ("ef_p2p", "pnp_inv_p2p"):
        derive = (cfg.cfg_src == 1.0 or is_ddim) and (cfg.eta > 0 or is_ddim)
    elif mode == "nmg_p2p":
        assert is_ddim, "nmg_p2p requires DDIM inversion (eta == 0)"
        derive = False  # NMG consumes the true inversion residuals
    else:
        raise ValueError(f"unsupported p2p batch mode: {mode}")

    def one(params, x0, uncond, src, tar, rng, ctrl, lb):
        def eps_plain(x, t, c):
            return pipe.unet.apply(params, x, t, c)

        def eps_ctrl(x, t, c, c_obj):
            if getattr(c_obj, "stores_attn", False):
                out, aux = pipe.unet.apply(params, x, t, c, c_obj, True,
                                           mutable=["attn_store"])
                return out, aux["attn_store"]
            return pipe.unet.apply(params, x, t, c, c_obj)

        if is_ddim:
            inv = invert_ddim(
                eps_plain, sched, x0[None], uncond_ctx=uncond[None],
                src_ctx=src[None], cfg_scale=cfg.cfg_src,
                step_chunk=step_chunk, skip_zs=derive,
            )
        else:
            inv = invert_ddpm(
                eps_plain, sched, x0[None], uncond_ctx=uncond[None],
                src_ctx=src[None], cfg_scale_src=cfg.cfg_src, eta=cfg.eta,
                rng=rng, step_chunk=step_chunk, skip_zs=derive,
            )
        xT = inv.xts[N][None] if inv.xts.ndim == 4 else inv.xts[N]
        xts = inv.xts[: N + 1]
        zs = None if derive else inv.zs
        if mode in ("h_edit_R_p2p", "h_edit_D_p2p"):
            edited, _ = h_edit_p2p(
                eps_ctrl, sched, xT, zs, uncond_ctx=uncond[None],
                src_ctx=src[None], tar_ctx=tar[None], cfg=cfg,
                after_skip_steps=N, control=ctrl, local_blend=lb,
                xts=xts, derive_zs=derive,
            )
        elif mode == "nmg_p2p":
            edited, _ = nmg_p2p(
                eps_ctrl, sched, xT, xts, zs, uncond_ctx=uncond[None],
                src_ctx=src[None], tar_ctx=tar[None], cfg_tar=cfg.cfg_tar,
                after_skip_steps=N, control=ctrl, local_blend=lb,
            )
        else:
            edited, _ = ef_or_pnp_inv_p2p(
                eps_ctrl, sched, xT, zs, uncond_ctx=uncond[None],
                src_ctx=src[None], tar_ctx=tar[None], cfg_src=cfg.cfg_src,
                cfg_tar=cfg.cfg_tar, eta=cfg.eta,
                is_ddim_inversion=is_ddim, after_skip_steps=N,
                control=ctrl, local_blend=lb, xts=xts, derive_zs=derive,
            )
        return edited[0]

    def batched(params, x0s, unconds, srcs, tars, rngs, controls, blends):
        return jax.vmap(partial(one, params))(
            x0s, unconds, srcs, tars, rngs, controls, blends
        )

    return batched


def make_flagship_runner(
    unet,
    sched,
    cfg: HEditConfig,
    *,
    after_skip_steps: int,
):
    """Hostloop-form batched flagship executor — the production path for the
    axon remote compiler (which rejects scan-wrapped UNet graphs) AND the
    measured-fastest mode on the single chip (bench round 2: 1.964 s/image
    at batch 4).

    Implements ``h_edit_R_p2p --implicit`` with cfg_src == 1, the indexed
    source branch, and derive_zs inversion-free stepping: per image per step,
    ONE single-row base call + ONE batch-4 controlled call; the controlled
    call's untouched controller-source row doubles as the next step's
    inversion eps (see bench.py provenance / PERF_NOTES round 1-2).

    Returns ``run(params, x0s [B,1,H,W,C], ctx4s [B,4,77,D], controls,
    blends, rng) -> edited [B,1,H,W,C]`` where ctx4s rows are
    [uncond, src, src, tar] per sample, ``controls``/``blends`` are stacked
    pytrees (cond_start is forced to 2 internally).  The two jitted
    executables are created once per runner; pass mesh-sharded inputs to
    shard the batch over 'data'.
    """
    assert cfg.implicit and cfg.cfg_src == 1.0 and cfg.eta > 0, (
        "flagship runner implements the implicit cfg_src==1 eta>0 config; "
        "use edit_batch_p2p_fn for general configs"
    )
    S = after_skip_steps
    from hedit_tpu.edit.h_edit_p2p import flatten_attn_store

    def base_eps(params, x_edit, t, src_ctx):
        # cfg_src == 1.0: u + 1.0*(c-u) == c — single-row base call
        return unet.apply(params, x_edit, jnp.broadcast_to(t, (1,)), src_ctx)

    def step_one(params, x_edit, eps_src, eps_orig, x_orig_t, x_prev_orig,
                 t, tt, i, ctrl, lb, ctx4c):
        mu = sched.reverse_step(eps_orig, t, x_orig_t, eta=cfg.eta,
                                variance_noise=jnp.zeros_like(x_orig_t))
        z = (x_prev_orig - mu) / jnp.sqrt(sched.variance(t))
        x_opt = sched.reverse_step(eps_src, t, x_edit, eta=cfg.eta,
                                   variance_noise=z)
        ctrl = dataclasses.replace(ctrl, step=i, cond_start=2)
        eps4c, aux = unet.apply(
            params,
            jnp.concatenate([x_opt, x_opt, x_prev_orig, x_opt], axis=0),
            jnp.broadcast_to(tt, (4,)), ctx4c, ctrl, True,
            mutable=["attn_store"],
        )
        lb = accumulate_store(lb, flatten_attn_store(aux["attn_store"]))
        coeff = sched.h_edit_coeff(t, tt, cfg.eta)
        u_tar, cond_src, c_tar = eps4c[0:1], eps4c[1:2], eps4c[3:4]
        eps_se = u_tar + cfg.cfg_src_edit * (cond_src - u_tar)
        eps_ta = u_tar + cfg.cfg_tar * (c_tar - u_tar)
        x_opt = x_opt + coeff * (eps_ta - eps_se)
        pair_out = apply_local_blend(
            lb, jnp.concatenate([x_prev_orig, x_opt], axis=0), i)
        # row 2 (controller source, src @ x_prev_orig at tt) IS the next
        # step's inversion eps — P2P's edit_probs writes only cond_start+1
        return pair_out[1:2], eps4c[2:3], lb

    base_v = jax.jit(jax.vmap(base_eps, in_axes=(None, 0, None, 0)))
    step_v = jax.jit(jax.vmap(
        step_one,
        in_axes=(None, 0, 0, 0, 0, 0, None, None, None, 0, 0, 0),
    ))

    # the after-skip grid: op = timesteps[-S:] (make_step_grid semantics) —
    # identical to the full schedule at skip == 0, and xts[S - i] indexes the
    # matching q-sampled trajectory points when S < num_inference_steps
    ts_dev = sched.timesteps[-S:]
    tts_dev = jnp.concatenate([ts_dev[1:], jnp.zeros((1,), ts_dev.dtype)])
    sample_v = jax.jit(jax.vmap(
        lambda x0, k: sample_xts_from_x0(sched, x0, k)[0]))

    def run(params, x0s, ctx4s, controls, blends, rng, dump_hlo=None):
        """x0s: [B, 1, H, W, C] encoded latents.  ``dump_hlo``: optional path
        — writes the optimized HLO of the per-step executable (profiling
        cross-reference; see PERF_NOTES)."""
        B = x0s.shape[0]
        # rng: per-sample keys [B, 2] (pass the SAME serial-path key per row
        # for resume-invariant, serial-identical sweeps — cli/main_p2p.py),
        # or a single key to split by batch position (legacy bench form).
        keys = rng if rng.ndim == 2 else jax.random.split(rng, B)
        xts = sample_v(x0s, keys)  # [B, S+1, H, W, C]
        src_ctx = ctx4s[:, 1:2]
        x_edit = xts[:, S][:, None]
        lb = blends
        eps_orig = None
        for i in range(S):
            x_orig_t = xts[:, S - i][:, None]
            x_prev_orig = xts[:, S - 1 - i][:, None]
            eps_src = base_v(params, x_edit, ts_dev[i], src_ctx)
            if eps_orig is None:
                eps_orig = eps_src  # step 0: x_edit == x_orig == xT
            step_args = (params, x_edit, eps_src, eps_orig, x_orig_t,
                         x_prev_orig, ts_dev[i], tts_dev[i],
                         jnp.array(i, jnp.int32), controls, lb, ctx4s)
            if dump_hlo and i == 0:
                with open(dump_hlo, "w") as f:
                    f.write(step_v.lower(*step_args).compile().as_text())
            x_edit, eps_orig, lb = step_v(*step_args)
        return x_edit

    run.base_v, run.step_v, run.sample_v = base_v, step_v, sample_v
    return run


# -------------------------------------------------------------- face batch #
# The face-swap workload is the same throughput shape as PieBench: the
# reference loops (ref, source) pairs serially (``face-swapping/
# main_edit.py:146``); here the full pipeline (SDE inversion + reward-guided
# h-Edit) vmaps over pairs and the pair axis shards over the mesh 'data'
# axis.  Per-pair state is just arrays (source image, reference ArcFace
# embedding, PRNG key) — no control pytrees needed.


def default_face_losses(pipe):
    """(arc_p, lp_p, src_img [1,H,W,3], ref_embed [1,512]) -> (id_fn, lp_fn)
    — the reference's ID-cosine + LPIPS pair (``main_edit.py:170-171``)."""
    from hedit_tpu.models.arcface import cosine_loss

    def build(arc_p, lp_p, src_img, ref_embed):
        idf = lambda img: cosine_loss(arc_p, pipe.arcface, img, ref_embed)  # noqa: E731
        lpf = lambda img: jnp.mean(pipe.lpips.apply(lp_p, img, src_img))  # noqa: E731
        return idf, lpf

    return build


def face_batch_fn(
    pipe,
    *,
    mode: str = "h_edit_R",
    weight_edit_face: float = 50.0,
    eta: float = 1.0,
    optimization_steps: int = 3,
    after_skip_steps: int,
    step_chunk: int = 10,
    remat: bool = False,
    loss_builder=None,
):
    """Returns a jittable fn over batched (ref, source) pairs:

    (unet_p, arc_p, lp_p, src_imgs [B,H,W,3], ref_embeds [B,512], rngs [B,2])
      -> edited [B,H,W,3]

    ``loss_builder`` defaults to :func:`default_face_losses`; tests inject toy
    losses to keep the equality checks cheap.  All frozen params are
    ARGUMENTS (closing over them bakes weights into the serialized HLO —
    see PERF_NOTES round 3).
    """
    from hedit_tpu.edit.face_swap import ef_face, h_edit_r_face
    from hedit_tpu.invert.sde import invert_sde

    sched = pipe.schedule
    build = loss_builder or default_face_losses(pipe)
    N = after_skip_steps

    def one(unet_p, arc_p, lp_p, src_img, ref_embed, rng):
        eps = lambda x, t: pipe.unet.apply(unet_p, x, t)  # noqa: E731
        inv = invert_sde(eps, sched, src_img[None], eta=eta, rng=rng,
                         step_chunk=step_chunk)
        xT = inv.xts[N][None]
        idf, lpf = build(arc_p, lp_p, src_img[None], ref_embed[None])
        if mode == "h_edit_R":
            out = h_edit_r_face(
                eps, sched, xT, inv.zs, id_loss_fn=idf, lpips_loss_fn=lpf,
                weight_edit_face=weight_edit_face, eta=eta,
                optimization_steps=optimization_steps, after_skip_steps=N,
            )
        else:
            out = ef_face(
                eps, sched, xT, inv.zs, id_loss_fn=idf, lpips_loss_fn=lpf,
                weight_edit_face=weight_edit_face, eta=eta,
                after_skip_steps=N, remat=remat,
            )
        return out[0]

    def batched(unet_p, arc_p, lp_p, src_imgs, ref_embeds, rngs):
        return jax.vmap(partial(one, unet_p, arc_p, lp_p))(
            src_imgs, ref_embeds, rngs)

    return batched


# ----------------------------------------------------- generic ctrl batch #
# MasaCtrl and PnP share the PieBench per-sample skeleton (invert -> edit);
# unlike P2P their control state is identical across samples (static
# start_step/start_layer or step gates), so batching needs no per-sample
# control pytrees — just the (latent, prompt-embedding, rng) arrays.


def ctrl_batch_fn(
    pipe,
    edit_one,
    *,
    is_ddim: bool,
    cfg_scale_src: float = 1.0,
    inv_eta: float = 1.0,
    step_chunk: int = 10,
    after_skip_steps: int,
    skip_zs: bool = False,
):
    """Generic data-parallel wrapper for the MasaCtrl / PnP dataset drivers.

    ``edit_one(eps_plain, eps_ctrl, xT [1,...], zs, xts [N+1,...],
    uncond [1,77,D], src, tar) -> edited [1,...]`` holds the driver's
    mode dispatch; this wrapper owns the per-sample inversion (DDIM or DDPM
    edit-friendly) and the vmap.  Returns a jittable

    (params, x0s [B,H,W,C], unconds [B,77,D], srcs, tars, rngs [B,2])
      -> edited [B,H,W,C]

    with the leading axis sharded over the mesh 'data' axis by the caller.
    """
    from hedit_tpu.invert.ddim import invert_ddim

    sched = pipe.schedule
    N = after_skip_steps

    def one(params, x0, uncond, src, tar, rng):
        eps_plain = lambda x, t, c: pipe.unet.apply(params, x, t, c)  # noqa: E731

        def eps_ctrl(x, t, c, ctrl):
            # MasaCtrl/PnP controls don't store attention, but keep the
            # unet_eps contract for any store-control a driver passes
            if getattr(ctrl, "stores_attn", False):
                out, aux = pipe.unet.apply(params, x, t, c, ctrl, True,
                                           mutable=["attn_store"])
                return out, aux.get("attn_store", {})
            return pipe.unet.apply(params, x, t, c, ctrl)

        if is_ddim:
            inv = invert_ddim(
                eps_plain, sched, x0[None], uncond_ctx=uncond[None],
                src_ctx=src[None], cfg_scale=cfg_scale_src,
                step_chunk=step_chunk, skip_zs=skip_zs,
            )
        else:
            inv = invert_ddpm(
                eps_plain, sched, x0[None], uncond_ctx=uncond[None],
                src_ctx=src[None], cfg_scale_src=cfg_scale_src, eta=inv_eta,
                rng=rng, step_chunk=step_chunk, skip_zs=skip_zs,
            )
        xT = inv.xts[N][None]
        return edit_one(eps_plain, eps_ctrl, xT, inv.zs, inv.xts[: N + 1],
                        uncond[None], src[None], tar[None])[0]

    def batched(params, x0s, unconds, srcs, tars, rngs):
        return jax.vmap(partial(one, params))(x0s, unconds, srcs, tars, rngs)

    return batched


# ------------------------------------------------------------- style batch #


def style_batch_fn(
    pipe,
    vision,
    cfg,
    *,
    mode: str = "h_edit_R_p2p",
    after_skip_steps: int,
    weight_edit_clip: float = 0.5,
    weight_edit_clip_for_ef: float = 1.5,
    clip_size: int = 224,
    step_chunk: int = 10,
):
    """Batched text+style editor: inversion + P2P-controlled h-Edit + CLIP
    Gram style step vmapped over samples (reference serial loop:
    ``text-guided-n-style/main_edit.py:124``).  Per-sample state = the P2P
    control pytree (stacked leaf-wise, grouped by static signature) and the
    style image's Gram matrix [D, D].

    All frozen params (UNet, VAE, CLIP vision) are ARGUMENTS — the style VJP
    flows through the VAE decoder and the vision tower, and closing over
    their weights would bake them into the serialized HLO (PERF_NOTES).

    (params, vae_p, vision_p, x0s [B,h,w,4], unconds [B,77,D], srcs, tars,
     controls (stacked P2PControl), ref_grams [B,D,D], rngs [B,2])
      -> edited latents [B,h,w,4]
    """
    from hedit_tpu.edit.style import ef_style, h_edit_style, make_style_step
    from hedit_tpu.models.vae import AutoencoderKL

    sched = pipe.schedule
    N = after_skip_steps

    def one(params, vae_p, vp, x0, uncond, src, tar, ctrl, ref_g, rng):
        vision_apply = lambda x: vision.apply(vp, x)  # noqa: E731
        vae_dec = lambda z: pipe.vae.apply(  # noqa: E731
            vae_p, z, method=AutoencoderKL.decode)
        eps_plain = lambda x, t, c: pipe.unet.apply(params, x, t, c)  # noqa: E731

        def eps_ctrl(x, t, c, co):
            # pipelines/sd.py:unet_eps with explicit params: store-controls
            # return (eps, attn_store)
            if getattr(co, "stores_attn", False):
                out, aux = pipe.unet.apply(params, x, t, c, co, True,
                                           mutable=["attn_store"])
                return out, aux.get("attn_store", {})
            return pipe.unet.apply(params, x, t, c, co)
        inv = invert_ddpm(
            eps_plain, sched, x0[None], uncond_ctx=uncond[None],
            src_ctx=src[None], cfg_scale_src=cfg.cfg_src, eta=cfg.eta,
            rng=rng, step_chunk=step_chunk,
        )
        xT = inv.xts[N][None]
        if mode == "h_edit_R_p2p":
            style_fn = make_style_step(
                vae_dec, vision_apply, ref_g, sched, weight_edit_clip,
                clip_size=clip_size,
            )
            edited, _ = h_edit_style(
                eps_ctrl, sched, xT, inv.zs, uncond_ctx=uncond[None],
                src_ctx=src[None], tar_ctx=tar[None], cfg=cfg,
                after_skip_steps=N, control=ctrl, local_blend=None,
                style_fn=style_fn,
            )
        else:
            edited, _ = ef_style(
                eps_ctrl, sched, xT, inv.zs, uncond_ctx=uncond[None],
                src_ctx=src[None], tar_ctx=tar[None], cfg_src=cfg.cfg_src,
                cfg_tar=cfg.cfg_tar, eta=cfg.eta, after_skip_steps=N,
                control=ctrl, vae_decode=vae_dec, vision_apply=vision_apply,
                ref_gram=ref_g,
                weight_edit_clip_for_ef=weight_edit_clip_for_ef,
                clip_size=clip_size,
            )
        return edited[0]

    def batched(params, vae_p, vp, x0s, unconds, srcs, tars, controls,
                ref_gs, rngs):
        return jax.vmap(partial(one, params, vae_p, vp))(
            x0s, unconds, srcs, tars, controls, ref_gs, rngs)

    return batched
