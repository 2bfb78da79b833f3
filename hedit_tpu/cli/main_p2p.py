"""Text-guided editing driver (P2P family) — CLI parity with
``text-guided/main_p2p.py`` (flags at :32-70, dispatch at :215-258).

Modes: h_edit_R, h_edit_D_p2p, h_edit_R_p2p, ef, ef_p2p, nmg_p2p, pnp_inv_p2p
(the reference's dispatch checks ``mode=='nmg'`` which its own choices list
cannot produce — documented quirk; this driver accepts both spellings).

TPU notes: the per-sample pipeline deep-copy of the reference (:119) does not
exist here — controller state is explicit.  The whole edit (inversion + scan)
runs jitted; one compilation is reused across the dataset (static shapes).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from hedit_tpu.cli.common import (
    add_common_model_args,
    add_resume_arg,
    build_pipeline,
    encode_prompts,
    result_dir_name,
    resume_skip,
)

# Hardcoded PieBench keys for which the Replace controller may be used
# (reference main_p2p.py:179-188)
DDIM_REPLACE_KEYS = {
    "111000000001", "111000000004", "111000000009", "121000000007",
    "122000000006", "121000000000", "121000000001",
}
DDPM_REPLACE_KEYS = {"122000000005", "122000000006", "000000000099", "214000000009"}

MODES = [
    "h_edit_R", "h_edit_D_p2p", "h_edit_R_p2p", "ef", "ef_p2p",
    "nmg", "nmg_p2p", "pnp_inv_p2p",
]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="h-edit-tpu text-guided editing (P2P)")
    p.add_argument("--mode", type=str, default="h_edit_R_p2p", choices=MODES)
    p.add_argument("--device_num", type=int, default=0)
    p.add_argument("--data_path", type=str, default="data")
    p.add_argument("--output_path", type=str, default="results")
    p.add_argument("--mapping_file", type=str, default=None)
    p.add_argument("--image", type=str, default=None, help="single-image mode")
    p.add_argument("--source_prompt", type=str, default=None)
    p.add_argument("--target_prompt", type=str, default=None)
    p.add_argument("--blended_word", type=str, default="")
    p.add_argument("--edit_category_list", nargs="+", type=str,
                   default=["0", "1", "2", "3", "4", "5", "6", "7", "8", "9"])
    p.add_argument("--num_diffusion_steps", type=int, default=50)
    p.add_argument("--skip", type=int, default=0)
    p.add_argument("--eta", type=float, default=1.0)
    p.add_argument("--cfg_src", type=float, default=1.0)
    p.add_argument("--cfg_src_edit", type=float, default=5.0)
    p.add_argument("--cfg_tar", type=float, default=7.5)
    p.add_argument("--implicit", action="store_true")
    p.add_argument("--optimization_steps", type=int, default=1)
    p.add_argument("--weight_reconstruction", type=float, default=0.1)
    p.add_argument("--xa", type=float, default=0.4)
    p.add_argument("--sa", type=float, default=0.35)
    p.add_argument("--step_chunk", type=int, default=10)
    p.add_argument("--save_trajectory", type=str, default=None, metavar="NPZ",
                   help="capture the inversion trajectory (xts/zs/q-noises) "
                        "to an npz for pixel-level replay/parity")
    p.add_argument("--load_trajectory", type=str, default=None, metavar="NPZ",
                   help="inject a captured trajectory instead of sampling "
                        "(accepts this framework's or torch-side NCHW captures)")
    p.add_argument("--data_parallel", type=int, default=0, metavar="B",
                   help="batch B samples per jit call, sharded over the mesh "
                        "'data' axis (ALL seven modes incl. the flagship "
                        "h_edit_R_p2p --implicit; SURVEY.md §5.8). With "
                        "--dist_coordinator the axis spans hosts (DCN)")
    add_resume_arg(p)
    add_common_model_args(p)
    args = p.parse_args(argv)
    # eta asserts (reference :74-77)
    if args.mode in ("h_edit_R", "h_edit_R_p2p", "ef", "ef_p2p"):
        assert args.eta > 0, f"{args.mode} requires eta > 0 (DDPM inversion)"
    if args.mode in ("nmg", "nmg_p2p", "pnp_inv_p2p", "h_edit_D_p2p"):
        assert args.eta == 0, f"{args.mode} requires eta == 0 (DDIM inversion)"
    # A trajectory encodes ONE source image (xts[0] is that image's encoded
    # latent): injecting it into every sample of a dataset sweep would
    # silently edit all of them against the wrong trajectory, and capturing
    # over a sweep would overwrite the npz once per sample keeping the last.
    if args.save_trajectory or args.load_trajectory:
        if args.image is None:
            p.error("--save_trajectory/--load_trajectory encode a single "
                    "source image; use single-image mode (--image ...)")
        if args.data_parallel > 0:
            p.error("trajectory capture/inject is not supported with "
                    "--data_parallel")
    return args


def iter_samples(args):
    if args.image is not None:
        yield "single", {
            "image_path": args.image,
            "original_prompt": args.source_prompt or "",
            "editing_prompt": args.target_prompt or "",
            "blended_word": args.blended_word,
            "editing_type_id": "0",
        }
        return
    from hedit_tpu.io_utils.images import dataset_from_json

    mapping = args.mapping_file or os.path.join(args.data_path, "mapping_file.json")
    for key, item in dataset_from_json(mapping).items():
        if item.get("editing_type_id", "0") not in args.edit_category_list:
            continue
        item = dict(item)
        if not os.path.isabs(item["image_path"]):
            item["image_path"] = os.path.join(
                args.data_path, "annotation_images", item["image_path"]
            )
        yield key, item


def build_sample_controls(args, pipe, key, item, N, cond_start=1,
                          blend_res=None):
    """Per-sample P2P controller + LocalBlend (reference heuristics:
    ``main_p2p.py:179-211``).  Returns (control | None, local_blend | None).

    ``blend_res``: the LocalBlend/store grid side (latent_size // 4); defaults
    to the UNet config's nominal ``sample_size // 4``.  Callers that run at a
    non-nominal image size (the tiny CLI path encodes through the VAE at the
    VAE's own sample_size) must pass the runtime value or the stacked store
    shapes won't match the UNet's actual attention maps."""
    from hedit_tpu.control.p2p import build_p2p_control, init_local_blend

    is_ddim = args.eta == 0
    src_prompt = item["original_prompt"].replace("[", "").replace("]", "")
    tar_prompt = item["editing_prompt"].replace("[", "").replace("]", "")
    blended = item.get("blended_word", "")
    blended = blended.split(" ") if blended else []

    needs_p2p = args.mode.endswith("p2p") or args.mode.startswith("pnp_inv")
    control = local_blend = None
    if needs_p2p and not args.tiny and pipe.tokenizer is not None:
        prompts = [src_prompt, tar_prompt]
        len_eq = len(src_prompt.split(" ")) == len(tar_prompt.split(" "))
        keys = DDIM_REPLACE_KEYS if is_ddim else DDPM_REPLACE_KEYS
        is_replace = (
            len_eq and key in keys
            and args.mode in ("h_edit_D_p2p", "h_edit_R_p2p")
        )
        if args.mode in ("h_edit_R_p2p", "h_edit_D_p2p") and args.optimization_steps > 1:
            eq_val = 1.25
        else:
            eq_val = 2.0
        eq_params = (
            {"words": (blended[1],), "values": (eq_val,)} if len(blended) >= 2 else None
        )
        # the control's blend_px filter compares against LayerTag.num_pixels,
        # which are CONFIG-nominal (models/unet_sd.py:_build_tags computes
        # them from cfg.sample_size) — so it must stay nominal even when the
        # runtime latent is smaller.  Only the LocalBlend store buffer takes
        # the runtime grid (blend_res).
        nominal = pipe.unet.cfg.sample_size // 4
        res = blend_res if blend_res is not None else nominal
        control = build_p2p_control(
            num_steps=N, cross_replace_steps=args.xa, self_replace_steps=args.sa,
            prompts=prompts, tokenizer=pipe.tokenizer, is_replace=is_replace,
            eq_params=eq_params, blend_px=nominal * nominal,
            cond_start=cond_start,
        )
        if len(blended) >= 2:
            local_blend = init_local_blend(
                prompts, ((blended[0],), (blended[1],)), pipe.tokenizer,
                num_steps=N, heads=pipe.unet.cfg.num_heads, res=res,
            )
    elif needs_p2p:
        # tiny/no-tokenizer path: neutral controller (alphas zero)
        from hedit_tpu.parallel.sweep import neutral_control

        nominal = pipe.unet.cfg.sample_size // 4
        control = neutral_control(N, nominal * nominal,
                                  cond_start=cond_start)
    return control, local_blend


def run_sample(args, pipe, key, item):
    from hedit_tpu.control.p2p import build_p2p_control, init_local_blend
    from hedit_tpu.edit.baselines import ef_or_pnp_inv_p2p, nmg_p2p
    from hedit_tpu.edit.h_edit import HEditConfig, ef_sample, h_edit_r
    from hedit_tpu.edit.h_edit_p2p import h_edit_p2p
    from hedit_tpu.invert.ddim import invert_ddim
    from hedit_tpu.invert.ddpm import invert_ddpm
    from hedit_tpu.io_utils.images import load_image, to_pil

    is_ddim = args.eta == 0
    eta = 1.0 if is_ddim else args.eta  # eta=1 post-DDIM (:164-165)
    N = args.num_diffusion_steps - args.skip
    sched = pipe.schedule

    src_prompt = item["original_prompt"].replace("[", "").replace("]", "")
    tar_prompt = item["editing_prompt"].replace("[", "").replace("]", "")
    blended = item.get("blended_word", "")
    blended = blended.split(" ") if blended else []

    img_size = 512 if not args.tiny else pipe.vae.cfg.sample_size
    x0_img = jnp.asarray(load_image(item["image_path"], size=img_size))
    w0 = pipe.vae_encode(x0_img)

    embeds = encode_prompts(pipe, ["", src_prompt, tar_prompt], args.tiny)
    uncond, src_ctx, tar_ctx = embeds[0:1], embeds[1:2], embeds[2:3]

    eps_plain = lambda x, t, c: pipe.unet_eps(x, t, c)  # noqa: E731
    eps_ctrl = lambda x, t, c, ctrl: pipe.unet_eps(x, t, c, ctrl)  # noqa: E731

    # Injected trajectory (pixel-level parity mode): replaces the sampled
    # inversion entirely.  A capture WITH stored zs replays those exact
    # residuals (bit-for-bit vs the capturing run / the torch reference);
    # a capture without zs keeps the derive_zs in-loop rebuild.
    traj = None
    if getattr(args, "load_trajectory", None):
        from hedit_tpu.io_utils.trajectory import load_trajectory

        traj = load_trajectory(args.load_trajectory,
                               expect_steps=args.num_diffusion_steps)
        # Cross-check the capture against THIS image's encoded latent: a
        # trajectory replayed onto a different source image breaks the
        # reconstruction identity and produces silent garbage.
        x0_traj = traj.xts[0]
        x0_here = w0[0] if x0_traj.ndim == w0.ndim - 1 else w0
        if x0_traj.shape == x0_here.shape:
            drift = float(jnp.max(jnp.abs(x0_traj - x0_here)))
            if drift > 0.05:
                print(
                    f"WARNING: injected trajectory xts[0] differs from this "
                    f"image's encoded latent (max|diff|={drift:.3f}); the "
                    f"capture came from a different image or encoder",
                    file=sys.stderr,
                )

    # Inversion-free fast path (h_edit_p2p derive_zs): the edit loop rebuilds
    # the residuals from its own controller-source row, so the DDPM inversion
    # needs no UNet passes at all.
    have_zs = traj is not None and traj.zs is not None
    derive_zs = (args.mode in ("h_edit_R_p2p", "h_edit_D_p2p")
                 and args.implicit and args.cfg_src == 1.0 and eta > 0
                 and not have_zs)
    # EF/PnP-Inv + P2P: the indexed-source row doubles as the inversion
    # evaluation (edit/baselines.py derive_zs) under the same conditions
    derive_base = (args.mode in ("ef_p2p", "pnp_inv_p2p")
                   and (args.cfg_src == 1.0 or is_ddim)
                   and (eta > 0 or is_ddim)
                   and not have_zs)
    derive_zs = derive_zs or derive_base
    if traj is not None and not have_zs and not derive_zs:
        raise ValueError(
            "injected trajectory has no zs and this mode/config cannot "
            "derive them in-loop; re-capture with zs"
        )
    if traj is not None:
        inv = traj
    elif is_ddim:
        inv = invert_ddim(eps_plain, sched, w0, uncond_ctx=uncond, src_ctx=src_ctx,
                          cfg_scale=args.cfg_src, step_chunk=args.step_chunk,
                          skip_zs=derive_zs)  # covers ef/pnp_inv derive_base too
    else:
        inv = invert_ddpm(eps_plain, sched, w0, uncond_ctx=uncond, src_ctx=src_ctx,
                          cfg_scale_src=args.cfg_src, eta=args.eta,
                          rng=jax.random.PRNGKey(args.device_num),
                          step_chunk=args.step_chunk, skip_zs=derive_zs)
    if getattr(args, "save_trajectory", None):
        from hedit_tpu.io_utils.trajectory import save_trajectory

        save_trajectory(args.save_trajectory, inv)
    xT = inv.xts[N][None] if inv.xts.ndim == 4 else inv.xts[N]
    zs = inv.zs

    cfg = HEditConfig(
        cfg_src=args.cfg_src, cfg_src_edit=args.cfg_src_edit, cfg_tar=args.cfg_tar,
        eta=eta, is_ddim_inversion=is_ddim, implicit=args.implicit,
        optimization_steps=args.optimization_steps,
        weight_reconstruction=args.weight_reconstruction,
    )

    control, local_blend = build_sample_controls(args, pipe, key, item, N)

    from hedit_tpu.cli.common import jit_with_params

    if args.mode in ("h_edit_R", "h_edit_D", "h_edit"):
        run = jit_with_params(
            pipe,
            lambda ep, ec, xT, zs, u, s, t: h_edit_r(
                ep, sched, xT, zs, uncond_ctx=u, src_ctx=s, tar_ctx=t,
                cfg=cfg, after_skip_steps=N,
            ),
        )
        edited, _ = run(xT, zs, uncond, src_ctx, tar_ctx)
    elif args.mode in ("h_edit_R_p2p", "h_edit_D_p2p"):
        run = jit_with_params(
            pipe,
            lambda ep, ec, xT, zs, xts, u, s, t, ctl, lb: h_edit_p2p(
                ec, sched, xT, zs, uncond_ctx=u, src_ctx=s, tar_ctx=t,
                cfg=cfg, after_skip_steps=N, control=ctl, local_blend=lb,
                xts=xts, derive_zs=derive_zs,
            ) if lb is not None else h_edit_p2p(
                ec, sched, xT, zs, uncond_ctx=u, src_ctx=s, tar_ctx=t,
                cfg=cfg, after_skip_steps=N, control=ctl, xts=xts,
                derive_zs=derive_zs,
            ),
        )
        edited, _ = run(xT, zs, inv.xts[: N + 1], uncond, src_ctx, tar_ctx,
                        control, local_blend)
    elif args.mode == "ef":
        edited = ef_sample(
            eps_plain, sched, xT, zs, uncond_ctx=uncond, tar_ctx=tar_ctx,
            cfg_tar=args.cfg_tar, eta=eta, after_skip_steps=N,
            is_ddim_inversion=is_ddim,
        )
    elif args.mode in ("ef_p2p", "pnp_inv_p2p"):
        edited, _ = ef_or_pnp_inv_p2p(
            eps_ctrl, sched, xT, zs, uncond_ctx=uncond, src_ctx=src_ctx,
            tar_ctx=tar_ctx, cfg_src=args.cfg_src, cfg_tar=args.cfg_tar,
            eta=eta, is_ddim_inversion=is_ddim, after_skip_steps=N,
            control=control, local_blend=local_blend,
            xts=inv.xts[: N + 1],  # indexed source branch: batch-3 steps
            derive_zs=derive_base,  # inversion-free when conditions hold
        )
    elif args.mode in ("nmg", "nmg_p2p"):
        edited, _ = nmg_p2p(
            eps_ctrl, sched, xT, inv.xts[: N + 1], zs, uncond_ctx=uncond,
            src_ctx=src_ctx, tar_ctx=tar_ctx, cfg_tar=args.cfg_tar,
            after_skip_steps=N, control=control, local_blend=local_blend,
        )
    else:
        raise NotImplementedError(args.mode)

    img = to_pil(np.asarray(pipe.vae_decode(edited)))
    return img


def main(argv=None):
    args = parse_args(argv)
    is_ddim = args.eta == 0
    pipe = build_pipeline(args, args.num_diffusion_steps,
                          steps_offset=0 if is_ddim else 1)

    weight_str = (
        f"eta_{args.eta}_src_orig_{args.cfg_src}_src_edit_{args.cfg_src_edit}"
        f"_tar_scale_{args.cfg_tar}_w_rec_{args.weight_reconstruction}"
        f"_n_opts_{args.optimization_steps}"
    )
    xa_sa = f"xa_{args.xa}_sa{args.sa}" if args.mode.endswith("p2p") else ""
    out_dir = os.path.join(
        args.output_path, result_dir_name(args.mode, args, f"{weight_str}_{xa_sa}")
    )
    os.makedirs(out_dir, exist_ok=True)

    if args.data_parallel > 0:
        return run_data_parallel(args, pipe, out_dir)

    n = 0
    for key, item in iter_samples(args):
        out_path = os.path.join(
            out_dir, os.path.basename(item["image_path"]).rsplit(".", 1)[0] + ".png"
        )
        if resume_skip(args, out_path, key):
            continue
        img = run_sample(args, pipe, key, item)
        img.save(out_path)
        print(f"[{key}] saved {out_path}")
        n += 1
    print(f"done: {n} samples -> {out_dir}")
    return 0



def _sample_out_path(out_dir, item):
    name = item.get("out_name") or (
        os.path.basename(item["image_path"]).rsplit(".", 1)[0])
    return os.path.join(out_dir, name + ".png")


def _dp_mesh(B: int):
    from hedit_tpu.parallel.mesh import dp_mesh

    return dp_mesh(B)


def run_data_parallel(args, pipe, out_dir, samples=None):
    """Sharded PieBench sweep: B samples per jit call over the mesh 'data'
    axis (``hedit_tpu/parallel/sweep.py``; currently the h_edit_R path).
    ``samples``: optional (key, item) iterable overriding ``iter_samples``
    (the demo driver passes its YAML-derived list)."""
    import jax

    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.parallel import dist
    from hedit_tpu.parallel.sweep import edit_batch_fn

    if args.mode in DP_P2P_MODES:
        return run_data_parallel_p2p(args, pipe, out_dir, samples)
    assert args.mode in ("h_edit_R", "ef"), (
        f"--data_parallel supports h_edit_R, ef and {DP_P2P_MODES}"
    )
    B = args.data_parallel
    mesh = _dp_mesh(B)
    sl = dist.owned_slice(mesh, B)
    N = args.num_diffusion_steps - args.skip
    cfg = HEditConfig(
        cfg_src=args.cfg_src, cfg_src_edit=args.cfg_src_edit,
        cfg_tar=args.cfg_tar, eta=args.eta, implicit=args.implicit,
        optimization_steps=args.optimization_steps,
        weight_reconstruction=args.weight_reconstruction,
    )
    fn = jax.jit(edit_batch_fn(
        pipe, cfg, mode=args.mode, after_skip_steps=N,
        cfg_scale_src=args.cfg_src, inv_eta=args.eta,
        step_chunk=args.step_chunk,
    ))
    params = dist.put_replicated(pipe.unet_params, mesh)

    img_size = 512 if not args.tiny else pipe.vae.cfg.sample_size
    batch, batches = [], []
    for key, item in (samples if samples is not None else iter_samples(args)):
        if resume_skip(args, _sample_out_path(out_dir, item), key):
            continue
        batch.append((key, item))
        if len(batch) == B:
            batches.append(batch)
            batch = []
    if batch:
        while len(batch) < B:  # pad the tail batch
            batch.append(batch[-1])
        batches.append(batch)

    from hedit_tpu.io_utils.prefetch import prefetch_map

    total = 0
    with jax.set_mesh(mesh):
        for b, prep in prefetch_map(
                batches,
                lambda b: _prep_dp_batch(args, pipe, b[sl], img_size)):
            total += _consume_dp_batch(args, pipe, fn, params, mesh, sl, b,
                                       prep, out_dir)
    print(f"done (data-parallel): {total} samples -> {out_dir}")
    return 0


DP_P2P_MODES = ("h_edit_R_p2p", "h_edit_D_p2p", "ef_p2p", "pnp_inv_p2p",
                "nmg_p2p", "nmg")


def run_data_parallel_p2p(args, pipe, out_dir, samples=None):
    """Sharded P2P sweep — the flagship production path (VERDICT r2 #2).

    The flagship config (implicit, cfg_src==1, eta>0) runs the hostloop
    batched runner (``parallel/sweep.py:make_flagship_runner`` — the form
    that compiles through the axon remote service and measured fastest on
    chip); other configs take the fused-scan batched editor
    (``edit_batch_p2p_fn`` — the pod path).  Samples are bucketed by the
    controller's static signature (replace vs refine, reweight) so each
    bucket's stacked control pytree has one treedef; each bucket flushes at
    ``B`` samples."""
    import jax

    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.parallel import dist
    from hedit_tpu.parallel.sweep import (
        edit_batch_p2p_fn, make_flagship_runner, neutral_blend,
    )

    B = args.data_parallel
    mesh = _dp_mesh(B)
    sl = dist.owned_slice(mesh, B)
    N = args.num_diffusion_steps - args.skip
    is_ddim = args.eta == 0
    eta = 1.0 if is_ddim else args.eta
    cfg = HEditConfig(
        cfg_src=args.cfg_src, cfg_src_edit=args.cfg_src_edit,
        cfg_tar=args.cfg_tar, eta=eta, is_ddim_inversion=is_ddim,
        implicit=args.implicit,
        optimization_steps=args.optimization_steps,
        weight_reconstruction=args.weight_reconstruction,
    )
    flagship = (
        args.mode in ("h_edit_R_p2p", "h_edit_D_p2p")
        and args.implicit and args.cfg_src == 1.0 and not is_ddim
        and args.optimization_steps == 1
    )
    if flagship:
        fn = make_flagship_runner(pipe.unet, pipe.schedule, cfg,
                                  after_skip_steps=N)
    else:
        fn = jax.jit(edit_batch_p2p_fn(
            pipe, cfg,
            mode="nmg_p2p" if args.mode == "nmg" else args.mode,
            after_skip_steps=N, step_chunk=args.step_chunk,
        ))
    params = dist.put_replicated(pipe.unet_params, mesh)
    heads = pipe.unet.cfg.num_heads

    img_size = 512 if not args.tiny else pipe.vae.cfg.sample_size
    # runtime store/blend grid: the VAE downsamples 8x, the store layers sit
    # two UNet downsamples below the latent (SD: 512 -> 64 -> 16)
    res = img_size // 8 // 4
    cond_start = 2 if flagship else 1
    buckets, batches = {}, []
    for key, item in (samples if samples is not None else iter_samples(args)):
        if resume_skip(args, _sample_out_path(out_dir, item), key):
            continue
        ctrl, lb = build_sample_controls(args, pipe, key, item, N,
                                         cond_start=cond_start,
                                         blend_res=res)
        if ctrl is None:
            # controller-less members of the family (the reference's
            # 'nmg' spelling): identity-edit control, shared batch shape
            from hedit_tpu.parallel.sweep import neutral_control

            nominal = pipe.unet.cfg.sample_size // 4
            ctrl = neutral_control(N, nominal * nominal,
                                   cond_start=cond_start)
        if lb is None:
            lb = neutral_blend(N, heads, res)
        sig = (ctrl.mode, ctrl.use_reweight)
        buckets.setdefault(sig, []).append((key, item, ctrl, lb))
        if len(buckets[sig]) == B:
            batches.append(buckets.pop(sig))
    for sig, batch in buckets.items():
        while len(batch) < B:  # pad the tail batch
            batch.append(batch[-1])
        batches.append(batch)

    from hedit_tpu.io_utils.prefetch import prefetch_map

    total = 0
    with jax.set_mesh(mesh):
        for b, prep in prefetch_map(
                batches,
                lambda b: _prep_dp_batch(args, pipe,
                                         [(k, it) for k, it, _, _ in b[sl]],
                                         img_size)):
            total += _consume_dp_p2p_batch(args, pipe, fn, params, mesh, sl,
                                           b, prep, out_dir, flagship)
    print(f"done (data-parallel p2p): {total} samples -> {out_dir}")
    return 0


def _consume_dp_p2p_batch(args, pipe, fn, params, mesh, sl, batch, prep,
                          out_dir, flagship):
    from hedit_tpu.io_utils.images import to_pil
    from hedit_tpu.parallel import dist
    from hedit_tpu.parallel.sweep import stack_pytrees

    x0s, us, ss, ts = prep
    B = len(batch)
    # control pytrees are built host-side for ALL rows on every process
    # (cheap — token alignment only); each process device-puts its rows
    controls = stack_pytrees([c for _, _, c, _ in batch[sl]])
    blends = stack_pytrees([b for _, _, _, b in batch[sl]])
    put = lambda x: dist.put_batch(x, mesh, B)  # noqa: E731
    controls = dist.put_batch_tree(controls, mesh, B)
    blends = dist.put_batch_tree(blends, mesh, B)
    # Per-sample key == the serial path's key (run_sample, line ~272): one
    # fixed key per sample, NOT a batch-position split — outputs match the
    # serial sweep and are invariant to how --resume re-batches the work.
    rngs = jnp.broadcast_to(jax.random.PRNGKey(args.device_num),
                            (sl.stop - sl.start, 2))
    if flagship:
        ctx4s = put(jnp.stack([us, ss, ss, ts], axis=1))  # [B, 4, 77, D]
        out = fn(params, put(x0s[:, None]), ctx4s, controls,
                 blends, put(rngs))
    else:
        out = fn(params, put(x0s), put(us), put(ss), put(ts),
                 put(rngs), controls, blends)
    seen = set()
    for gi, latent in dist.owned_rows(out):
        if flagship:
            latent = latent[0]  # flagship rows carry a leading length-1 axis
        key, item, _, _ = batch[gi]
        if key in seen:
            continue  # tail padding
        seen.add(key)
        img = to_pil(np.asarray(pipe.vae_decode(latent[None])))
        out_path = _sample_out_path(out_dir, item)
        img.save(out_path)
        print(f"[{key}] saved {out_path}")
    return len(seen)


def _prep_dp_batch(args, pipe, batch, img_size):
    """Host-side batch prep (PIL + VAE/CLIP encode); runs on the prefetch
    worker while the device executes the previous batch."""
    from hedit_tpu.io_utils.images import load_image

    x0s, us, ss, ts = [], [], [], []
    for key, item in batch:
        img = jnp.asarray(load_image(item["image_path"], size=img_size))
        x0s.append(pipe.vae_encode(img)[0])
        src = item["original_prompt"].replace("[", "").replace("]", "")
        tar = item["editing_prompt"].replace("[", "").replace("]", "")
        e = encode_prompts(pipe, ["", src, tar], args.tiny)
        us.append(e[0]); ss.append(e[1]); ts.append(e[2])
    return (jnp.stack(x0s), jnp.stack(us), jnp.stack(ss), jnp.stack(ts))


def _consume_dp_batch(args, pipe, fn, params, mesh, sl, batch, prep, out_dir):
    import jax
    import numpy as np

    from hedit_tpu.io_utils.images import to_pil
    from hedit_tpu.parallel import dist

    x0s, us, ss, ts = prep
    B = len(batch)
    # Serial-path key per sample (resume-invariant; see run_data_parallel_p2p).
    rngs = jnp.broadcast_to(jax.random.PRNGKey(args.device_num),
                            (sl.stop - sl.start, 2))
    put = lambda x: dist.put_batch(x, mesh, B)  # noqa: E731
    out = fn(params, put(x0s), put(us), put(ss), put(ts), put(rngs))
    seen = set()
    for gi, latent in dist.owned_rows(out):
        key, item = batch[gi]
        if key in seen:
            continue  # tail padding
        seen.add(key)
        img = to_pil(np.asarray(pipe.vae_decode(latent[None])))
        out_path = _sample_out_path(out_dir, item)
        img.save(out_path)
        print(f"[{key}] saved {out_path}")
    return len(seen)


if __name__ == "__main__":
    sys.exit(main())
