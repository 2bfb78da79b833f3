"""Plug-and-Play editing driver — CLI parity with
``text-guided/main_plugnplay.py`` (SD-1.5 backbone, :113).

Modes: h_edit_R_pnp, h_edit_D_pnp, ef_pnp, pnp_inv_w_pnp, nt_pnp, np_pnp,
nmg_pnp (:64).  Injection fractions --pnp_f_t 0.45 --pnp_attn_t 0.35
(:84-85) convert to step-index gates (:189-194).
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
    add_data_parallel_arg,
    add_resume_arg,
    build_pipeline,
    encode_prompts,
    resume_skip,
    run_data_parallel_ctrl,
)

MODES = ["h_edit_R_pnp", "h_edit_D_pnp", "ef_pnp", "pnp_inv_w_pnp", "nt_pnp",
         "np_pnp", "nmg_pnp"]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="h-edit-tpu PnP editing")
    p.add_argument("--mode", type=str, default="h_edit_R_pnp", choices=MODES)
    p.add_argument("--data_path", type=str, default="data")
    p.add_argument("--output_path", type=str, default="results")
    p.add_argument("--mapping_file", type=str, default=None)
    p.add_argument("--image", type=str, default=None)
    p.add_argument("--source_prompt", type=str, default=None)
    p.add_argument("--target_prompt", type=str, default=None)
    p.add_argument("--edit_category_list", nargs="+", type=str,
                   default=["0", "1", "2", "3", "4", "5", "6", "7", "8", "9"])
    p.add_argument("--num_diffusion_steps", type=int, default=50)
    p.add_argument("--skip", type=int, default=0)
    p.add_argument("--eta", type=float, default=1.0)
    p.add_argument("--cfg_src", type=float, default=1.0)
    p.add_argument("--cfg_src_edit", type=float, default=5.0)
    p.add_argument("--cfg_tar", type=float, default=7.5)
    p.add_argument("--optimization_steps", type=int, default=1)
    p.add_argument("--pnp_f_t", type=float, default=0.45)
    p.add_argument("--pnp_attn_t", type=float, default=0.35)
    p.add_argument("--step_chunk", type=int, default=10)
    add_resume_arg(p)
    add_data_parallel_arg(p)
    add_common_model_args(p)
    return p.parse_args(argv)


def main(argv=None):
    from hedit_tpu.control.pnp import pnp_step_gates
    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.edit.h_edit_ctrl import h_edit_pnp
    from hedit_tpu.edit.pnp_baselines import (
        ef_or_pnp_inv_w_pnp, negative_prompt_pnp, nmg_pnp_loop, null_text_pnp,
    )
    from hedit_tpu.invert.ddim import invert_ddim
    from hedit_tpu.invert.ddpm import invert_ddpm
    from hedit_tpu.io_utils.images import dataset_from_json, load_image, to_pil

    args = parse_args(argv)
    is_ddim = args.eta == 0 or args.mode in (
        "h_edit_D_pnp", "pnp_inv_w_pnp", "nt_pnp", "np_pnp", "nmg_pnp"
    )
    pipe = build_pipeline(args, args.num_diffusion_steps,
                          steps_offset=0 if is_ddim else 1)
    sched = pipe.schedule
    N = args.num_diffusion_steps - args.skip
    qk_mask, conv_mask = pnp_step_gates(N, args.pnp_attn_t, args.pnp_f_t)

    samples = []
    if args.image:
        samples.append(("single", {
            "image_path": args.image,
            "original_prompt": args.source_prompt or "",
            "editing_prompt": args.target_prompt or "",
        }))
    else:
        mapping = args.mapping_file or os.path.join(args.data_path, "mapping_file.json")
        for key, item in dataset_from_json(mapping).items():
            if item.get("editing_type_id", "0") in args.edit_category_list:
                item = dict(item)
                if not os.path.isabs(item["image_path"]):
                    item["image_path"] = os.path.join(
                        args.data_path, "annotation_images", item["image_path"])
                samples.append((key, item))

    out_dir = os.path.join(
        args.output_path,
        f"{args.mode}_steps_{args.num_diffusion_steps}_skip_{args.skip}"
        f"_ft_{args.pnp_f_t}_attnt_{args.pnp_attn_t}",
    )
    os.makedirs(out_dir, exist_ok=True)

    # EF/PnP-Inv + PnP: the pair's source row doubles as the inversion
    # evaluation (edit/pnp_baselines.py derive_zs) -> skip phase-2
    derive_base = (args.mode in ("ef_pnp", "pnp_inv_w_pnp")
                   and (args.cfg_src == 1.0 or is_ddim)
                   and (args.eta > 0 or is_ddim))
    eta = 1.0 if is_ddim else args.eta

    if args.data_parallel > 0:
        cfg = HEditConfig(cfg_src=args.cfg_src, cfg_src_edit=args.cfg_src_edit,
                          cfg_tar=args.cfg_tar, eta=eta,
                          is_ddim_inversion=is_ddim,
                          optimization_steps=args.optimization_steps)

        def edit_one(eps_plain, eps_ctrl, xT, zs, xts, uncond, src, tar):
            if args.mode in ("h_edit_R_pnp", "h_edit_D_pnp"):
                edited, _ = h_edit_pnp(
                    eps_ctrl, sched, xT, zs, uncond_ctx=uncond, src_ctx=src,
                    tar_ctx=tar, cfg=cfg, after_skip_steps=N,
                    qk_mask=qk_mask, conv_mask=conv_mask, xts=xts,
                )
            elif args.mode in ("ef_pnp", "pnp_inv_w_pnp"):
                edited, _ = ef_or_pnp_inv_w_pnp(
                    eps_ctrl, sched, xT, zs, uncond_ctx=uncond, src_ctx=src,
                    tar_ctx=tar, cfg_src=args.cfg_src, cfg_tar=args.cfg_tar,
                    eta=eta, is_ddim_inversion=is_ddim, after_skip_steps=N,
                    qk_mask=qk_mask, conv_mask=conv_mask, xts=xts,
                    derive_zs=derive_base,
                )
            elif args.mode == "nmg_pnp":
                edited, _ = nmg_pnp_loop(
                    eps_ctrl, sched, xT, xts, zs, uncond_ctx=uncond,
                    src_ctx=src, tar_ctx=tar, cfg_tar=args.cfg_tar,
                    after_skip_steps=N, qk_mask=qk_mask, conv_mask=conv_mask,
                )
            elif args.mode == "nt_pnp":
                edited, _ = null_text_pnp(
                    eps_ctrl, sched, xT, xts, zs, uncond_ctx=uncond,
                    src_ctx=src, tar_ctx=tar, cfg_tar=args.cfg_tar,
                    after_skip_steps=N, qk_mask=qk_mask, conv_mask=conv_mask,
                )
            elif args.mode == "np_pnp":
                edited, _ = negative_prompt_pnp(
                    eps_ctrl, sched, xT, zs, uncond_ctx=uncond, src_ctx=src,
                    tar_ctx=tar, cfg_tar=args.cfg_tar, after_skip_steps=N,
                    qk_mask=qk_mask, conv_mask=conv_mask,
                )
            else:
                raise NotImplementedError(args.mode)
            return edited

        return run_data_parallel_ctrl(args, pipe, samples, out_dir, edit_one,
                                      is_ddim=is_ddim, skip_zs=derive_base)

    for key, item in samples:
        out = os.path.join(out_dir,
                           os.path.basename(item["image_path"]).rsplit(".", 1)[0] + ".png")
        if resume_skip(args, out, key):
            continue
        src_prompt = item["original_prompt"].replace("[", "").replace("]", "")
        tar_prompt = item["editing_prompt"].replace("[", "").replace("]", "")
        img_size = 512 if not args.tiny else pipe.vae.cfg.sample_size
        x0_img = jnp.asarray(load_image(item["image_path"], size=img_size))
        w0 = pipe.vae_encode(x0_img)
        embeds = encode_prompts(pipe, ["", src_prompt, tar_prompt], args.tiny)
        uncond, src_ctx, tar_ctx = embeds[0:1], embeds[1:2], embeds[2:3]
        eps_plain = lambda x, t, c: pipe.unet_eps(x, t, c)  # noqa: E731
        eps_ctrl = lambda x, t, c, ctrl: pipe.unet_eps(x, t, c, ctrl)  # noqa: E731

        if is_ddim:
            inv = invert_ddim(eps_plain, sched, w0, uncond_ctx=uncond,
                              src_ctx=src_ctx, cfg_scale=args.cfg_src,
                              step_chunk=args.step_chunk,
                              skip_zs=derive_base)
        else:
            inv = invert_ddpm(eps_plain, sched, w0, uncond_ctx=uncond,
                              src_ctx=src_ctx, cfg_scale_src=args.cfg_src,
                              eta=args.eta, rng=jax.random.PRNGKey(0),
                              step_chunk=args.step_chunk,
                              skip_zs=derive_base)
        xT = inv.xts[N][None]

        cfg = HEditConfig(cfg_src=args.cfg_src, cfg_src_edit=args.cfg_src_edit,
                          cfg_tar=args.cfg_tar, eta=eta,
                          is_ddim_inversion=is_ddim,
                          optimization_steps=args.optimization_steps)

        if args.mode in ("h_edit_R_pnp", "h_edit_D_pnp"):
            edited, _ = h_edit_pnp(
                eps_ctrl, sched, xT, inv.zs, uncond_ctx=uncond, src_ctx=src_ctx,
                tar_ctx=tar_ctx, cfg=cfg, after_skip_steps=N,
                qk_mask=qk_mask, conv_mask=conv_mask, xts=inv.xts[: N + 1],
            )
        elif args.mode in ("ef_pnp", "pnp_inv_w_pnp"):
            edited, _ = ef_or_pnp_inv_w_pnp(
                eps_ctrl, sched, xT, inv.zs, uncond_ctx=uncond, src_ctx=src_ctx,
                tar_ctx=tar_ctx, cfg_src=args.cfg_src, cfg_tar=args.cfg_tar,
                eta=eta, is_ddim_inversion=is_ddim, after_skip_steps=N,
                qk_mask=qk_mask, conv_mask=conv_mask,
                xts=inv.xts[: N + 1],  # indexed source: 4 -> 3 rows/step
                derive_zs=derive_base,  # inversion-free when conditions hold
            )
        elif args.mode == "nmg_pnp":
            edited, _ = nmg_pnp_loop(
                eps_ctrl, sched, xT, inv.xts[: N + 1], inv.zs,
                uncond_ctx=uncond, src_ctx=src_ctx, tar_ctx=tar_ctx,
                cfg_tar=args.cfg_tar, after_skip_steps=N,
                qk_mask=qk_mask, conv_mask=conv_mask,
            )
        elif args.mode == "nt_pnp":
            edited, _ = null_text_pnp(
                eps_ctrl, sched, xT, inv.xts[: N + 1], inv.zs,
                uncond_ctx=uncond, src_ctx=src_ctx, tar_ctx=tar_ctx,
                cfg_tar=args.cfg_tar, after_skip_steps=N,
                qk_mask=qk_mask, conv_mask=conv_mask,
            )
        elif args.mode == "np_pnp":
            edited, _ = negative_prompt_pnp(
                eps_ctrl, sched, xT, inv.zs, uncond_ctx=uncond, src_ctx=src_ctx,
                tar_ctx=tar_ctx, cfg_tar=args.cfg_tar, after_skip_steps=N,
                qk_mask=qk_mask, conv_mask=conv_mask,
            )
        else:
            raise NotImplementedError(args.mode)

        img = to_pil(np.asarray(pipe.vae_decode(edited)))
        out = os.path.join(out_dir,
                           os.path.basename(item["image_path"]).rsplit(".", 1)[0] + ".png")
        img.save(out)
        print(f"[{key}] saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
