"""MasaCtrl editing driver — CLI parity with ``text-guided/main_masactrl.py``.

Modes: h_edit_D_masactrl, h_edit_R_masactrl, pnp_inv_masactrl, ef_masactrl
(:68).  Conventions: source prompt forced EMPTY (:180, per the PnP-Inv
protocol), --step 4 --layer 10 (:88-89).  The reference's ``args.LAYER``
AttributeError (:198) is fixed here, per SURVEY.md "quirks to NOT replicate".
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

MODES = ["h_edit_D_masactrl", "h_edit_R_masactrl", "pnp_inv_masactrl", "ef_masactrl"]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="h-edit-tpu MasaCtrl editing")
    p.add_argument("--mode", type=str, default="h_edit_R_masactrl", choices=MODES)
    p.add_argument("--data_path", type=str, default="data")
    p.add_argument("--output_path", type=str, default="results")
    p.add_argument("--mapping_file", type=str, default=None)
    p.add_argument("--image", type=str, default=None)
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
    p.add_argument("--step", type=int, default=4, help="MasaCtrl start step")
    p.add_argument("--layer", type=int, default=10, help="MasaCtrl start layer")
    p.add_argument("--step_chunk", type=int, default=10)
    add_resume_arg(p)
    add_data_parallel_arg(p)
    add_common_model_args(p)
    return p.parse_args(argv)


def main(argv=None):
    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.edit.h_edit_ctrl import h_edit_masactrl
    from hedit_tpu.invert.ddim import invert_ddim
    from hedit_tpu.invert.ddpm import invert_ddpm
    from hedit_tpu.io_utils.images import dataset_from_json, load_image, to_pil
    from hedit_tpu.control.masactrl import MasaCtrlControl

    args = parse_args(argv)
    is_ddim = args.eta == 0 or "D" in args.mode or "pnp_inv" in args.mode
    pipe = build_pipeline(args, args.num_diffusion_steps,
                          steps_offset=0 if is_ddim else 1)
    sched = pipe.schedule
    N = args.num_diffusion_steps - args.skip

    samples = []
    if args.image:
        samples.append(("single", {"image_path": args.image,
                                   "editing_prompt": args.target_prompt or ""}))
    else:
        mapping = args.mapping_file or os.path.join(args.data_path, "mapping_file.json")
        for key, item in dataset_from_json(mapping).items():
            if item.get("editing_type_id", "0") in args.edit_category_list:
                item = dict(item)
                if not os.path.isabs(item["image_path"]):
                    item["image_path"] = os.path.join(
                        args.data_path, "annotation_images", item["image_path"])
                samples.append((key, item))

    out_dir = os.path.join(args.output_path,
                           f"{args.mode}_steps_{args.num_diffusion_steps}_skip_{args.skip}")
    os.makedirs(out_dir, exist_ok=True)

    if args.data_parallel > 0:
        cfg = HEditConfig(cfg_src=args.cfg_src, cfg_src_edit=args.cfg_src_edit,
                          cfg_tar=args.cfg_tar, eta=1.0 if is_ddim else args.eta,
                          is_ddim_inversion=is_ddim,
                          optimization_steps=args.optimization_steps)

        def edit_one(eps_plain, eps_ctrl, xT, zs, xts, uncond, src, tar):
            if args.mode in ("h_edit_R_masactrl", "h_edit_D_masactrl"):
                edited, _ = h_edit_masactrl(
                    eps_ctrl, sched, xT, zs, uncond_ctx=uncond, src_ctx=src,
                    tar_ctx=tar, cfg=cfg, after_skip_steps=N,
                    start_step=args.step, start_layer=args.layer, xts=xts,
                )
            else:
                from hedit_tpu.edit.baselines import ef_or_pnp_inv_p2p

                mc = MasaCtrlControl(step=jnp.array(0, jnp.int32),
                                     start_step=args.step,
                                     start_layer=args.layer, num_halves=2)
                edited, _ = ef_or_pnp_inv_p2p(
                    eps_ctrl, sched, xT, zs, uncond_ctx=uncond, src_ctx=src,
                    tar_ctx=tar, cfg_src=args.cfg_src, cfg_tar=args.cfg_tar,
                    eta=1.0 if is_ddim else args.eta,
                    is_ddim_inversion=is_ddim, after_skip_steps=N, control=mc,
                )
            return edited

        # MasaCtrl null-source convention (:180)
        return run_data_parallel_ctrl(args, pipe, samples, out_dir, edit_one,
                                      is_ddim=is_ddim, src_override="")

    for key, item in samples:
        out = os.path.join(out_dir,
                           os.path.basename(item["image_path"]).rsplit(".", 1)[0] + ".png")
        if resume_skip(args, out, key):
            continue
        tar_prompt = item["editing_prompt"].replace("[", "").replace("]", "")
        src_prompt = ""  # MasaCtrl null-source convention (:180)
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
                              step_chunk=args.step_chunk)
            eta = 1.0
        else:
            inv = invert_ddpm(eps_plain, sched, w0, uncond_ctx=uncond,
                              src_ctx=src_ctx, cfg_scale_src=args.cfg_src,
                              eta=args.eta, rng=jax.random.PRNGKey(0),
                              step_chunk=args.step_chunk)
            eta = args.eta
        xT = inv.xts[N][None]

        cfg = HEditConfig(cfg_src=args.cfg_src, cfg_src_edit=args.cfg_src_edit,
                          cfg_tar=args.cfg_tar, eta=eta,
                          is_ddim_inversion=is_ddim,
                          optimization_steps=args.optimization_steps)

        if args.mode in ("h_edit_R_masactrl", "h_edit_D_masactrl"):
            edited, _ = h_edit_masactrl(
                eps_ctrl, sched, xT, inv.zs, uncond_ctx=uncond, src_ctx=src_ctx,
                tar_ctx=tar_ctx, cfg=cfg, after_skip_steps=N,
                start_step=args.step, start_layer=args.layer,
                xts=inv.xts[: N + 1],
            )
        else:
            # ef/pnp_inv + masactrl: pair sampling under the editor
            # (masactrl_baselines.py:15-96)
            from hedit_tpu.edit.baselines import ef_or_pnp_inv_p2p

            mc = MasaCtrlControl(step=jnp.array(0, jnp.int32),
                                 start_step=args.step, start_layer=args.layer,
                                 num_halves=2)
            edited, _ = ef_or_pnp_inv_p2p(
                eps_ctrl, sched, xT, inv.zs, uncond_ctx=uncond, src_ctx=src_ctx,
                tar_ctx=tar_ctx, cfg_src=args.cfg_src, cfg_tar=args.cfg_tar,
                eta=eta, is_ddim_inversion=is_ddim, after_skip_steps=N,
                control=mc,
            )

        img = to_pil(np.asarray(pipe.vae_decode(edited)))
        out = os.path.join(out_dir,
                           os.path.basename(item["image_path"]).rsplit(".", 1)[0] + ".png")
        img.save(out)
        print(f"[{key}] saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
