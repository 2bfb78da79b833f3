"""Combined text + style editing driver — CLI parity with
``text-guided-n-style/main_edit.py`` (SD-1.4 + P2P + CLIP style reward).

Modes: h_edit_R_p2p, ef_p2p (:67).  Asserts eta=1.0, opt_steps=1, implicit
(:73-75).  LocalBlend and heuristic eq_params are explicitly disabled
(:178-180, "significantly impacts combined editing performance").  Prints the
final CLIP Gram loss (:238-240).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from hedit_tpu.cli.common import (
    add_common_model_args, add_data_parallel_arg, add_resume_arg,
    build_pipeline, encode_prompts, resume_skip,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="h-edit-tpu text+style editing")
    p.add_argument("--mode", type=str, default="h_edit_R_p2p",
                   choices=["h_edit_R_p2p", "ef_p2p"])
    p.add_argument("--data_file", type=str, default=None,
                   help="JSON with PieBench-like items + 'style' image path")
    p.add_argument("--dataset", type=str, default=None,
                   help="base dir joined onto the JSON's image_path/style "
                        "entries (reference main_edit.py:41,110,119; defaults "
                        "to the --data_file directory)")
    p.add_argument("--image", type=str, default=None)
    p.add_argument("--source_prompt", type=str, default=None)
    p.add_argument("--target_prompt", type=str, default=None)
    p.add_argument("--style_image", type=str, default=None)
    p.add_argument("--output_path", type=str, default="results")
    p.add_argument("--num_diffusion_steps", type=int, default=50)
    p.add_argument("--skip", type=int, default=0)
    p.add_argument("--eta", type=float, default=1.0)
    p.add_argument("--cfg_src", type=float, default=1.0)
    p.add_argument("--cfg_src_edit", type=float, default=5.0)
    p.add_argument("--cfg_tar", type=float, default=7.5)
    p.add_argument("--implicit", action="store_true", default=True)
    p.add_argument("--optimization_steps", type=int, default=1)
    p.add_argument("--weight_reconstruction", type=float, default=0.1)
    p.add_argument("--weight_edit_clip", type=float, default=0.5)
    p.add_argument("--weight_edit_clip_for_ef", type=float, default=1.5)
    p.add_argument("--xa", type=float, default=0.4)
    p.add_argument("--sa", type=float, default=0.35)
    p.add_argument("--clip_ckpt", type=str, default=os.environ.get("HEDIT_CLIP_CKPT"))
    p.add_argument("--step_chunk", type=int, default=10)
    p.add_argument("--exec_form", type=str, default="scan",
                   choices=["scan", "hostloop"],
                   help="h_edit_R_p2p execution structure: 'scan' = fused "
                        "single-jit (pod path); 'hostloop' = per-step "
                        "executables for remote-compile environments "
                        "(edit/style.py:make_style_runner)")
    add_resume_arg(p)
    add_data_parallel_arg(p)
    add_common_model_args(p)
    args = p.parse_args(argv)
    assert args.eta == 1.0 and args.optimization_steps == 1, (
        "style editing requires eta=1.0 and 1 opt step (main_edit.py:73-75)"
    )
    return args


def main(argv=None):
    from hedit_tpu.control.p2p import P2PControl, build_p2p_control
    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.edit.style import ef_style, h_edit_style, make_style_step
    from hedit_tpu.invert.ddpm import invert_ddpm
    from hedit_tpu.io_utils.images import dataset_from_json, load_image, to_pil
    from hedit_tpu.models.clip_vision import (
        CLIPVisionConfig, CLIPVisionTower, convert_clip_vision,
    )
    from hedit_tpu.rewards.clip_style import reference_gram, style_loss

    args = parse_args(argv)
    pipe = build_pipeline(args, args.num_diffusion_steps)
    sched = pipe.schedule
    N = args.num_diffusion_steps - args.skip

    vcfg = CLIPVisionConfig.tiny() if args.tiny else CLIPVisionConfig.vit_b16()
    vision = CLIPVisionTower(vcfg)
    dummy = jnp.zeros((1, vcfg.input_resolution, vcfg.input_resolution, 3))
    if args.clip_ckpt:
        from hedit_tpu.io_utils.weights import load_torch_state, validate_against

        tmpl = jax.eval_shape(vision.init, jax.random.PRNGKey(0), dummy)
        vp = convert_clip_vision(load_torch_state(args.clip_ckpt))
        validate_against(tmpl, vp, "clip_vision")
        vision_params = jax.tree_util.tree_map(jnp.asarray, vp)
    else:
        vision_params = vision.init(jax.random.PRNGKey(0), dummy)
    vision_apply = lambda x: vision.apply(vision_params, x)  # noqa: E731

    samples = []
    if args.image:
        samples.append({
            "image_path": args.image, "original_prompt": args.source_prompt or "",
            "editing_prompt": args.target_prompt or "",
            "style": args.style_image,
        })
    else:
        data = dataset_from_json(args.data_file)
        items = data.values() if isinstance(data, dict) else data
        # the reference concatenates a base dir onto the JSON's relative
        # paths (``main_edit.py:110,119`` ``args.dataset + item['image_path']``)
        base = args.dataset if args.dataset is not None else (
            os.path.dirname(args.data_file) + os.sep)
        for item in items:
            item = dict(item)
            for k in ("image_path", "style"):
                v = item.get(k)
                if v and not (os.path.isabs(v) and os.path.exists(v)):
                    item[k] = base + v
            samples.append(item)

    def build_control(src_prompt, tar_prompt):
        sample = pipe.unet.cfg.sample_size
        if not args.tiny and pipe.tokenizer is not None:
            return build_p2p_control(
                num_steps=N, cross_replace_steps=args.xa,
                self_replace_steps=args.sa, prompts=[src_prompt, tar_prompt],
                tokenizer=pipe.tokenizer,
                is_replace=len(src_prompt.split()) == len(tar_prompt.split()),
                eq_params=None,  # disabled by policy (:178-180)
                blend_px=(sample // 4) ** 2,
            )
        return P2PControl(
            step=jnp.zeros((), jnp.int32),
            cross_alpha=jnp.zeros((N + 1, 77)),
            refine_mapper=jnp.arange(77), refine_alphas=jnp.ones(77),
            replace_mapper=jnp.eye(77), equalizer=jnp.ones(77),
            blend_px=(sample // 4) ** 2,
        )

    os.makedirs(args.output_path, exist_ok=True)
    if args.data_parallel > 0:
        return run_data_parallel_style(
            args, pipe, samples, vision, vision_params, vcfg, vision_apply,
            build_control)

    _runner_cache = {"style": None}  # built on first hostloop sample
    for item in samples:
        name = os.path.basename(item["image_path"]).rsplit(".", 1)[0]
        out = os.path.join(args.output_path, f"{args.mode}_style_{name}.png")
        if resume_skip(args, out, name):
            continue
        src_prompt = item["original_prompt"].replace("[", "").replace("]", "")
        tar_prompt = item["editing_prompt"].replace("[", "").replace("]", "")
        img_size = 512 if not args.tiny else pipe.vae.cfg.sample_size
        x0_img = jnp.asarray(load_image(item["image_path"], size=img_size))
        w0 = pipe.vae_encode(x0_img)

        # style reference: [0,1] resize-224 normalize (base_clip.py:42-52)
        style_np = (np.asarray(load_image(item["style"],
                                          size=vcfg.input_resolution)) + 1) / 2
        ref_g = reference_gram(vision_apply, jnp.asarray(style_np))

        embeds = encode_prompts(pipe, ["", src_prompt, tar_prompt], args.tiny)
        uncond, src_ctx, tar_ctx = embeds[0:1], embeds[1:2], embeds[2:3]
        eps_plain = lambda x, t, c: pipe.unet_eps(x, t, c)  # noqa: E731
        eps_ctrl = lambda x, t, c, ctrl: pipe.unet_eps(x, t, c, ctrl)  # noqa: E731

        hostloop = (args.mode == "h_edit_R_p2p"
                    and args.exec_form == "hostloop")
        if not hostloop:
            inv = invert_ddpm(eps_plain, sched, w0, uncond_ctx=uncond,
                              src_ctx=src_ctx, cfg_scale_src=args.cfg_src,
                              eta=args.eta, rng=jax.random.PRNGKey(0),
                              step_chunk=args.step_chunk)
            xT = inv.xts[N][None]

        cfg = HEditConfig(
            cfg_src=args.cfg_src, cfg_src_edit=args.cfg_src_edit,
            cfg_tar=args.cfg_tar, eta=args.eta, implicit=True,
            optimization_steps=1,
            weight_reconstruction=args.weight_reconstruction,
        )
        control = build_control(src_prompt, tar_prompt)

        if hostloop:
            # remote-compile path: per-step executables, none of which
            # holds UNet+VAE+CLIP VJPs in one graph (edit/style.py:
            # make_style_runner; scan-equivalence pinned by
            # tests/test_style_and_pnp_baselines.py).  The runner is built
            # ONCE per sweep (ref_gram is a jit argument, not a baked
            # constant) so samples after the first reuse its executables.
            import dataclasses as _dc

            if _runner_cache.get("style") is None:
                from hedit_tpu.edit.style import make_style_runner

                _runner_cache["style"] = make_style_runner(
                    pipe.unet, pipe.vae_decode, vision_apply, sched, cfg,
                    after_skip_steps=N,
                    weight_edit_clip=args.weight_edit_clip,
                    clip_size=vcfg.input_resolution,
                )
            ctx4c = jnp.concatenate([uncond, src_ctx, src_ctx, tar_ctx],
                                    axis=0)
            ctrl2 = _dc.replace(control, cond_start=2)
            edited = _runner_cache["style"](pipe.unet_params, w0, ctx4c,
                                            ctrl2, jax.random.PRNGKey(0),
                                            ref_g)
        elif args.mode == "h_edit_R_p2p":
            style_fn = make_style_step(
                pipe.vae_decode, vision_apply, ref_g, sched,
                args.weight_edit_clip, clip_size=vcfg.input_resolution,
            )
            edited, _ = h_edit_style(
                eps_ctrl, sched, xT, inv.zs, uncond_ctx=uncond, src_ctx=src_ctx,
                tar_ctx=tar_ctx, cfg=cfg, after_skip_steps=N, control=control,
                local_blend=None, style_fn=style_fn,
            )
        else:
            edited, _ = ef_style(
                eps_ctrl, sched, xT, inv.zs, uncond_ctx=uncond, src_ctx=src_ctx,
                tar_ctx=tar_ctx, cfg_src=args.cfg_src, cfg_tar=args.cfg_tar,
                eta=args.eta, after_skip_steps=N, control=control,
                vae_decode=pipe.vae_decode, vision_apply=vision_apply,
                ref_gram=ref_g,
                weight_edit_clip_for_ef=args.weight_edit_clip_for_ef,
                clip_size=vcfg.input_resolution,
            )

        img_arr = pipe.vae_decode(edited)
        final_loss = style_loss(vision_apply, img_arr, ref_g, size=vcfg.input_resolution)
        print(f"CLIP Gram loss: {float(final_loss)}")
        img = to_pil(np.asarray(img_arr))
        name = os.path.basename(item["image_path"]).rsplit(".", 1)[0]
        out = os.path.join(args.output_path, f"{args.mode}_style_{name}.png")
        img.save(out)
        print(f"saved {out}")
    return 0


def run_data_parallel_style(args, pipe, samples, vision, vision_params, vcfg,
                            vision_apply, build_control):
    """Sharded text+style sweep: B samples per jit call over the mesh 'data'
    axis (``parallel/sweep.py:style_batch_fn``).  Samples bucket by the P2P
    control's static signature (replace vs refine) so each stacked control
    pytree has one treedef.  Multi-host aware (``parallel/dist.py``): each
    process encodes and writes only its rows."""
    import dataclasses as _dc

    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.io_utils.images import load_image, to_pil
    from hedit_tpu.parallel import dist
    from hedit_tpu.parallel.mesh import dp_mesh
    from hedit_tpu.parallel.sweep import stack_pytrees, style_batch_fn
    from hedit_tpu.rewards.clip_style import reference_gram, style_loss

    B = args.data_parallel
    mesh = dp_mesh(B)
    sl = dist.owned_slice(mesh, B)
    N = args.num_diffusion_steps - args.skip
    cfg = HEditConfig(
        cfg_src=args.cfg_src, cfg_src_edit=args.cfg_src_edit,
        cfg_tar=args.cfg_tar, eta=args.eta, implicit=True,
        optimization_steps=1,
        weight_reconstruction=args.weight_reconstruction,
    )
    fn = jax.jit(style_batch_fn(
        pipe, vision, cfg, mode=args.mode, after_skip_steps=N,
        weight_edit_clip=args.weight_edit_clip,
        weight_edit_clip_for_ef=args.weight_edit_clip_for_ef,
        clip_size=vcfg.input_resolution, step_chunk=args.step_chunk,
    ))
    params = dist.put_replicated(pipe.unet_params, mesh)
    vae_p = dist.put_replicated(pipe.vae_params, mesh)
    vp = dist.put_replicated(vision_params, mesh)
    img_size = 512 if not args.tiny else pipe.vae.cfg.sample_size

    def prepare(batch):
        """Host-side batch prep (PIL + VAE/CLIP/Gram encode) for THIS
        process's rows; runs on the prefetch worker while the device
        executes the previous batch."""
        x0s, us, ss, ts, gs = [], [], [], [], []
        for item, _ in batch[sl]:
            img = jnp.asarray(load_image(item["image_path"], size=img_size))
            x0s.append(pipe.vae_encode(img)[0])
            style_np = (np.asarray(load_image(
                item["style"], size=vcfg.input_resolution)) + 1) / 2
            gs.append(reference_gram(vision_apply, jnp.asarray(style_np)))
            src = item["original_prompt"].replace("[", "").replace("]", "")
            tar = item["editing_prompt"].replace("[", "").replace("]", "")
            e = encode_prompts(pipe, ["", src, tar], args.tiny)
            us.append(e[0]); ss.append(e[1]); ts.append(e[2])
        return (jnp.stack(x0s), jnp.stack(us), jnp.stack(ss), jnp.stack(ts),
                gs)

    def consume(batch, prep):
        x0s, us, ss, ts, gs = prep
        # Serial-path key per sample (resume-invariant; see cli/common.py).
        rngs = jnp.broadcast_to(jax.random.PRNGKey(0),
                                (sl.stop - sl.start, 2))
        put = lambda x: dist.put_batch(x, mesh, B)  # noqa: E731
        controls = dist.put_batch_tree(
            stack_pytrees([c for _, c in batch[sl]]), mesh, B)
        out = fn(params, vae_p, vp, put(x0s), put(us), put(ss),
                 put(ts), controls, put(jnp.stack(gs)), put(rngs))
        seen = set()
        for gi, latent in dist.owned_rows(out):
            item, _ = batch[gi]
            name = os.path.basename(item["image_path"]).rsplit(".", 1)[0]
            if name in seen:
                continue  # tail padding
            seen.add(name)
            img_arr = pipe.vae_decode(jnp.asarray(latent[None]))
            final_loss = style_loss(vision_apply, img_arr, gs[gi - sl.start],
                                    size=vcfg.input_resolution)
            print(f"CLIP Gram loss: {float(final_loss)}")
            out_path = os.path.join(args.output_path,
                                    f"{args.mode}_style_{name}.png")
            to_pil(np.asarray(img_arr)).save(out_path)
            print(f"saved {out_path}")
        return len(seen)

    buckets, batches = {}, []
    for item in samples:
        name = os.path.basename(item["image_path"]).rsplit(".", 1)[0]
        out_path = os.path.join(args.output_path,
                                f"{args.mode}_style_{name}.png")
        if resume_skip(args, out_path, name):
            continue
        src = item["original_prompt"].replace("[", "").replace("]", "")
        tar = item["editing_prompt"].replace("[", "").replace("]", "")
        ctrl = _dc.replace(build_control(src, tar),
                           step=jnp.zeros((), jnp.int32))
        sig = (ctrl.mode, ctrl.use_reweight)
        buckets.setdefault(sig, []).append((item, ctrl))
        if len(buckets[sig]) == B:
            batches.append(buckets.pop(sig))
    for sig, batch in buckets.items():
        while len(batch) < B:  # pad the tail batch
            batch.append(batch[-1])
        batches.append(batch)

    from hedit_tpu.io_utils.prefetch import prefetch_map

    total = 0
    with jax.set_mesh(mesh):
        for batch, prep in prefetch_map(batches, prepare):
            total += consume(batch, prep)
    print(f"done (data-parallel style): {total} samples -> {args.output_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
