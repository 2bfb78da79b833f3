"""Face-swapping driver — CLI parity with ``face-swapping/main_edit.py``.

Modes: h_edit_R (reward-guided implicit h-Edit) and ef.  Flags (:30-66):
--num_diffusion_steps 100, --eta 1.0 (asserted), --optimization_steps 3,
--weight_edit_face 50.0 (100.0 when optimization_steps == 1, :60),
--post_processing ON by default (the reference exposes it as
``action='store_false'``, :59 — reproduced).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from hedit_tpu.cli.common import force_platform


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="h-edit-tpu face swapping")
    p.add_argument("--mode", type=str, default="h_edit_R", choices=["h_edit_R", "ef"])
    p.add_argument("--data_file", type=str, default=None,
                   help="JSON [{idx, ref, source}] (assets/demo/demo.json layout)")
    p.add_argument("--image_path", type=str, default=None,
                   help="base dir joined onto the JSON's ref/source entries "
                        "(reference main_edit.py:42,148; defaults to the "
                        "--data_file directory)")
    p.add_argument("--ref", type=str, default=None)
    p.add_argument("--source", type=str, default=None)
    p.add_argument("--output_path", type=str, default="results")
    p.add_argument("--num_diffusion_steps", type=int, default=100)
    p.add_argument("--skip", type=int, default=0)
    p.add_argument("--eta", type=float, default=1.0)
    p.add_argument("--optimization_steps", type=int, default=3)
    p.add_argument("--weight_edit_face", type=float, default=50.0)
    p.add_argument("--post_processing", action="store_false",
                   help="ON by default; passing the flag DISABLES it (reference quirk)")
    p.add_argument("--celeba_ckpt", type=str, default=os.environ.get("HEDIT_CELEBA_CKPT"))
    p.add_argument("--arcface_ckpt", type=str, default=os.environ.get("HEDIT_ARCFACE_CKPT"))
    p.add_argument("--lpips_ckpt", type=str, default=os.environ.get("HEDIT_LPIPS_CKPT"))
    p.add_argument("--parser_ckpt", type=str, default=os.environ.get("HEDIT_PARSER_CKPT"))
    p.add_argument("--resume", action="store_true",
                   help="skip a pair when its output exists (SURVEY.md 5.3)")
    p.add_argument("--data_parallel", type=int, default=0, metavar="B",
                   help="batch B pairs per jit call, pair axis sharded over "
                        "the mesh 'data' axis (parallel/sweep.py:"
                        "face_batch_fn); 0 = serial reference loop")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--step_chunk", type=int, default=10)
    p.add_argument("--save_trajectory", type=str, default=None, metavar="NPZ",
                   help="capture the SDE inversion trajectory for replay")
    p.add_argument("--load_trajectory", type=str, default=None, metavar="NPZ",
                   help="inject a captured trajectory (ours or torch NCHW)")
    args = p.parse_args(argv)
    # A trajectory encodes ONE source image; over --data_file it would be
    # injected into every pair (or overwritten once per pair on capture).
    if (args.save_trajectory or args.load_trajectory) and args.data_file:
        p.error("--save_trajectory/--load_trajectory encode a single source "
                "image; use --ref/--source instead of --data_file")
    if args.data_parallel > 0 and (args.save_trajectory or args.load_trajectory):
        p.error("trajectory capture/injection encodes a single pair; it is "
                "incompatible with --data_parallel")
    assert args.eta == 1.0, "face swapping requires eta == 1.0 (main_edit.py:64)"
    if args.optimization_steps == 1 and args.weight_edit_face == 50.0:
        args.weight_edit_face = 100.0  # (:60)
    return args


def main(argv=None):
    from hedit_tpu.edit.face_swap import ef_face, h_edit_r_face
    from hedit_tpu.invert.sde import invert_sde
    from hedit_tpu.io_utils.images import dataset_from_json, load_image
    from hedit_tpu.pipelines.face import create_face_pipeline

    args = parse_args(argv)
    force_platform(args.platform)

    pipe = create_face_pipeline(
        tiny=args.tiny, num_inference_steps=args.num_diffusion_steps,
        celeba_ckpt=args.celeba_ckpt, arcface_ckpt=args.arcface_ckpt,
        lpips_ckpt=args.lpips_ckpt, parser_ckpt=args.parser_ckpt,
    )
    res = pipe.unet.cfg.resolution
    N = args.num_diffusion_steps - args.skip

    # jit the inversion once with the UNet params as an ARGUMENT: unjitted,
    # lax.scan re-traces per pair, costing seconds of host time per image
    # on a dataset sweep (measured in scripts/bench_rewards.py)
    @jax.jit
    def invert_jit(unet_p, src_img, key):
        eps = lambda x, t: pipe.unet.apply(unet_p, x, t)  # noqa: E731
        return invert_sde(eps, pipe.schedule, src_img, eta=args.eta,
                          rng=key, step_chunk=args.step_chunk)

    pairs = []
    if args.data_file:
        # the reference joins a base dir onto the JSON's bare filenames
        # (``main_edit.py:148-156`` ``os.path.join(image_path, source_path)``)
        base = args.image_path or os.path.dirname(args.data_file)
        for item in dataset_from_json(args.data_file):
            pairs.append((os.path.join(base, item["ref"]),
                          os.path.join(base, item["source"])))
    else:
        assert args.ref and args.source, "need --ref and --source (or --data_file)"
        pairs.append((args.ref, args.source))

    os.makedirs(args.output_path, exist_ok=True)
    if args.data_parallel > 0:
        return run_data_parallel_face(args, pipe, pairs)

    # jit the reward-guided loop ONCE with all frozen params as ARGUMENTS
    # (see the inversion jit above for why); mode/steps are closure-static
    from hedit_tpu.models.arcface import cosine_loss as _cos_loss

    @jax.jit
    def run_edit(unet_p, arc_p, lp_p, xT, zs, ref_embed, src_img):
        eps = lambda x, t: pipe.unet.apply(unet_p, x, t)  # noqa: E731
        idf = lambda img: _cos_loss(arc_p, pipe.arcface, img, ref_embed)  # noqa: E731
        lpf = lambda img: jnp.mean(pipe.lpips.apply(lp_p, img, src_img))  # noqa: E731
        if args.mode == "h_edit_R":
            return h_edit_r_face(
                eps, pipe.schedule, xT, zs, id_loss_fn=idf,
                lpips_loss_fn=lpf, weight_edit_face=args.weight_edit_face,
                eta=args.eta, optimization_steps=args.optimization_steps,
                after_skip_steps=N, soft_face_mask=None,
            )
        return ef_face(
            eps, pipe.schedule, xT, zs, id_loss_fn=idf, lpips_loss_fn=lpf,
            weight_edit_face=args.weight_edit_face, eta=args.eta,
            after_skip_steps=N, soft_face_mask=None,
        )

    for ref_path, src_path in pairs:
        out_key = (
            f"{os.path.basename(ref_path).split('.')[0]}_"
            f"{os.path.basename(src_path).split('.')[0]}"
        )
        out = os.path.join(args.output_path, f"item_{out_key}.png")
        from hedit_tpu.cli.common import resume_skip
        if resume_skip(args, out, out_key):
            continue
        ref_img = jnp.asarray(load_image(ref_path, size=res))
        src_img = jnp.asarray(load_image(src_path, size=res))

        if args.load_trajectory:
            from hedit_tpu.io_utils.trajectory import load_trajectory

            inv = load_trajectory(args.load_trajectory,
                                  expect_steps=args.num_diffusion_steps)
            if inv.zs is None:
                raise ValueError("face trajectory must include zs")
        else:
            inv = invert_jit(pipe.unet_params, src_img,
                             jax.random.PRNGKey(42))
        if args.save_trajectory:
            from hedit_tpu.io_utils.trajectory import save_trajectory

            save_trajectory(args.save_trajectory, inv)

        xT = inv.xts[N][None]

        ref_embed = jax.lax.stop_gradient(pipe.id_embed(ref_img))
        edited = run_edit(pipe.unet_params, pipe.arcface_params,
                          pipe.lpips_params, xT, inv.zs, ref_embed, src_img)

        grid = _save_pair(args, pipe, ref_img, src_img, edited)
        grid.save(out)
        print(f"saved {out}")
    return 0


def _save_pair(args, pipe, ref_img, src_img, edited):
    """Post-process (mask blend), print cosine sim, build the result grid —
    the per-pair tail of the reference loop (``main_edit.py:211-225``)."""
    from hedit_tpu.io_utils.images import image_grid, to_pil
    from hedit_tpu.models.arcface import cosine_sim
    from hedit_tpu.rewards.face_mask import build_face_mask

    if args.post_processing:
        seg = pipe.parse(src_img)
        soft_mask = build_face_mask(seg)
        mask = soft_mask if soft_mask.ndim == 4 else soft_mask[..., None]
        edited = edited * mask + src_img * (1 - mask)
    ref_embed = pipe.id_embed(ref_img)
    sim = cosine_sim(pipe.arcface_params, pipe.arcface, edited, ref_embed)
    print(f"Cosine Similarity: {float(jnp.mean(sim))}")
    return image_grid([to_pil(np.asarray(x)) for x in (ref_img, src_img, edited)])


def run_data_parallel_face(args, pipe, pairs):
    """Sharded face-swap sweep: B (ref, source) pairs per jit call over the
    mesh 'data' axis (``parallel/sweep.py:face_batch_fn``).  The reference
    loop is serial (``face-swapping/main_edit.py:146``).  Multi-host aware
    (``parallel/dist.py``): each process loads and writes only its rows."""
    from hedit_tpu.cli.common import resume_skip
    from hedit_tpu.io_utils.images import load_image
    from hedit_tpu.parallel import dist
    from hedit_tpu.parallel.mesh import dp_mesh
    from hedit_tpu.parallel.sweep import face_batch_fn

    B = args.data_parallel
    mesh = dp_mesh(B)
    sl = dist.owned_slice(mesh, B)
    res = pipe.unet.cfg.resolution
    N = args.num_diffusion_steps - args.skip
    fn = jax.jit(face_batch_fn(
        pipe, mode=args.mode, weight_edit_face=args.weight_edit_face,
        eta=args.eta, optimization_steps=args.optimization_steps,
        after_skip_steps=N, step_chunk=args.step_chunk,
    ))
    unet_p = dist.put_replicated(pipe.unet_params, mesh)
    arc_p = dist.put_replicated(pipe.arcface_params, mesh)
    lp_p = dist.put_replicated(pipe.lpips_params, mesh)
    # serial-path parity: every pair inverts with the reference's fixed
    # seed-42 key (main_edit.py / sde_inversion.py:22-23)
    keys = jnp.broadcast_to(jax.random.PRNGKey(42),
                            (sl.stop - sl.start, 2))

    todo = []
    for ref_path, src_path in pairs:
        out_key = (
            f"{os.path.basename(ref_path).split('.')[0]}_"
            f"{os.path.basename(src_path).split('.')[0]}"
        )
        out = os.path.join(args.output_path, f"item_{out_key}.png")
        if resume_skip(args, out, out_key):
            continue
        todo.append((ref_path, src_path, out))

    batches = []
    for i in range(0, len(todo), B):
        chunk = todo[i:i + B]
        while len(chunk) < B:  # pad the tail batch
            chunk.append(chunk[-1])
        batches.append((chunk, len(todo[i:i + B])))

    def prepare(bat):
        chunk, _ = bat
        # this process's rows only (multi-host: disjoint image loads)
        refs = [jnp.asarray(load_image(r, size=res))
                for r, _, _ in chunk[sl]]
        srcs = [jnp.asarray(load_image(s, size=res))
                for _, s, _ in chunk[sl]]
        ref_embeds = jax.lax.stop_gradient(
            pipe.id_embed(jnp.concatenate(refs, axis=0)))  # [B_local, 512]
        return refs, srcs, ref_embeds

    from hedit_tpu.io_utils.prefetch import prefetch_map

    total = 0
    with jax.set_mesh(mesh):
        for (chunk, n_real), (refs, srcs, ref_embeds) in prefetch_map(
                batches, prepare):
            put = lambda x: dist.put_batch(x, mesh, B)  # noqa: E731
            edited = fn(unet_p, arc_p, lp_p,
                        put(jnp.concatenate(srcs, axis=0)),
                        put(ref_embeds), put(keys))
            for gi, row in dist.owned_rows(edited):
                if gi >= n_real:
                    continue  # tail padding
                li = gi - sl.start
                grid = _save_pair(args, pipe, refs[li], srcs[li],
                                  jnp.asarray(row[None]))
                grid.save(chunk[gi][2])
                print(f"saved {chunk[gi][2]}")
                total += 1
    print(f"done (data-parallel): {total} pairs -> {args.output_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
