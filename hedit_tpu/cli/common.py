"""Shared CLI plumbing for the workload drivers."""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def force_platform(platform: Optional[str]):
    """The axon TPU plugin overrides JAX_PLATFORMS; force via config."""
    if platform:
        jax.config.update("jax_platforms", platform)


def add_resume_arg(p: argparse.ArgumentParser):
    p.add_argument("--resume", action="store_true",
                   help="skip a sample when its output file already exists "
                        "(cheap crash resume, SURVEY.md §5.3); the default "
                        "recomputes and overwrites like the reference")


def resume_skip(args, out_path: str, key=None) -> bool:
    """True when --resume is set and this sample's output already exists.

    The reference has no resume at all — a crashed 700-image PieBench run
    restarts from scratch (SURVEY.md §5.3 names the per-sample output
    existence check as the one required piece)."""
    if getattr(args, "resume", False) and os.path.exists(out_path):
        print(f"[{key if key is not None else out_path}] output exists, "
              f"skipping (--resume)")
        return True
    return False


def add_common_model_args(p: argparse.ArgumentParser):
    p.add_argument("--weights", type=str, default=os.environ.get("HEDIT_SD_WEIGHTS"),
                   help="diffusers-layout checkpoint dir (unet/ vae/ text_encoder/)")
    p.add_argument("--tiny", action="store_true",
                   help="seeded tiny random-init model (no pretrained weights; smoke/CI)")
    p.add_argument("--platform", type=str, default=None, choices=[None, "cpu", "tpu"],
                   help="force a JAX platform")
    p.add_argument("--bf16", action="store_true", help="bfloat16 model compute")
    from hedit_tpu.parallel.dist import add_dist_args

    add_dist_args(p)


def build_pipeline(args, num_steps: int, steps_offset: int = 1):
    from hedit_tpu.core.schedule import Schedule
    from hedit_tpu.parallel.dist import init_distributed_from_args
    from hedit_tpu.pipelines.sd import create_sd_pipeline

    force_platform(args.platform)
    init_distributed_from_args(args)  # no-op without --dist_coordinator
    pipe = create_sd_pipeline(
        weights_dir=args.weights if not args.tiny else None,
        tiny=args.tiny,
        num_inference_steps=num_steps,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    import dataclasses

    sched = Schedule.create(num_steps, steps_offset=steps_offset)
    return dataclasses.replace(pipe, schedule=sched)


def encode_prompts(pipe, prompts, tiny: bool):
    """-> [len(prompts), 77, D] embeddings.  Tiny mode hashes real BPE ids
    into the toy vocab so the smoke path exercises the full text stack."""
    if not tiny and pipe.tokenizer is not None:
        return pipe.encode_text(prompts)
    from hedit_tpu.models.tokenizer import CLIPTokenizer

    try:
        tok = CLIPTokenizer()
        ids = tok(prompts) % pipe.text_model.cfg.vocab_size
    except FileNotFoundError:
        rng = np.random.RandomState(abs(hash(tuple(prompts))) % (2**31))
        ids = rng.randint(0, pipe.text_model.cfg.vocab_size, size=(len(prompts), 77))
    return pipe.encode_token_ids(jnp.asarray(ids, jnp.int32))


def jit_with_params(pipe, fn):
    """Jit an edit flow with the UNet params passed as an ARGUMENT.

    Closing a jit over the concrete 859M-param pytree bakes ~3.4GB of
    constants into the HLO — large enough to crash the axon remote-compile
    service (see bench.py).  ``fn(eps_plain, eps_ctrl, *args)`` receives
    closures over the *traced* params instead.
    """
    import jax

    unet = pipe.unet

    @jax.jit
    def wrapped(params, *args):
        def eps_plain(x, t, c):
            return unet.apply(params, x, t, c)

        def eps_ctrl(x, t, c, ctrl):
            if getattr(ctrl, "stores_attn", False):
                out, aux = unet.apply(params, x, t, c, ctrl, True,
                                      mutable=["attn_store"])
                return out, aux["attn_store"]
            return unet.apply(params, x, t, c, ctrl)

        return fn(eps_plain, eps_ctrl, *args)

    return lambda *args: wrapped(pipe.unet_params, *args)


def result_dir_name(mode: str, args, extra: str = "") -> str:
    """Hyperparameters serialized into the output dir — the reference's
    de-facto experiment tracking (``main_p2p.py:102-103,132-133``)."""
    parts = [
        mode,
        f"total_steps_{args.num_diffusion_steps}",
        f"skip_{args.skip}",
    ]
    if extra:
        parts.append(extra)
    return "_".join(parts)


def add_data_parallel_arg(p: argparse.ArgumentParser):
    p.add_argument("--data_parallel", type=int, default=0, metavar="B",
                   help="batch B samples per jit call, sample axis sharded "
                        "over the mesh 'data' axis; 0 = serial reference loop")


def run_data_parallel_ctrl(args, pipe, samples, out_dir, edit_one, *,
                           is_ddim: bool, skip_zs: bool = False,
                           src_override: Optional[str] = None):
    """Sharded dataset sweep for the MasaCtrl / PnP drivers: B samples per
    jit call over the mesh 'data' axis (``parallel/sweep.py:ctrl_batch_fn``).
    ``edit_one`` carries the driver's mode dispatch; ``src_override`` pins
    the source prompt (MasaCtrl's null-source convention).

    Multi-host aware (SURVEY.md §5.8, ``parallel/dist.py``): under
    ``--dist_coordinator`` the mesh 'data' axis spans processes; every
    process walks the identical deterministic batch list but loads/encodes
    only its own rows and writes only its own outputs."""
    from hedit_tpu.io_utils.images import load_image, to_pil
    from hedit_tpu.parallel import dist
    from hedit_tpu.parallel.mesh import dp_mesh
    from hedit_tpu.parallel.sweep import ctrl_batch_fn

    B = args.data_parallel
    mesh = dp_mesh(B)
    sl = dist.owned_slice(mesh, B)
    N = args.num_diffusion_steps - args.skip
    fn = jax.jit(ctrl_batch_fn(
        pipe, edit_one, is_ddim=is_ddim, cfg_scale_src=args.cfg_src,
        inv_eta=1.0 if is_ddim else args.eta, step_chunk=args.step_chunk,
        after_skip_steps=N, skip_zs=skip_zs,
    ))
    params = dist.put_replicated(pipe.unet_params, mesh)
    img_size = 512 if not args.tiny else pipe.vae.cfg.sample_size

    def prepare(batch):
        """Host-side batch prep (PIL + VAE/CLIP encode) for THIS process's
        rows only; runs on the prefetch worker while the device executes
        the previous batch."""
        x0s, us, ss, ts = [], [], [], []
        for key, item in batch[sl]:
            img = jnp.asarray(load_image(item["image_path"], size=img_size))
            x0s.append(pipe.vae_encode(img)[0])
            src = (src_override if src_override is not None else
                   item.get("original_prompt", ""))
            src = src.replace("[", "").replace("]", "")
            tar = item["editing_prompt"].replace("[", "").replace("]", "")
            e = encode_prompts(pipe, ["", src, tar], args.tiny)
            us.append(e[0]); ss.append(e[1]); ts.append(e[2])
        return (jnp.stack(x0s), jnp.stack(us), jnp.stack(ss), jnp.stack(ts))

    def consume(batch, prep):
        x0s, us, ss, ts = prep
        # Per-sample key == the serial path's key (one fixed key per sample,
        # NOT a batch-position split): outputs are identical to the serial
        # sweep and invariant to how --resume re-batches the remaining work.
        rngs = jnp.broadcast_to(jax.random.PRNGKey(0),
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
            out_path = os.path.join(
                out_dir,
                os.path.basename(item["image_path"]).rsplit(".", 1)[0] + ".png")
            img.save(out_path)
            print(f"[{key}] saved {out_path}")
        return len(seen)

    todo = []
    for key, item in samples:
        out_path = os.path.join(
            out_dir,
            os.path.basename(item["image_path"]).rsplit(".", 1)[0] + ".png")
        if resume_skip(args, out_path, key):
            continue
        todo.append((key, item))

    batches = []
    for i in range(0, len(todo), B):
        batch = todo[i:i + B]
        while len(batch) < B:  # pad the tail batch
            batch.append(batch[-1])
        batches.append(batch)

    from hedit_tpu.io_utils.prefetch import prefetch_map

    total = 0
    with jax.set_mesh(mesh):
        for batch, prep in prefetch_map(batches, prepare):
            total += consume(batch, prep)
    print(f"done (data-parallel): {total} samples -> {out_dir}")
    return 0
