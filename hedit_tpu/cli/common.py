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


def build_pipeline(args, num_steps: int, steps_offset: int = 1):
    from hedit_tpu.core.schedule import Schedule
    from hedit_tpu.pipelines.sd import create_sd_pipeline

    force_platform(args.platform)
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
