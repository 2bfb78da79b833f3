"""Stable-Diffusion pipeline bundle: UNet + VAE + CLIP text + tokenizer + schedule.

The functional analog of the reference's ``StableDiffusionPipeline`` handle
(``text-guided/main_p2p.py:98-159``): owns apply-closures over frozen params so
the editing scans can call ``pipe.unet_eps(...)`` inside jit.  No per-sample
``copy.deepcopy`` is needed — controller state is an explicit scan carry, not
module state (SURVEY.md §5.2).

Weight sources, in order: a diffusers-layout checkpoint directory (HF download
cache), or seeded random init (tiny or full shapes) when no weights exist —
the only option in zero-egress environments; all numerics tests are designed
around seeded-random models (SURVEY.md §4 "Golden numerics").
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import NO_CONTROL
from hedit_tpu.core.schedule import Schedule
from hedit_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from hedit_tpu.models.tokenizer import CLIPTokenizer
from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig
from hedit_tpu.models.vae import AutoencoderKL, VAEConfig


@dataclasses.dataclass
class SDPipeline:
    unet: UNet2DCondition
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    text_model: CLIPTextModel
    text_params: Any
    tokenizer: Optional[CLIPTokenizer]
    schedule: Schedule
    dtype: Any = jnp.float32

    # ------------------------------------------------------------------ text
    def encode_text(self, prompts) -> jnp.ndarray:
        """prompt(s) -> [B, 77, hidden]; `encode_text`
        (``inversion_utils.py:13-35``)."""
        if self.tokenizer is None:
            raise RuntimeError("pipeline built without tokenizer")
        ids = jnp.asarray(self.tokenizer(prompts))
        return self.text_model.apply(self.text_params, ids)

    def encode_token_ids(self, ids) -> jnp.ndarray:
        return self.text_model.apply(self.text_params, jnp.asarray(ids))

    # ------------------------------------------------------------------ unet
    def unet_eps(self, x, t, context, control=NO_CONTROL, use_pallas=True):
        """eps prediction; optionally returns sown attention maps when the
        control stores any (mutable 'attn_store')."""
        if getattr(control, "stores_attn", False):
            out, aux = self.unet.apply(
                self.unet_params, x, t, context, control, use_pallas,
                mutable=["attn_store"],
            )
            return out, aux.get("attn_store", {})
        return self.unet.apply(self.unet_params, x, t, context, control, use_pallas)

    # ------------------------------------------------------------------- vae
    def vae_encode(self, images) -> jnp.ndarray:
        """[B,H,W,3] in [-1,1] -> scaled latents (mode * 0.18215,
        ``main_p2p.py:154-159``)."""
        return self.vae.apply(self.vae_params, images, method=AutoencoderKL.encode_mode)

    def vae_decode(self, latents) -> jnp.ndarray:
        return self.vae.apply(self.vae_params, latents, method=AutoencoderKL.decode)

    def with_schedule(self, num_inference_steps: int) -> "SDPipeline":
        return dataclasses.replace(
            self, schedule=Schedule.create(num_inference_steps)
        )


def _init(model, rng, *args):
    return model.init(rng, *args)


def create_sd_pipeline(
    weights_dir: Optional[str] = None,
    *,
    tiny: bool = False,
    num_inference_steps: int = 50,
    seed: int = 0,
    dtype=jnp.float32,
    with_tokenizer: bool = True,
) -> SDPipeline:
    """Build the pipeline.

    weights_dir: diffusers-layout directory (subdirs unet/, vae/, text_encoder/
    with *.safetensors or *.bin).  None -> seeded random init.
    tiny: small seeded model for tests/CI (no pretrained weights in image).
    """
    if tiny:
        ucfg, vcfg, tcfg = UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny()
    else:
        ucfg, vcfg, tcfg = UNetConfig.sd15(), VAEConfig.sd(), CLIPTextConfig.sd15()
    if dtype != jnp.float32:
        ucfg = dataclasses.replace(ucfg, dtype=dtype)
        vcfg = dataclasses.replace(vcfg, dtype=dtype)
        tcfg = dataclasses.replace(tcfg, dtype=dtype)

    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(vcfg)
    text = CLIPTextModel(tcfg)

    rngs = jax.random.split(jax.random.PRNGKey(seed), 3)
    latent = jnp.zeros((1, ucfg.sample_size, ucfg.sample_size, ucfg.in_channels))
    img = jnp.zeros((1, vcfg.sample_size, vcfg.sample_size, 3))
    ids = jnp.zeros((1, tcfg.max_position_embeddings), jnp.int32)
    ctx = jnp.zeros((1, tcfg.max_position_embeddings, ucfg.cross_attention_dim))

    if weights_dir is not None:
        unet_params, vae_params, text_params = load_sd_weights(
            weights_dir, unet, vae, text, latent, ctx, img, ids
        )
    else:
        unet_params = _init(unet, rngs[0], latent, jnp.array(1), ctx)
        vae_params = _init(vae, rngs[1], img)
        text_params = _init(text, rngs[2], ids)

    tok = None
    if with_tokenizer and not tiny:
        try:
            tok = CLIPTokenizer()
        except FileNotFoundError:
            tok = None
    elif with_tokenizer and tiny:
        tok = None  # tiny text model has a toy vocab; tests feed raw ids

    return SDPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_model=text, text_params=text_params, tokenizer=tok,
        schedule=Schedule.create(num_inference_steps), dtype=dtype,
    )


def _find_ckpt(subdir: str):
    for name in (
        "diffusion_pytorch_model.safetensors",
        "diffusion_pytorch_model.bin",
        "model.safetensors",
        "pytorch_model.bin",
    ):
        p = os.path.join(subdir, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no checkpoint found under {subdir}")


def load_sd_weights(weights_dir, unet, vae, text, latent, ctx, img, ids):
    """Load + convert + validate the SD towers, with an orbax cache so the
    torch->Flax port runs once per checkpoint dir (SURVEY.md §5.4)."""
    from hedit_tpu.io_utils.checkpoint import load_or_convert
    from hedit_tpu.io_utils.weights import (
        convert_clip_text, convert_unet, convert_vae, load_torch_state,
        validate_against,
    )

    rng = jax.random.PRNGKey(0)
    unet_t = jax.eval_shape(unet.init, rng, latent, jnp.array(1), ctx)
    vae_t = jax.eval_shape(vae.init, rng, img)
    text_t = jax.eval_shape(text.init, rng, ids)
    cache = os.path.join(weights_dir, "flax_cache")

    def cv_unet():
        p = convert_unet(load_torch_state(_find_ckpt(os.path.join(weights_dir, "unet"))))
        validate_against(unet_t, p, "unet")
        return p

    def cv_vae():
        p = convert_vae(load_torch_state(_find_ckpt(os.path.join(weights_dir, "vae"))))
        validate_against(vae_t, p, "vae")
        return p

    def cv_text():
        p = convert_clip_text(
            load_torch_state(_find_ckpt(os.path.join(weights_dir, "text_encoder")))
        )
        validate_against(text_t, p, "text_encoder")
        return p

    unet_p = load_or_convert(cache, "unet", cv_unet, template=unet_t)
    vae_p = load_or_convert(cache, "vae", cv_vae, template=vae_t)
    text_p = load_or_convert(cache, "text_encoder", cv_text, template=text_t)
    to_jnp = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
    return to_jnp(unet_p), to_jnp(vae_p), to_jnp(text_p)
