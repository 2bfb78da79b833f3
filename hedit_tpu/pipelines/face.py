"""Face-swapping pipeline bundle: CelebA-HQ DDPM UNet + reward models.

The functional analog of the model/loss setup in
``face-swapping/main_edit.py:84-171``: linear beta schedule 1e-4 -> 2e-2 over
1000 train steps, seq = leading timesteps with offset 1 (:130-142); ArcFace
IDLoss against a reference image embedding; LPIPS against the source image;
face-parsing mask with soft erosion.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from hedit_tpu.core.schedule import Schedule
from hedit_tpu.models.arcface import IRSE50, convert_irse50, extract_feats
from hedit_tpu.models.ddpm_unet import DDPMConfig, DDPMUNet, convert_ddpm_ckpt
from hedit_tpu.models.face_parser import FaceParsing, convert_face_parser
from hedit_tpu.models.lpips_vgg import LPIPSVgg, convert_lpips_vgg


@dataclasses.dataclass
class FacePipeline:
    unet: DDPMUNet
    unet_params: Any
    arcface: Optional[IRSE50]
    arcface_params: Any
    lpips: Optional[LPIPSVgg]
    lpips_params: Any
    parser: Optional[FaceParsing]
    parser_params: Any
    schedule: Schedule

    def eps_fn(self):
        return lambda x, t: self.unet.apply(self.unet_params, x, t)

    def id_embed(self, image: jnp.ndarray) -> jnp.ndarray:
        return extract_feats(self.arcface_params, self.arcface, image)

    def id_loss_fn(self, ref_image: jnp.ndarray):
        """IDLoss.get_cosine_loss closure (``arcface_model.py:48-67``)."""
        from hedit_tpu.models.arcface import cosine_loss

        ref = jax.lax.stop_gradient(self.id_embed(ref_image))
        return lambda img: cosine_loss(self.arcface_params, self.arcface, img, ref)

    def lpips_loss_fn(self, src_image: jnp.ndarray):
        src = jax.lax.stop_gradient(src_image)
        return lambda img: jnp.mean(
            self.lpips.apply(self.lpips_params, img, src)
        )

    def parse(self, image: jnp.ndarray) -> jnp.ndarray:
        return self.parser.apply(self.parser_params, image)


def create_face_pipeline(
    *,
    tiny: bool = False,
    num_inference_steps: int = 100,
    celeba_ckpt: Optional[str] = None,
    arcface_ckpt: Optional[str] = None,
    lpips_ckpt: Optional[str] = None,
    parser_ckpt: Optional[str] = None,
    seed: int = 0,
    with_rewards: bool = True,
    dtype=None,
) -> FacePipeline:
    """``dtype``: UNet conv/dense compute dtype (e.g. ``jnp.bfloat16`` for
    the MXU-native path; GroupNorm statistics stay float32 regardless).
    Posterior math and reward VJPs are float32 either way."""
    import dataclasses as _dc

    from hedit_tpu.io_utils.weights import load_torch_state, validate_against

    cfg = DDPMConfig.tiny() if tiny else DDPMConfig.celeba_hq()
    if dtype is not None:
        cfg = _dc.replace(cfg, dtype=dtype)
    unet = DDPMUNet(cfg)
    rngs = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jnp.zeros((1, cfg.resolution, cfg.resolution, 3))

    if celeba_ckpt:
        tmpl = jax.eval_shape(unet.init, rngs[0], x, jnp.array(1))
        params = convert_ddpm_ckpt(load_torch_state(celeba_ckpt))
        validate_against(tmpl, params, "celeba_ddpm")
        unet_params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        unet_params = unet.init(rngs[0], x, jnp.array(1))

    arc = lp = par = None
    arc_p = lp_p = par_p = None
    if with_rewards:
        face_res = 112 if not tiny else 112  # ArcFace input is fixed 112
        arc = IRSE50()
        if arcface_ckpt:
            tmpl = jax.eval_shape(arc.init, rngs[1], jnp.zeros((1, 112, 112, 3)))
            arc_p = convert_irse50(load_torch_state(arcface_ckpt))
            validate_against(tmpl, arc_p, "ir_se50")
            arc_p = jax.tree_util.tree_map(jnp.asarray, arc_p)
        else:
            arc_p = arc.init(rngs[1], jnp.zeros((1, 112, 112, 3)))
        lp = LPIPSVgg()
        img = jnp.zeros((1, cfg.resolution, cfg.resolution, 3))
        if lpips_ckpt:
            tmpl = jax.eval_shape(lp.init, rngs[2], img, img)
            lp_p = convert_lpips_vgg(load_torch_state(lpips_ckpt))
            validate_against(tmpl, lp_p, "lpips_vgg")
            lp_p = jax.tree_util.tree_map(jnp.asarray, lp_p)
        else:
            lp_p = lp.init(rngs[2], img, img)
        par = FaceParsing()
        if parser_ckpt:
            tmpl = jax.eval_shape(par.init, rngs[3], img)
            par_p = convert_face_parser(load_torch_state(parser_ckpt))
            validate_against(tmpl, par_p, "face_parser")
            par_p = jax.tree_util.tree_map(jnp.asarray, par_p)
        else:
            par_p = par.init(rngs[3], img)

    sched = Schedule.create(
        num_inference_steps, beta_schedule="linear", beta_start=1e-4,
        beta_end=2e-2, steps_offset=1,
    )
    return FacePipeline(
        unet=unet, unet_params=unet_params, arcface=arc, arcface_params=arc_p,
        lpips=lp, lpips_params=lp_p, parser=par, parser_params=par_p,
        schedule=sched,
    )
