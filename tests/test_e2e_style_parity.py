"""END-TO-END cross-framework parity of the combined text+style workload.

Runs the reference's OWN ``text-guided-n-style/inversion/{h_edit,ef}.py``
loops — text-guided h-Edit/EF with P2P plus the CLIP Gram-matrix style
gradient through the VAE decoder and the vendored CLIP vision tower — on
the torch replicas (SD UNet + SD VAE from test_torch_parity_sd, vendored
``clip_guidance/clip/model.py`` CLIP at tiny config), against our
``h_edit_style`` / ``ef_style`` with ``make_style_step``.

The style image encoder is the reference ``base_clip.CLIPEncoder``'s
``get_gram_matrix_residual`` re-stated verbatim minus the HF-hub download
in ``__init__`` (impossible offline) and with its hardcoded 224 literal
parameterized to the tiny tower's input resolution (``base_clip.py:56-66``).

This also certifies ``ops/resize.py``: the style VJP differentiates through
``F.interpolate(mode='bicubic')`` (a=-0.75, no antialias), which
``jax.image.resize`` does NOT reproduce (Keys a=-0.5) — a direct resize A/B
runs first so a kernel mismatch fails loudly rather than as loop drift.
"""

import pytest as _pytest_mod
pytestmark = _pytest_mod.mark.slow  # heavy lane; fast lane = -m "not slow"

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_t = torch.nn
import torch.nn.functional as F_t  # noqa: E402
from types import SimpleNamespace  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_e2e_p2p_parity import (  # noqa: E402
    _install_p2p_shims,
    _KwHolder,
    _register_controller,
    _TokED,
    _UNetWrapP2P,
)
from test_e2e_text_parity import _TextEnc, assert_close_pixelwise  # noqa: E402
from test_torch_parity import _load_ref_module, _randomize, _state_np, needs_reference  # noqa: E402
from test_torch_parity_sd import _TorchSDUNet, _TorchSDVAE  # noqa: E402

S = 6
CFG3 = (1.0, 3.0, 5.0)
XA, SA = 0.6, 0.4
CLIP_RES = 32            # tiny vendored-CLIP input resolution
WEIGHT_CLIP = 0.5
PROMPTS = ["a cat sitting on grass", "a fluffy dog sitting on grass"]

_MEAN01 = (0.48145466, 0.4578275, 0.40821073)
_STD01 = (0.26862954, 0.26130258, 0.27577711)


class _RefStyleEncoder:
    """``base_clip.CLIPEncoder`` minus the hub download (``base_clip.py:31-66``):
    [-1,1]-adapted Normalize, bicubic resize, ``encode_image_with_features``
    taps, block-2 Gram residual vs a [0,1]-normalized reference image."""

    def __init__(self, clip_tm, ref_img_01_nchw, size):
        self.clip_model = clip_tm
        self.size = size
        m01 = torch.tensor(_MEAN01).view(1, 3, 1, 1)
        s01 = torch.tensor(_STD01).view(1, 3, 1, 1)
        self._m = m01 * 2 - 1
        self._s = s01 * 2
        self.ref = (ref_img_01_nchw - m01) / s01

    def get_gram_matrix_residual(self, im1):
        im1 = F_t.interpolate(im1, size=(self.size, self.size), mode="bicubic")
        im1 = (im1 - self._m) / self._s
        _, feats1 = self.clip_model.encode_image_with_features(im1)
        _, feats2 = self.clip_model.encode_image_with_features(self.ref)
        feat1 = feats1[2][1:, 0, :]
        feat2 = feats2[2][1:, 0, :]
        return torch.mm(feat1.t(), feat1) - torch.mm(feat2.t(), feat2)


@pytest.fixture(scope="module")
def style_setup():
    _install_p2p_shims()
    ref_clipmod = _load_ref_module(
        "ref_clip_model_style", "text-guided-n-style/clip_guidance/clip/model.py")
    ref_hedit = _load_ref_module(
        "ref_style_h_edit", "text-guided-n-style/inversion/h_edit.py")
    ref_ef = _load_ref_module(
        "ref_style_ef", "text-guided-n-style/inversion/ef.py")
    ref_ddpm = _load_ref_module(
        "ref_ddpm_inv_style", "text-guided-n-style/inversion/ddpm_inversion.py")
    ref_classes = _load_ref_module(
        "ref_ptp_classes_style", "text-guided-n-style/p2p/ptp_classes.py")

    tm = _TorchSDUNet()
    _randomize(tm, 20)
    vae_tm = _TorchSDVAE(chans=(32, 32, 32, 32))
    _randomize(vae_tm, 21)
    clip_tm = ref_clipmod.CLIP(
        embed_dim=16, image_resolution=CLIP_RES, vision_layers=3,
        vision_width=64, vision_patch_size=8, context_length=8, vocab_size=64,
        transformer_width=16, transformer_heads=2, transformer_layers=1,
    )
    _randomize(clip_tm, 3)

    from hedit_tpu.core.schedule import Schedule

    sched = Schedule.create(S)
    fake_sched = SimpleNamespace(
        alphas_cumprod=torch.from_numpy(np.asarray(sched.alphas_cumprod).copy()),
        alphas=torch.from_numpy(np.asarray(sched.alphas).copy()),
        final_alpha_cumprod=torch.from_numpy(
            np.asarray(sched.final_alpha_cumprod).copy()),
        timesteps=torch.from_numpy(np.asarray(sched.timesteps).copy()).long(),
        num_inference_steps=S,
        config=SimpleNamespace(num_train_timesteps=1000),
    )

    class _VAEWrap:
        def __init__(self, vae):
            self._vae = vae

        def decode(self, z):
            return SimpleNamespace(sample=self._vae.decode(z))

    tok = _TokED()
    holder = _KwHolder()
    pipe = SimpleNamespace(
        unet=_UNetWrapP2P(tm, 16, holder), vae=_VAEWrap(vae_tm),
        scheduler=fake_sched, tokenizer=tok, text_encoder=_TextEnc(),
        device=torch.device("cpu"),
    )

    rng = np.random.RandomState(4)
    w0 = rng.randn(1, 4, 16, 16).astype(np.float32) * 0.3
    ref_img01 = rng.rand(1, CLIP_RES, CLIP_RES, 3).astype(np.float32)
    torch.manual_seed(123)
    _, zs_t, xts_t, _ = ref_ddpm.inversion_forward_process_ddpm(
        pipe, torch.from_numpy(w0), etas=1.0, prog_bar=False,
        prompt=PROMPTS[0], cfg_scale_src=1.0, num_inference_steps=S,
    )

    encoder = _RefStyleEncoder(
        clip_tm,
        torch.from_numpy(ref_img01.transpose(0, 3, 1, 2)).contiguous(),
        CLIP_RES,
    )

    # ---- our side ---------------------------------------------------------- #
    from hedit_tpu.io_utils.weights import convert_unet, convert_vae
    from hedit_tpu.models.clip_vision import (
        CLIPVisionConfig, CLIPVisionTower, convert_clip_vision,
    )
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig
    from hedit_tpu.models.vae import AutoencoderKL, VAEConfig
    from hedit_tpu.rewards.clip_style import reference_gram

    params = convert_unet(_state_np(tm))
    model = UNet2DCondition(UNetConfig.tiny())
    vae_params = convert_vae(_state_np(vae_tm))
    vae = AutoencoderKL(VAEConfig(block_out_channels=(32, 32, 32, 32),
                                  sample_size=64))
    vparams = convert_clip_vision(_state_np(clip_tm))
    vtower = CLIPVisionTower(CLIPVisionConfig(
        input_resolution=CLIP_RES, patch_size=8, width=64, layers=3, heads=1,
        output_dim=16))

    def eps_ctrl(x, t, c, ctrl):
        if getattr(ctrl, "stores_attn", False):
            out, aux = model.apply(params, x, t, c, ctrl, True,
                                   mutable=["attn_store"])
            return out, aux["attn_store"]
        return model.apply(params, x, t, c, ctrl)

    def vae_decode(z):
        return vae.apply(vae_params, z, method=AutoencoderKL.decode)

    def vision_apply(x):
        return vtower.apply(vparams, x)

    ref_gram = reference_gram(vision_apply, jnp.asarray(ref_img01))

    def ctx_of(prompt):
        ids = tok(prompt).input_ids
        with torch.no_grad():
            return jnp.asarray(pipe.text_encoder(ids)[0].numpy())

    return dict(
        pipe=pipe, tm=tm, holder=holder, ref_hedit=ref_hedit, ref_ef=ref_ef,
        ref_classes=ref_classes, tok=tok, encoder=encoder, sched=sched,
        zs_t=zs_t, xts_t=xts_t, eps_ctrl=eps_ctrl, vae_decode=vae_decode,
        vision_apply=vision_apply, ref_gram=ref_gram,
        uncond=ctx_of(""), src=ctx_of(PROMPTS[0]), tar=ctx_of(PROMPTS[1]),
    )


def test_bicubic_resize_matches_torch():
    """ops/resize.py vs torch F.interpolate at the exact style-path shapes
    (downsample 128->32) plus an upsample case, forward AND gradient."""
    from hedit_tpu.ops.resize import resize_torch

    rng = np.random.RandomState(0)
    for (h, w), (oh, ow) in (((128, 128), (32, 32)), ((17, 23), (40, 31))):
        x = rng.randn(2, h, w, 3).astype(np.float32)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
        yt = F_t.interpolate(xt, size=(oh, ow), mode="bicubic")
        ours = np.asarray(resize_torch(jnp.asarray(x), (oh, ow)))
        np.testing.assert_allclose(
            ours, yt.detach().numpy().transpose(0, 2, 3, 1), atol=1e-5)
        # gradient of a fixed linear functional through the resize
        wgt = rng.randn(2, oh, ow, 3).astype(np.float32)
        yt.backward(torch.from_numpy(wgt.transpose(0, 3, 1, 2)))
        g_ours = jax.grad(
            lambda z: jnp.sum(resize_torch(z, (oh, ow)) * jnp.asarray(wgt))
        )(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(g_ours), xt.grad.numpy().transpose(0, 2, 3, 1),
            atol=1e-5)


def _build_controller(s):
    refine = s["ref_classes"].AttentionRefine(
        PROMPTS, S, cross_replace_steps=XA, self_replace_steps=SA,
        local_blend=None, tokenizer=s["tok"], device=torch.device("cpu"))
    _register_controller(s["tm"], refine, s["holder"])
    return refine


def _our_p2p_control(refine):
    from hedit_tpu.control.p2p import P2PControl

    return P2PControl(
        step=jnp.zeros((), jnp.int32),
        cross_alpha=jnp.asarray(
            refine.cross_replace_alpha.numpy().reshape(S + 1, 77)),
        refine_mapper=jnp.asarray(refine.mapper[0].numpy()),
        refine_alphas=jnp.asarray(refine.alphas.reshape(77).numpy()),
        replace_mapper=jnp.eye(77), equalizer=jnp.ones(77),
        mode="refine", use_reweight=False,
        self_replace_until=int(SA * S), blend_px=16,
    )


@needs_reference
def test_h_edit_style_matches_reference(style_setup):
    s = style_setup
    refine = _build_controller(s)
    edited_t, recon_t = s["ref_hedit"].h_Edit_p2p_implicit(
        s["pipe"], s["encoder"], s["xts_t"][S], eta=1.0, prompts=PROMPTS,
        cfg_scales=list(CFG3), zs=s["zs_t"], controller=refine,
        weight_edit_clip=WEIGHT_CLIP, optimization_steps=1,
        after_skip_steps=S, is_ddim_inversion=False,
    )

    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.edit.style import h_edit_style, make_style_step

    style_fn = make_style_step(
        s["vae_decode"], s["vision_apply"], s["ref_gram"], s["sched"],
        WEIGHT_CLIP, clip_size=CLIP_RES)
    cfg = HEditConfig(cfg_src=CFG3[0], cfg_src_edit=CFG3[1], cfg_tar=CFG3[2],
                      implicit=True, optimization_steps=1)
    ours_edit, ours_recon = h_edit_style(
        s["eps_ctrl"], s["sched"],
        jnp.asarray(s["xts_t"][S][None].numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(s["zs_t"].numpy().transpose(0, 2, 3, 1)),
        uncond_ctx=s["uncond"], src_ctx=s["src"], tar_ctx=s["tar"], cfg=cfg,
        after_skip_steps=S, control=_our_p2p_control(refine),
        style_fn=style_fn,
    )
    # the style VJP chains UNet+VAE+CLIP per step: wider max outliers
    assert_close_pixelwise(ours_edit, edited_t, mean_tol=2e-5, max_tol=5e-3)
    assert_close_pixelwise(ours_recon, recon_t, mean_tol=2e-5, max_tol=5e-3)


@needs_reference
def test_ef_style_matches_reference(style_setup):
    s = style_setup
    refine = _build_controller(s)
    edited_t, recon_t = s["ref_ef"].ef_p2p(
        s["pipe"], s["encoder"], s["xts_t"][S], etas=1.0, prompts=PROMPTS,
        cfg_scales=[1.0, CFG3[2]], zs=s["zs_t"], controller=refine,
        weight_edit_clip=1.5, is_ddim_inversion=False,
    )

    from hedit_tpu.edit.style import ef_style

    ours_edit, ours_recon = ef_style(
        s["eps_ctrl"], s["sched"],
        jnp.asarray(s["xts_t"][S][None].numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(s["zs_t"].numpy().transpose(0, 2, 3, 1)),
        uncond_ctx=s["uncond"], src_ctx=s["src"], tar_ctx=s["tar"],
        cfg_src=1.0, cfg_tar=CFG3[2], eta=1.0, after_skip_steps=S,
        control=_our_p2p_control(refine), vae_decode=s["vae_decode"],
        vision_apply=s["vision_apply"], ref_gram=s["ref_gram"],
        weight_edit_clip_for_ef=1.5, clip_size=CLIP_RES,
    )
    assert_close_pixelwise(ours_edit, edited_t, mean_tol=2e-5, max_tol=5e-3)
    assert_close_pixelwise(ours_recon, recon_t, mean_tol=2e-5, max_tol=5e-3)
