"""Style workload + PnP baseline tests (tiny seeded models)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hedit_tpu.control.pnp import pnp_step_gates
from hedit_tpu.edit.h_edit import HEditConfig
from hedit_tpu.edit.pnp_baselines import (
    ef_or_pnp_inv_w_pnp,
    negative_prompt_pnp,
    nmg_pnp_loop,
    null_text_pnp,
)
from hedit_tpu.edit.style import ef_style, h_edit_style, make_style_step
from hedit_tpu.invert.ddim import invert_ddim
from hedit_tpu.invert.ddpm import invert_ddpm
from hedit_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionTower
from hedit_tpu.pipelines.sd import create_sd_pipeline
from hedit_tpu.rewards.clip_style import reference_gram, style_loss

S = 6


@pytest.fixture(scope="module")
def setup():
    pipe = create_sd_pipeline(tiny=True, num_inference_steps=S, seed=0)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32) * 0.2)
    uncond = jnp.asarray(rng.randn(1, 77, 32).astype(np.float32) * 0.1)
    src = jnp.asarray(rng.randn(1, 77, 32).astype(np.float32) * 0.1)
    tar = jnp.asarray(rng.randn(1, 77, 32).astype(np.float32) * 0.1)
    eps_plain = lambda x, t, c: pipe.unet_eps(x, t, c)  # noqa: E731
    eps_ctrl = lambda x, t, c, ctrl: pipe.unet_eps(x, t, c, ctrl)  # noqa: E731
    return pipe, eps_plain, eps_ctrl, x0, uncond, src, tar


def test_clip_vision_tower_taps():
    cfg = CLIPVisionConfig.tiny()
    tower = CLIPVisionTower(cfg)
    x = jnp.ones((1, 32, 32, 3)) * 0.1
    params = tower.init(jax.random.PRNGKey(0), x)
    emb, feats = tower.apply(params, x)
    assert emb.shape == (1, cfg.output_dim)
    assert len(feats) == cfg.layers
    assert feats[0].shape == (1, 17, cfg.width)  # 4x4 patches + CLS


def test_style_loss_zero_for_same_image():
    cfg = CLIPVisionConfig.tiny()
    tower = CLIPVisionTower(cfg)
    img01 = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32))
    params = tower.init(jax.random.PRNGKey(0), img01)
    apply = lambda x: tower.apply(params, x)  # noqa: E731
    ref = reference_gram(apply, img01)
    # gram of the same normalized image equals the reference -> zero residual
    from hedit_tpu.rewards.clip_style import CLIP_MEAN, CLIP_STD, gram_from_features

    x = (img01 - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    _, feats = apply(x)
    assert float(jnp.linalg.norm(gram_from_features(feats[2]) - ref)) < 1e-3


def test_h_edit_style_runs(setup):
    pipe, eps_plain, eps_ctrl, x0, uncond, src, tar = setup
    inv = invert_ddpm(eps_plain, pipe.schedule, x0, uncond_ctx=uncond,
                      src_ctx=src, cfg_scale_src=1.0, eta=1.0,
                      rng=jax.random.PRNGKey(3), step_chunk=3)
    vcfg = CLIPVisionConfig.tiny()
    tower = CLIPVisionTower(vcfg)
    style01 = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32))
    vp = tower.init(jax.random.PRNGKey(1), style01)
    vapply = lambda x: tower.apply(vp, x)  # noqa: E731
    ref_g = reference_gram(vapply, style01)

    def vae_dec(z):
        return pipe.vae_decode(z)

    style_fn = make_style_step(vae_dec, vapply, ref_g, pipe.schedule, 0.5, clip_size=32)

    from hedit_tpu.control.p2p import P2PControl

    ctrl = P2PControl(
        step=jnp.zeros((), jnp.int32), cross_alpha=jnp.zeros((S + 1, 77)),
        refine_mapper=jnp.arange(77), refine_alphas=jnp.ones(77),
        replace_mapper=jnp.eye(77), equalizer=jnp.ones(77), blend_px=16,
    )
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=2.0, cfg_tar=4.0, implicit=True)
    edited, _ = h_edit_style(
        eps_ctrl, pipe.schedule, inv.xT, inv.zs, uncond_ctx=uncond,
        src_ctx=src, tar_ctx=tar, cfg=cfg, after_skip_steps=S, control=ctrl,
        style_fn=style_fn,
    )
    assert bool(jnp.isfinite(edited).all())


def test_pnp_pair_and_np_baselines(setup):
    pipe, eps_plain, eps_ctrl, x0, uncond, src, tar = setup
    inv = invert_ddim(eps_plain, pipe.schedule, x0, uncond_ctx=uncond,
                      src_ctx=src, cfg_scale=1.0, step_chunk=3)
    qk, conv = pnp_step_gates(S, 0.35, 0.45)
    edited, recon = ef_or_pnp_inv_w_pnp(
        eps_ctrl, pipe.schedule, inv.xT, inv.zs, uncond_ctx=uncond,
        src_ctx=src, tar_ctx=tar, cfg_src=1.0, cfg_tar=4.0, eta=1.0,
        is_ddim_inversion=True, after_skip_steps=S, qk_mask=qk, conv_mask=conv,
    )
    assert bool(jnp.isfinite(edited).all())
    edited2, _ = negative_prompt_pnp(
        eps_ctrl, pipe.schedule, inv.xT, inv.zs, uncond_ctx=uncond,
        src_ctx=src, tar_ctx=tar, cfg_tar=4.0, after_skip_steps=S,
        qk_mask=qk, conv_mask=conv,
    )
    assert bool(jnp.isfinite(edited2).all())


def test_nmg_and_nulltext_pnp(setup):
    pipe, eps_plain, eps_ctrl, x0, uncond, src, tar = setup
    inv = invert_ddim(eps_plain, pipe.schedule, x0, uncond_ctx=uncond,
                      src_ctx=src, cfg_scale=1.0, step_chunk=3)
    qk, conv = pnp_step_gates(S, 0.35, 0.45)
    edited, _ = nmg_pnp_loop(
        eps_ctrl, pipe.schedule, inv.xT, inv.xts[: S + 1], inv.zs,
        uncond_ctx=uncond, src_ctx=src, tar_ctx=tar, cfg_tar=4.0,
        after_skip_steps=S, qk_mask=qk, conv_mask=conv,
    )
    assert bool(jnp.isfinite(edited).all())
    edited2, _ = null_text_pnp(
        eps_ctrl, pipe.schedule, inv.xT, inv.xts[: S + 1], inv.zs,
        uncond_ctx=uncond, src_ctx=src, tar_ctx=tar, cfg_tar=4.0,
        after_skip_steps=S, qk_mask=qk, conv_mask=conv, optimization_steps=2,
    )
    assert bool(jnp.isfinite(edited2).all())


def test_ef_pnp_xts_indexed_source_equivalence(setup):
    """PnP EF baseline: indexed source branch (3 rows/step) must match the
    4-row recompute path; recon is the stored trajectory endpoint exactly."""
    from hedit_tpu.control.pnp import pnp_step_gates
    from hedit_tpu.edit.pnp_baselines import ef_or_pnp_inv_w_pnp
    from hedit_tpu.invert.ddpm import invert_ddpm

    pipe, eps_plain, eps_fn, x0, uncond, src, tar = setup
    inv = invert_ddpm(eps_plain, pipe.schedule, x0, uncond_ctx=uncond,
                      src_ctx=src, cfg_scale_src=1.0, eta=1.0,
                      rng=jax.random.PRNGKey(3), step_chunk=3)
    qk, conv = pnp_step_gates(S, 0.5, 0.5)
    kw = dict(uncond_ctx=uncond, src_ctx=src, tar_ctx=tar, cfg_src=1.0,
              cfg_tar=4.0, eta=1.0, is_ddim_inversion=False,
              after_skip_steps=S, qk_mask=qk, conv_mask=conv)
    edited_a, recon_a = ef_or_pnp_inv_w_pnp(eps_fn, pipe.schedule, inv.xT,
                                            inv.zs, **kw)
    edited_b, recon_b = ef_or_pnp_inv_w_pnp(eps_fn, pipe.schedule, inv.xT,
                                            inv.zs, xts=inv.xts[: S + 1], **kw)
    np.testing.assert_allclose(np.asarray(edited_b), np.asarray(edited_a),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(recon_b),
                               np.asarray(inv.xts[0][None]), atol=1e-6)


def test_ef_pnp_derive_zs_equivalence(setup):
    """PnP EF inversion-free stepping matches the xts path with real zs."""
    from hedit_tpu.control.pnp import pnp_step_gates
    from hedit_tpu.edit.pnp_baselines import ef_or_pnp_inv_w_pnp
    from hedit_tpu.invert.ddpm import invert_ddpm

    pipe, eps_plain, eps_fn, x0, uncond, src, tar = setup
    inv = invert_ddpm(eps_plain, pipe.schedule, x0, uncond_ctx=uncond,
                      src_ctx=src, cfg_scale_src=1.0, eta=1.0,
                      rng=jax.random.PRNGKey(3), step_chunk=3)
    qk, conv = pnp_step_gates(S, 0.5, 0.5)
    kw = dict(uncond_ctx=uncond, src_ctx=src, tar_ctx=tar, cfg_src=1.0,
              cfg_tar=4.0, eta=1.0, is_ddim_inversion=False,
              after_skip_steps=S, qk_mask=qk, conv_mask=conv,
              xts=inv.xts[: S + 1])
    edited_a, _ = ef_or_pnp_inv_w_pnp(eps_fn, pipe.schedule, inv.xT, inv.zs,
                                      **kw)
    edited_b, _ = ef_or_pnp_inv_w_pnp(eps_fn, pipe.schedule, inv.xT, None,
                                      derive_zs=True, **kw)
    # batching-drift tolerance — see test_ef_p2p_derive_zs_equivalence
    np.testing.assert_allclose(np.asarray(edited_b), np.asarray(edited_a),
                               atol=5e-3)


def test_style_runner_matches_scan(setup):
    """The hostloop style runner (per-step executables, the axon
    remote-compile path) must reproduce h_edit_style's fused scan on the
    same sampled trajectory (derive_zs config)."""
    pipe, eps_plain, eps_ctrl, x0, uncond, src, tar = setup
    from hedit_tpu.control.p2p import P2PControl
    from hedit_tpu.edit.style import make_style_runner
    from hedit_tpu.invert.ddpm import sample_xts_from_x0

    vcfg = CLIPVisionConfig.tiny()
    tower = CLIPVisionTower(vcfg)
    style01 = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32))
    vp = tower.init(jax.random.PRNGKey(1), style01)
    vapply = lambda x: tower.apply(vp, x)  # noqa: E731
    ref_g = reference_gram(vapply, style01)
    vae_dec = lambda z: pipe.vae_decode(z)  # noqa: E731

    ctrl = P2PControl(
        step=jnp.zeros((), jnp.int32), cross_alpha=jnp.zeros((S + 1, 77)),
        refine_mapper=jnp.arange(77), refine_alphas=jnp.ones(77),
        replace_mapper=jnp.eye(77), equalizer=jnp.ones(77), blend_px=16,
        cond_start=2,
    )
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=2.0, cfg_tar=4.0, implicit=True)
    run = make_style_runner(
        pipe.unet, vae_dec, vapply, pipe.schedule, cfg,
        after_skip_steps=S, weight_edit_clip=0.5, clip_size=32,
    )
    ctx4c = jnp.concatenate([uncond, src, src, tar], axis=0)
    rng = jax.random.PRNGKey(7)
    out = run(pipe.unet_params, x0, ctx4c, ctrl, rng, ref_g)

    # scan form on the identical trajectory (derive_zs, indexed source)
    xts, _ = sample_xts_from_x0(pipe.schedule, x0, rng)
    style_fn = make_style_step(vae_dec, vapply, ref_g, pipe.schedule, 0.5,
                               clip_size=32)
    edited, _ = h_edit_style(
        eps_ctrl, pipe.schedule, xts[S][None], None, uncond_ctx=uncond,
        src_ctx=src, tar_ctx=tar, cfg=cfg, after_skip_steps=S, control=ctrl,
        style_fn=style_fn, xts=xts[: S + 1], derive_zs=True,
    )
    d = np.abs(np.asarray(out) - np.asarray(edited))
    assert d.mean() < 3e-4 and d.max() < 3e-3, (d.mean(), d.max())
