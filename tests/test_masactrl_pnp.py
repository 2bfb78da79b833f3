"""MasaCtrl + PnP control tests: remap semantics, injection gating, and the
reconstruction-identity invariant of the controlled h-Edit loops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hedit_tpu.control.base import LayerTag
from hedit_tpu.control.masactrl import MasaCtrlControl
from hedit_tpu.control.pnp import PNP_CONV_SITE, PnPControl, pnp_step_gates
from hedit_tpu.edit.h_edit import HEditConfig
from hedit_tpu.edit.h_edit_ctrl import h_edit_masactrl, h_edit_pnp
from hedit_tpu.invert.ddpm import invert_ddpm
from hedit_tpu.pipelines.sd import create_sd_pipeline

S = 8


def test_masactrl_kv_remap():
    ctrl = MasaCtrlControl(step=jnp.array(5), start_step=4, start_layer=2)
    tag_on = LayerTag(place="up", is_cross=False, num_pixels=16, index=6)  # pair 3
    tag_off_layer = LayerTag(place="down", is_cross=False, num_pixels=16, index=2)  # pair 1
    tag_cross = LayerTag(place="up", is_cross=True, num_pixels=16, index=7)
    q = jnp.arange(4 * 2 * 4 * 8, dtype=jnp.float32).reshape(4, 2, 4, 8)
    k = q + 100
    v = q + 200
    q2, k2, v2 = ctrl.map_qkv(q, k, v, tag_on)
    # both rows of each half use the half's first row k/v
    np.testing.assert_allclose(np.asarray(k2[1]), np.asarray(k[0]))
    np.testing.assert_allclose(np.asarray(k2[3]), np.asarray(k[2]))
    np.testing.assert_allclose(np.asarray(v2[1]), np.asarray(v[0]))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q))  # queries untouched
    # outside step window -> identity
    ctrl_early = MasaCtrlControl(step=jnp.array(1), start_step=4, start_layer=2)
    _, k3, _ = ctrl_early.map_qkv(q, k, v, tag_on)
    np.testing.assert_allclose(np.asarray(k3), np.asarray(k))
    # below start_layer or cross -> identity
    _, k4, _ = ctrl.map_qkv(q, k, v, tag_off_layer)
    np.testing.assert_allclose(np.asarray(k4), np.asarray(k))
    _, k5, _ = ctrl.map_qkv(q, k, v, tag_cross)
    np.testing.assert_allclose(np.asarray(k5), np.asarray(k))


def test_pnp_qk_injection_and_conv():
    ctrl = PnPControl(qk_on=jnp.array(True), conv_on=jnp.array(False))
    tag_site = LayerTag(place="up", is_cross=False, num_pixels=16, index=10,
                        up_block_index=2, inner_index=1)
    tag_other = LayerTag(place="up", is_cross=False, num_pixels=16, index=8,
                         up_block_index=1, inner_index=0)
    q = jnp.stack([jnp.zeros((2, 4, 8)), jnp.ones((2, 4, 8))])
    k, v = q + 2, q + 4
    q2, k2, v2 = ctrl.map_qkv(q, k, v, tag_site)
    np.testing.assert_allclose(np.asarray(q2[1]), np.asarray(q[0]))
    np.testing.assert_allclose(np.asarray(k2[1]), np.asarray(k[0]))
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v))  # v untouched
    # non-listed site -> identity
    q3, _, _ = ctrl.map_qkv(q, k, v, tag_other)
    np.testing.assert_allclose(np.asarray(q3), np.asarray(q))
    # conv injection honors its own gate
    h = jnp.stack([jnp.zeros((4, 4, 8)), jnp.ones((4, 4, 8))])
    np.testing.assert_allclose(np.asarray(ctrl.map_features(h, PNP_CONV_SITE)),
                               np.asarray(h))  # conv_on=False
    ctrl2 = PnPControl(qk_on=jnp.array(False), conv_on=jnp.array(True))
    h2 = ctrl2.map_features(h, PNP_CONV_SITE)
    np.testing.assert_allclose(np.asarray(h2[1]), np.asarray(h[0]))


def test_pnp_step_gates():
    qk, conv = pnp_step_gates(10, 0.35, 0.45)
    assert qk.sum() == 3 and conv.sum() == 4
    assert bool(qk[0]) and not bool(qk[3])


@pytest.fixture(scope="module")
def tiny_setup():
    pipe = create_sd_pipeline(tiny=True, num_inference_steps=S, seed=0)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32) * 0.2)
    uncond = jnp.asarray(rng.randn(1, 77, 32).astype(np.float32) * 0.1)
    src = jnp.asarray(rng.randn(1, 77, 32).astype(np.float32) * 0.1)
    tar = jnp.asarray(rng.randn(1, 77, 32).astype(np.float32) * 0.1)
    eps_fn = lambda x, t, c, ctrl=None: (  # noqa: E731
        pipe.unet_eps(x, t, c) if ctrl is None else pipe.unet_eps(x, t, c, ctrl)
    )
    inv = invert_ddpm(
        lambda x, t, c: pipe.unet_eps(x, t, c), pipe.schedule, x0,
        uncond_ctx=uncond, src_ctx=src, cfg_scale_src=1.0, eta=1.0,
        rng=jax.random.PRNGKey(3), step_chunk=4,
    )
    return pipe, eps_fn, x0, uncond, src, tar, inv


def test_masactrl_hedit_identity_when_disabled(tiny_setup):
    pipe, eps_fn, x0, uncond, src, tar, inv = tiny_setup
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=2.0, cfg_tar=2.0)
    # start_step beyond N -> editor never fires; tar==src -> correction == 0
    edited, _ = h_edit_masactrl(
        eps_fn, pipe.schedule, inv.xT, inv.zs, uncond_ctx=uncond, src_ctx=src,
        tar_ctx=src, cfg=cfg, after_skip_steps=S, start_step=S + 1, start_layer=0,
    )
    np.testing.assert_allclose(np.asarray(edited), np.asarray(x0), atol=1e-3)


def test_masactrl_hedit_runs_active(tiny_setup):
    pipe, eps_fn, x0, uncond, src, tar, inv = tiny_setup
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=2.0, cfg_tar=4.0)
    edited, _ = h_edit_masactrl(
        eps_fn, pipe.schedule, inv.xT, inv.zs, uncond_ctx=uncond,
        src_ctx=uncond,  # MasaCtrl null-source convention (main_masactrl.py:180)
        tar_ctx=tar, cfg=cfg, after_skip_steps=S, start_step=2, start_layer=2,
    )
    assert bool(jnp.isfinite(edited).all())
    assert float(jnp.abs(edited - x0).max()) > 1e-3


def test_pnp_hedit_identity_when_disabled(tiny_setup):
    pipe, eps_fn, x0, uncond, src, tar, inv = tiny_setup
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=2.0, cfg_tar=2.0)
    qk, conv = pnp_step_gates(S, 0.0, 0.0)
    edited, _ = h_edit_pnp(
        eps_fn, pipe.schedule, inv.xT, inv.zs, uncond_ctx=uncond, src_ctx=src,
        tar_ctx=src, cfg=cfg, after_skip_steps=S, qk_mask=qk, conv_mask=conv,
    )
    np.testing.assert_allclose(np.asarray(edited), np.asarray(x0), atol=1e-3)


def test_pnp_hedit_runs_active(tiny_setup):
    pipe, eps_fn, x0, uncond, src, tar, inv = tiny_setup
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=2.0, cfg_tar=4.0)
    qk, conv = pnp_step_gates(S, 0.35, 0.45)
    edited, _ = h_edit_pnp(
        eps_fn, pipe.schedule, inv.xT, inv.zs, uncond_ctx=uncond, src_ctx=src,
        tar_ctx=tar, cfg=cfg, after_skip_steps=S, qk_mask=qk, conv_mask=conv,
    )
    assert bool(jnp.isfinite(edited).all())
    assert float(jnp.abs(edited - x0).max()) > 1e-3
