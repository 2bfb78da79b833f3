"""Golden-numerics tests for inversion + h-Edit loops (SURVEY.md §4).

Central invariant: with cfg_tar == cfg_src_edit the h-Edit correction
``eps_tar - eps_src_edit`` vanishes, so the edited branch must reproduce the
inversion's reconstruction trajectory exactly — x0 back to ~1e-4 on a seeded
tiny UNet.  This is implicit in the reference math
(``p2p_h_edit.py:326,667``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hedit_tpu.core.schedule import Schedule
from hedit_tpu.edit.h_edit import HEditConfig, ef_sample, h_edit_r
from hedit_tpu.invert.ddim import invert_ddim
from hedit_tpu.invert.ddpm import invert_ddpm
from hedit_tpu.pipelines.sd import create_sd_pipeline

S = 10  # inference steps for tests


@pytest.fixture(scope="module")
def setup():
    pipe = create_sd_pipeline(tiny=True, num_inference_steps=S, seed=0)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32) * 0.2)
    uncond = jnp.asarray(rng.randn(1, 77, 32).astype(np.float32) * 0.1)
    src = jnp.asarray(rng.randn(1, 77, 32).astype(np.float32) * 0.1)
    tar = jnp.asarray(rng.randn(1, 77, 32).astype(np.float32) * 0.1)
    eps_fn = jax.jit(lambda x, t, c: pipe.unet_eps(x, t, c))
    return pipe.schedule, eps_fn, x0, uncond, src, tar


def test_ddpm_inversion_shapes_and_residuals(setup):
    sched, eps_fn, x0, uncond, src, tar = setup
    inv = invert_ddpm(
        eps_fn, sched, x0, uncond_ctx=uncond, src_ctx=src, cfg_scale_src=1.0,
        eta=1.0, rng=jax.random.PRNGKey(7), step_chunk=4,
    )
    assert inv.zs.shape == (S, 16, 16, 4)
    assert inv.xts.shape == (S + 1, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(inv.xts[0]), np.asarray(x0[0]), atol=1e-6)
    # residuals are roughly standard-normal scale (normalized by eta*sqrt(var))
    assert 0.2 < float(jnp.std(inv.zs)) < 5.0


def test_hedit_r_reconstruction_identity_implicit(setup):
    sched, eps_fn, x0, uncond, src, tar = setup
    inv = invert_ddpm(
        eps_fn, sched, x0, uncond_ctx=uncond, src_ctx=src, cfg_scale_src=1.0,
        eta=1.0, rng=jax.random.PRNGKey(3), step_chunk=5,
    )
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=3.0, cfg_tar=3.0, implicit=True)
    edited, _ = h_edit_r(
        eps_fn, sched, inv.xT, inv.zs, uncond_ctx=uncond, src_ctx=src,
        tar_ctx=src, cfg=cfg, after_skip_steps=S,
    )
    np.testing.assert_allclose(np.asarray(edited), np.asarray(x0), atol=2e-4)


def test_hedit_r_reconstruction_identity_explicit_and_multiopt(setup):
    sched, eps_fn, x0, uncond, src, tar = setup
    inv = invert_ddpm(
        eps_fn, sched, x0, uncond_ctx=uncond, src_ctx=src, cfg_scale_src=1.0,
        eta=1.0, rng=jax.random.PRNGKey(4), step_chunk=5,
    )
    for cfg in [
        HEditConfig(cfg_src=1.0, cfg_src_edit=2.0, cfg_tar=2.0, implicit=False),
        HEditConfig(cfg_src=1.0, cfg_src_edit=2.0, cfg_tar=2.0, implicit=True,
                    optimization_steps=3),
    ]:
        edited, _ = h_edit_r(
            eps_fn, sched, inv.xT, inv.zs, uncond_ctx=uncond, src_ctx=src,
            tar_ctx=src, cfg=cfg, after_skip_steps=S,
        )
        np.testing.assert_allclose(np.asarray(edited), np.asarray(x0), atol=2e-4)


def test_hedit_r_actually_edits(setup):
    sched, eps_fn, x0, uncond, src, tar = setup
    inv = invert_ddpm(
        eps_fn, sched, x0, uncond_ctx=uncond, src_ctx=src, cfg_scale_src=1.0,
        eta=1.0, rng=jax.random.PRNGKey(5), step_chunk=5,
    )
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=2.0, cfg_tar=4.0, implicit=True)
    edited, recon = h_edit_r(
        eps_fn, sched, inv.xT, inv.zs, uncond_ctx=uncond, src_ctx=src,
        tar_ctx=tar, cfg=cfg, after_skip_steps=S,
    )
    assert bool(jnp.isfinite(edited).all())
    assert float(jnp.abs(edited - x0).max()) > 1e-3  # it moved


def test_hedit_r_skip_path(setup):
    sched, eps_fn, x0, uncond, src, tar = setup
    inv = invert_ddpm(
        eps_fn, sched, x0, uncond_ctx=uncond, src_ctx=src, cfg_scale_src=1.0,
        eta=1.0, rng=jax.random.PRNGKey(6), step_chunk=5,
    )
    N = S - 3  # skip 3
    xT = inv.xts[N][None]
    cfg = HEditConfig(cfg_src=1.0, cfg_src_edit=2.0, cfg_tar=4.0, implicit=True)
    edited, _ = h_edit_r(
        eps_fn, sched, xT, inv.zs, uncond_ctx=uncond, src_ctx=src,
        tar_ctx=tar, cfg=cfg, after_skip_steps=N,
    )
    assert edited.shape == (1, 16, 16, 4)
    assert bool(jnp.isfinite(edited).all())


def test_ef_reconstruction_identity(setup):
    sched, eps_fn, x0, uncond, src, tar = setup
    inv = invert_ddpm(
        eps_fn, sched, x0, uncond_ctx=uncond, src_ctx=src, cfg_scale_src=2.0,
        eta=1.0, rng=jax.random.PRNGKey(8), step_chunk=5,
    )
    rec = ef_sample(
        eps_fn, sched, inv.xT, inv.zs, uncond_ctx=uncond, tar_ctx=src,
        cfg_tar=2.0, eta=1.0, after_skip_steps=S,
    )
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-3)


def test_ddim_inversion_reconstruction_identity(setup):
    sched, eps_fn, x0, uncond, src, tar = setup
    inv = invert_ddim(
        eps_fn, sched, x0, uncond_ctx=uncond, src_ctx=src, cfg_scale=1.5,
        step_chunk=5,
    )
    # eta=1 + un-normalized zs + is_ddim_inversion=True reproduces the
    # trajectory (main_p2p.py:164-165 convention)
    rec = ef_sample(
        eps_fn, sched, inv.xT, inv.zs, uncond_ctx=uncond, tar_ctx=src,
        cfg_tar=1.5, eta=1.0, after_skip_steps=S, is_ddim_inversion=True,
    )
    # atol: ~100 chained UNet evals amplify f32 reduction-order noise in the
    # (reshape-free) GroupNorm to ~1e-3; the identity itself is algebraic.
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=2e-3)
