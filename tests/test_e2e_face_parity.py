"""END-TO-END cross-framework parity of the face-swap editing loops.

The component ports are individually activation-parity-tested
(tests/test_torch_parity.py); what those tests cannot catch is loop-level
drift — zs indexing (the reference's t_to_idx gymnastics), the eta=0.5
split, Tweedie-with-frozen-eps gradient semantics, rho scaling, mask
application, and the last-step quirks.  Here the reference's OWN torch code
(``face-swapping/inversion/{sde_inversion,h_edit_R,ef}.py``) runs a full
tiny-model edit on CPU; the trajectory is captured in the torch-NCHW npz
format, injected through ``io_utils.trajectory.load_trajectory``, and our
``h_edit_r_face`` / ``ef_face`` must reproduce the reference's edited output
pixel-for-pixel (float32 tolerance).

Reward critics are tiny conv+linear surrogates instantiated in torch and
mirrored weight-exactly in JAX — the reward NETWORKS have their own parity
tests; these loops need only identical differentiable critics on both sides.
"""

import pytest as _pytest_mod
pytestmark = _pytest_mod.mark.slow  # heavy lane; fast lane = -m "not slow"

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_t = torch.nn

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_torch_parity import (  # noqa: E402
    _load_ref_module,
    _nchw,
    _randomize,
    _state_np,
    needs_reference,
)

S = 5
W_EDIT = 3.0


class _TinyCritic(nn_t.Module):
    """conv(3->4, s2) + silu + linear -> 8-dim embedding."""

    def __init__(self):
        super().__init__()
        self.conv = nn_t.Conv2d(3, 4, 3, stride=2, padding=1)
        self.fc = nn_t.Linear(4 * 8 * 8, 8)

    def emb(self, x):
        h = torch.nn.functional.silu(self.conv(x))
        return self.fc(h.flatten(1))


class _IDWrap:
    """get_cosine_loss(x0_pred) = 1 - cos(emb(x), emb_ref), the IDLoss
    surface consumed by the reference loops (arcface_model.py:48-67)."""

    def __init__(self, critic, ref_img):
        self.critic = critic
        with torch.no_grad():
            self.emb_ref = critic.emb(ref_img)

    def get_cosine_loss(self, x):
        e = self.critic.emb(x)
        cos = torch.nn.functional.cosine_similarity(e, self.emb_ref, dim=1)
        return (1.0 - cos).mean()


class _LPIPSWrap:
    """get_lpips_loss(x0_pred) = mse(emb(x), emb_src)."""

    def __init__(self, critic, src_img):
        self.critic = critic
        with torch.no_grad():
            self.emb_src = critic.emb(src_img)

    def get_lpips_loss(self, x):
        return ((self.critic.emb(x) - self.emb_src) ** 2).mean()


def _jax_critic(critic):
    """Weight-exact JAX mirror of _TinyCritic.emb (torch flatten order is
    channel-major, so transpose NHWC activations back to NCHW pre-flatten)."""
    w_conv = jnp.asarray(
        critic.conv.weight.detach().numpy().transpose(2, 3, 1, 0))  # HWIO
    b_conv = jnp.asarray(critic.conv.bias.detach().numpy())
    w_fc = jnp.asarray(critic.fc.weight.detach().numpy())  # [8, 256]
    b_fc = jnp.asarray(critic.fc.bias.detach().numpy())

    def emb(x_nhwc):
        h = jax.lax.conv_general_dilated(
            x_nhwc, w_conv, window_strides=(2, 2),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_conv
        h = jax.nn.silu(h)
        h = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
        return h @ w_fc.T + b_fc

    return emb


def _cos_loss_jax(emb_fn, emb_ref):
    def loss(x):
        e = emb_fn(x)
        na = jnp.linalg.norm(e, axis=1)
        nb = jnp.linalg.norm(emb_ref, axis=1)
        cos = jnp.sum(e * emb_ref, axis=1) / jnp.maximum(na * nb, 1e-8)
        return jnp.mean(1.0 - cos)

    return loss


def _mse_loss_jax(emb_fn, emb_src):
    return lambda x: jnp.mean((emb_fn(x) - emb_src) ** 2)


@pytest.fixture(scope="module")
def e2e_setup(tmp_path_factory):
    """Tiny reference model + captured reference trajectory + both critics."""
    ref_diff = _load_ref_module(
        "ref_ddpm_diffusion_e2e", "face-swapping/diffusion/diffusion.py")
    ref_sde = _load_ref_module(
        "ref_sde_inv_e2e", "face-swapping/inversion/sde_inversion.py")

    cfg_dict = {
        "type": "simple", "in_channels": 3, "out_ch": 3, "ch": 32,
        "ch_mult": [1, 2], "num_res_blocks": 2, "attn_resolutions": [8],
        "dropout": 0.0, "resamp_with_conv": True, "image_size": 16,
        "num_diffusion_timesteps": 10,
    }
    tm = ref_diff.Model(cfg_dict)
    _randomize(tm, 0)

    # the reference driver's schedule glue (main_edit.py:128-142)
    betas_t = torch.from_numpy(
        np.linspace(1e-4, 2e-2, 1000, dtype=np.float64)).float()
    seq = (np.arange(0, 1000, 1000 // S) + 1)[::-1].copy()

    rng = np.random.RandomState(7)
    x0 = rng.randn(1, 16, 16, 3).astype(np.float32) * 0.3
    x0_t = _nchw(x0)

    _, zs_t, xts_t, _ = ref_sde.inversion_forward_process_sde(
        tm, x0_t, betas_t, list(seq), etas=1.0, num_inference_steps=S,
        device="cpu",
    )

    # capture in the reference-side (torch NCHW, batchless) npz layout
    npz = tmp_path_factory.mktemp("traj") / "face_traj.npz"
    np.savez(npz, xts=xts_t.detach().numpy(), zs=zs_t.detach().numpy(),
             num_steps=S)

    torch.manual_seed(11)
    id_critic, lp_critic = _TinyCritic(), _TinyCritic()
    ref_img = _nchw(rng.randn(1, 16, 16, 3).astype(np.float32) * 0.3)
    idw = _IDWrap(id_critic, ref_img)
    lpw = _LPIPSWrap(lp_critic, x0_t)

    # our side: converted model + schedule + injected trajectory
    from hedit_tpu.core.schedule import Schedule
    from hedit_tpu.io_utils.trajectory import load_trajectory
    from hedit_tpu.models.ddpm_unet import DDPMConfig, DDPMUNet, convert_ddpm_ckpt

    params = convert_ddpm_ckpt(_state_np(tm))
    model = DDPMUNet(DDPMConfig.tiny())
    eps_fn = lambda x, t: model.apply(params, x, t)  # noqa: E731
    sched = Schedule.create(S, beta_schedule="linear", beta_start=1e-4,
                            beta_end=2e-2)
    np.testing.assert_array_equal(np.asarray(sched.timesteps), seq)

    traj = load_trajectory(str(npz), expect_steps=S)
    id_j = _cos_loss_jax(_jax_critic(id_critic),
                         jnp.asarray(idw.emb_ref.detach().numpy()))
    lp_j = _mse_loss_jax(_jax_critic(lp_critic),
                         jnp.asarray(lpw.emb_src.detach().numpy()))

    mask = (rng.rand(1, 1, 16, 16) > 0.4).astype(np.float32)
    return dict(
        tm=tm, betas_t=betas_t, seq=list(seq), zs_t=zs_t, xts_t=xts_t,
        idw=idw, lpw=lpw, eps_fn=eps_fn, sched=sched, traj=traj,
        id_j=id_j, lp_j=lp_j, mask=mask,
    )


@needs_reference
def test_critics_match(e2e_setup):
    s = e2e_setup
    rng = np.random.RandomState(3)
    x = rng.randn(1, 16, 16, 3).astype(np.float32)
    ours_id = float(s["id_j"](jnp.asarray(x)))
    ours_lp = float(s["lp_j"](jnp.asarray(x)))
    theirs_id = float(s["idw"].get_cosine_loss(_nchw(x)).detach())
    theirs_lp = float(s["lpw"].get_lpips_loss(_nchw(x)).detach())
    np.testing.assert_allclose(ours_id, theirs_id, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours_lp, theirs_lp, rtol=1e-5, atol=1e-6)


@needs_reference
def test_h_edit_r_face_matches_reference_end_to_end(e2e_setup):
    s = e2e_setup
    ref_hedit = _load_ref_module(
        "ref_h_edit_R_e2e", "face-swapping/inversion/h_edit_R.py")

    mask_t = torch.from_numpy(s["mask"])
    edited_t = ref_hedit.h_Edit_R(
        s["tm"], s["lpw"], s["idw"], s["xts_t"][S], s["betas_t"], s["seq"],
        eta=1.0, zs=s["zs_t"][:S], weight_edit_face=W_EDIT,
        optimization_steps=2, after_skip_steps=S, num_inference_steps=S,
        soft_face_mask=mask_t,
    )
    theirs = edited_t.detach().numpy().transpose(0, 2, 3, 1)

    from hedit_tpu.edit.face_swap import h_edit_r_face

    mask_j = jnp.asarray(s["mask"].transpose(0, 2, 3, 1))
    ours = np.asarray(h_edit_r_face(
        s["eps_fn"], s["sched"], s["traj"].xts[S][None], s["traj"].zs,
        id_loss_fn=s["id_j"], lpips_loss_fn=s["lp_j"],
        weight_edit_face=W_EDIT, optimization_steps=2, after_skip_steps=S,
        soft_face_mask=mask_j,
    ))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@needs_reference
def test_ef_face_matches_reference_end_to_end(e2e_setup):
    """EF takes its reward gradients at x_t THROUGH the UNet — this A/Bs
    torch autograd through the reference Model against jax.grad through the
    converted Flax model, over the whole edit."""
    s = e2e_setup
    ref_ef = _load_ref_module("ref_ef_e2e", "face-swapping/inversion/ef.py")

    xT_t = s["xts_t"][S].clone().unsqueeze(0).requires_grad_(True)
    edited_t = ref_ef.ef(
        s["tm"], s["lpw"], s["idw"], xT_t, s["betas_t"], s["seq"],
        eta=1.0, zs=s["zs_t"][:S], weight_edit_face=W_EDIT,
        after_skip_steps=S, num_inference_steps=S, soft_face_mask=None,
    )
    theirs = edited_t.detach().numpy().transpose(0, 2, 3, 1)

    from hedit_tpu.edit.face_swap import ef_face

    ours = np.asarray(ef_face(
        s["eps_fn"], s["sched"], s["traj"].xts[S][None], s["traj"].zs,
        id_loss_fn=s["id_j"], lpips_loss_fn=s["lp_j"],
        weight_edit_face=W_EDIT, after_skip_steps=S,
    ))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-5)
