"""END-TO-END cross-framework parity of the Plug-and-Play editing loops.

Runs the reference's OWN ``plug_n_play/pnp_utils.py`` monkey-patch
registration (q/k injection at the 8 decoder attn1 sites, conv-feature
injection at up_blocks[1].resnets[1]) and its OWN loops —
``inversion/pnp_h_edit.py:h_Edit_PnP_implicit`` and every
``inversion/pnp_baselines.py`` method — on the torch SD UNet replica,
against our functional ``PnPControl`` (batch-row ``where`` remaps gated by
step masks instead of ``register_time`` module attributes) driving
``h_edit_pnp`` / ``edit/pnp_baselines.py``.

The replica's attention modules get the diffusers ``Attention`` API the
reference patch expects (``head_to_batch_dim``/``batch_to_head_dim``/
``scale``); the injected resnet gets the diffusers ``ResnetBlock2D``
attribute surface its patched forward reads (``pnp_utils.py:95-155``).
Both are attribute shims only — the forward code that runs IS the
reference's.

Notably certified here: the reference gates injection on the time the UNet
is CALLED at — the h-Edit correction pair runs at ``tt`` (``pnp_h_edit.py``
``register_time(model, tt)``), i.e. the schedule-membership test is
``i+1 < int(N*frac)``, not ``i < int(N*frac)``; the baselines' pair calls
run at ``t``.  Our step masks must reproduce both.
"""

import pytest as _pytest_mod
pytestmark = _pytest_mod.mark.slow  # heavy lane; fast lane = -m "not slow"

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_t = torch.nn
import torch.nn.functional as F_t  # noqa: E402
import types  # noqa: E402
from types import SimpleNamespace  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from test_e2e_text_parity import (  # noqa: E402
    _install_shims,
    _TextEnc,
    _Tok,
    _UNetWrap,
    assert_close_pixelwise,
)
from test_torch_parity import _load_ref_module, _randomize, _state_np, needs_reference  # noqa: E402
from test_torch_parity_sd import _TorchSDUNet  # noqa: E402

S = 6
ATTN_T, F_T = 0.5, 0.7   # M_qk = 3, M_conv = 4 of 6 steps: gates flip mid-loop
PROMPTS = ["a cat on grass", "a dog on grass"]


def _attach_diffusers_attn_api(attn):
    """The reference ``sa_forward`` expects the diffusers Attention surface."""
    H, D = attn.heads, attn.dim_head
    attn.scale = D ** -0.5

    def h2b(self, t):
        B, L, _ = t.shape
        return t.reshape(B, L, H, D).permute(0, 2, 1, 3).reshape(B * H, L, D)

    def b2h(self, t):
        BH, L, _ = t.shape
        B = BH // H
        return t.reshape(B, H, L, D).permute(0, 2, 1, 3).reshape(B, L, H * D)

    attn.head_to_batch_dim = types.MethodType(h2b, attn)
    attn.batch_to_head_dim = types.MethodType(b2h, attn)


def _attach_diffusers_resnet_api(rn):
    """Attribute surface read by the reference's patched conv forward
    (``pnp_utils.py:95-155``); numerically identical to the replica's own
    forward (dropout is eval-mode identity, output_scale_factor 1)."""
    rn.nonlinearity = F_t.silu
    rn.upsample = None
    rn.downsample = None
    rn.time_embedding_norm = "default"
    rn.dropout = nn_t.Identity()
    rn.output_scale_factor = 1.0
    if not hasattr(rn, "conv_shortcut"):
        rn.conv_shortcut = None


@pytest.fixture(scope="module")
def pnp_setup():
    _install_shims()
    ref_pnp_utils = _load_ref_module(
        "ref_pnp_utils_e2e", "text-guided/plug_n_play/pnp_utils.py")
    ref_hedit = _load_ref_module(
        "ref_pnp_h_edit_e2e", "text-guided/inversion/pnp_h_edit.py")
    ref_base = _load_ref_module(
        "ref_pnp_baselines_e2e", "text-guided/inversion/pnp_baselines.py")
    ref_ddpm = _load_ref_module(
        "ref_ddpm_inv_pnp", "text-guided/inversion/ddpm_inversion.py")
    ref_ddim = _load_ref_module(
        "ref_ddim_inv_pnp", "text-guided/inversion/ddim_inversion.py")

    tm = _TorchSDUNet()
    _randomize(tm, 20)

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
    wrap = _UNetWrap(tm, 16)
    # register_time walks these through ``model.unet`` (shared submodules)
    wrap.up_blocks = tm.up_blocks
    wrap.down_blocks = tm.down_blocks
    wrap.mid_block = tm.mid_block
    pipe = SimpleNamespace(
        unet=wrap, scheduler=fake_sched, tokenizer=_Tok(),
        text_encoder=_TextEnc(), device=torch.device("cpu"),
    )

    rng = np.random.RandomState(4)
    w0 = rng.randn(1, 4, 16, 16).astype(np.float32) * 0.3

    # inversions BEFORE registration (matches main_plugnplay.py ordering:
    # inversion :180, registration :196-197)
    torch.manual_seed(123)
    _, zs_ddpm, xts_ddpm, _ = ref_ddpm.inversion_forward_process_ddpm(
        pipe, torch.from_numpy(w0), etas=1.0, prog_bar=False,
        prompt=PROMPTS[0], cfg_scale_src=1.0, num_inference_steps=S,
    )
    with torch.no_grad():
        _, zs_ddim, lat_ddim = ref_ddim.ddim_inversion(
            pipe, torch.from_numpy(w0), PROMPTS[0], 1.0)
    xts_ddim = torch.cat(lat_ddim)

    # the reference's own registration on the replica (attribute shims only)
    for res, blocks in {1: [1, 2], 2: [0, 1, 2], 3: [0, 1, 2]}.items():
        for b in blocks:
            _attach_diffusers_attn_api(
                tm.up_blocks[res].attentions[b].transformer_blocks[0].attn1)
    _attach_diffusers_resnet_api(tm.up_blocks[1].resnets[1])
    qk_ts = fake_sched.timesteps[: int(S * ATTN_T)]
    conv_ts = fake_sched.timesteps[: int(S * F_T)]
    ref_pnp_utils.register_attention_control_efficient(
        SimpleNamespace(unet=tm), qk_ts)
    ref_pnp_utils.register_conv_control_efficient(
        SimpleNamespace(unet=tm), conv_ts)

    # our side
    from hedit_tpu.control.pnp import pnp_step_gates
    from hedit_tpu.io_utils.weights import convert_unet
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig

    params = convert_unet(_state_np(tm))
    model = UNet2DCondition(UNetConfig.tiny())

    def eps_fn(x, t, c, ctrl):
        return model.apply(params, x, t, c, ctrl)

    def ctx_of(prompt):
        ids = pipe.tokenizer(prompt).input_ids
        with torch.no_grad():
            return jnp.asarray(pipe.text_encoder(ids)[0].numpy())

    qk_mask, conv_mask = pnp_step_gates(S, ATTN_T, F_T)

    def as_ours(x_t):
        return jnp.asarray(x_t.detach().numpy().transpose(0, 2, 3, 1))

    return dict(
        pipe=pipe, ref_hedit=ref_hedit, ref_base=ref_base, sched=sched,
        eps_fn=eps_fn, qk_mask=qk_mask, conv_mask=conv_mask, as_ours=as_ours,
        zs_ddpm=zs_ddpm, xts_ddpm=xts_ddpm, zs_ddim=zs_ddim, xts_ddim=xts_ddim,
        uncond=ctx_of(""), src=ctx_of(PROMPTS[0]), tar=ctx_of(PROMPTS[1]),
    )


def _traj(s, is_ddim):
    if is_ddim:
        return s["zs_ddim"], s["xts_ddim"]
    return s["zs_ddpm"], s["xts_ddpm"]


@needs_reference
@pytest.mark.parametrize("cfg_src,is_ddim,opt_steps", [
    (1.0, False, 1),   # h-Edit-R + PnP (fused single-row base)
    (1.3, False, 2),   # batch-4 CFG base path, multi-opt
    (1.0, True, 1),    # h-Edit-D + PnP (un-normalized zs, DDIM reverse_step)
])
def test_h_edit_pnp_matches_reference(pnp_setup, cfg_src, is_ddim, opt_steps):
    s = pnp_setup
    zs_t, xts_t = _traj(s, is_ddim)
    edited_t, recon_t = s["ref_hedit"].h_Edit_PnP_implicit(
        s["pipe"], xts_t[S], eta=1.0, prompts=PROMPTS,
        cfg_scales=[cfg_src, 3.0, 5.0], zs=zs_t,
        optimization_steps=opt_steps, after_skip_steps=S,
        is_ddim_inversion=is_ddim,
    )

    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.edit.h_edit_ctrl import h_edit_pnp

    cfg = HEditConfig(cfg_src=cfg_src, cfg_src_edit=3.0, cfg_tar=5.0,
                      implicit=True, optimization_steps=opt_steps,
                      is_ddim_inversion=is_ddim)
    ours_edit, ours_recon = h_edit_pnp(
        s["eps_fn"], s["sched"], s["as_ours"](xts_t[S][None]),
        jnp.asarray(zs_t.numpy().transpose(0, 2, 3, 1)),
        uncond_ctx=s["uncond"], src_ctx=s["src"], tar_ctx=s["tar"], cfg=cfg,
        after_skip_steps=S, qk_mask=s["qk_mask"], conv_mask=s["conv_mask"],
    )
    assert_close_pixelwise(ours_edit, edited_t)
    assert_close_pixelwise(ours_recon, recon_t)


@needs_reference
@pytest.mark.parametrize("is_ddim", [False, True])  # EF / PnP-Inv
def test_ef_or_pnp_inv_w_pnp_matches_reference(pnp_setup, is_ddim):
    s = pnp_setup
    zs_t, xts_t = _traj(s, is_ddim)
    # the reference asserts etas == 0 for this loop (pnp_baselines.py:340)
    edited_t, recon_t = s["ref_base"].ef_or_pnp_inv_w_pnp(
        s["pipe"], xT=xts_t[S], etas=0, prompts=PROMPTS,
        cfg_scales=[1.0, 5.0], zs=zs_t, is_ddim_inversion=is_ddim,
    )

    from hedit_tpu.edit.pnp_baselines import ef_or_pnp_inv_w_pnp

    ours_edit, ours_recon = ef_or_pnp_inv_w_pnp(
        s["eps_fn"], s["sched"], s["as_ours"](xts_t[S][None]),
        jnp.asarray(zs_t.numpy().transpose(0, 2, 3, 1)),
        uncond_ctx=s["uncond"], src_ctx=s["src"], tar_ctx=s["tar"],
        cfg_src=1.0, cfg_tar=5.0, eta=0.0, is_ddim_inversion=is_ddim,
        after_skip_steps=S, qk_mask=s["qk_mask"], conv_mask=s["conv_mask"],
    )
    assert_close_pixelwise(ours_edit, edited_t)
    assert_close_pixelwise(ours_recon, recon_t)


@needs_reference
def test_nmg_pnp_matches_reference(pnp_setup):
    s = pnp_setup
    zs_t, xts_t = _traj(s, True)
    # grad_scale 5.0 (not 5e3): the reference default amplifies f32
    # cross-framework VJP drift ~5e4x (see test_e2e_baselines_parity.py)
    edited_t, recon_t = s["ref_base"].nmg_pnp(
        s["pipe"], xT=xts_t[S], xT_ori=xts_t[: S + 1], etas=0,
        prompts=PROMPTS, cfg_scales=[1.0, 5.0], zs=zs_t,
        guidance_noise_map=10.0, grad_scale=5.0,
    )

    from hedit_tpu.edit.pnp_baselines import nmg_pnp_loop

    ours_edit, ours_recon = nmg_pnp_loop(
        s["eps_fn"], s["sched"], s["as_ours"](xts_t[S][None]),
        jnp.asarray(xts_t[: S + 1].numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(zs_t.numpy().transpose(0, 2, 3, 1)),
        uncond_ctx=s["uncond"], src_ctx=s["src"], tar_ctx=s["tar"],
        cfg_tar=5.0, after_skip_steps=S, qk_mask=s["qk_mask"],
        conv_mask=s["conv_mask"], guidance_noise_map=10.0, grad_scale=5.0,
    )
    assert_close_pixelwise(ours_edit, edited_t, mean_tol=2e-5, max_tol=5e-3)
    assert_close_pixelwise(ours_recon, recon_t, mean_tol=2e-5, max_tol=5e-3)


@needs_reference
@pytest.mark.parametrize("epsilon,opt_steps,mean_tol,max_tol", [
    # STRUCTURAL case: optimization_steps=0 means both sides run the outer
    # loop with the raw uncond embedding (the reference's ``range(0)`` body
    # never executes; our while_loop cond is False at j=0, returning its
    # init) — identical
    # inputs per step, so the pair step, PnP gating and carries are certified
    # at the suite's standard cross-framework tolerance.
    (1e-5, 0, 1e-5, 2e-3),
    # CHAOTIC cases (any opt_steps >= 1): the Adam chain on this replica is a
    # sign function of noise.  Derivation (measured, scripts/debug_nulltext.py):
    # the uncond-embedding gradient has median |g| = 7.1e-6 while the
    # cross-framework VJP difference is mean 7.5e-6 / max 2.1e-5 — i.e. the
    # NOISE FLOOR EXCEEDS the median gradient, so sign(g) disagrees at ~37%
    # of the 77x32 coordinates.  One Adam update is u -= lr*g/(|g|+1e-8)
    # ~= lr*sign(g), so each flipped coordinate displaces u_opt by
    # 2*lr = 2e-2; the resulting per-outer-step carry perturbation is
    # ~2e-3 and compounds roughly linearly to ~1e-2 over the 6 steps
    # (measured 9.9e-3).  Per-iteration losses still track (step-0 loss
    # agrees to 6e-9, certifying the loss/gradient path); only the sign
    # pattern of sub-noise gradients differs.  A structural bug (wrong rows,
    # wrong gate, wrong lr schedule) shifts the mean by >0.1, so the loose
    # bound retains its power.  epsilon=1.0 stops after ONE update per outer
    # step (update applied before the break — the while_loop exits with the
    # stopping iteration's update landed, pnp_baselines.py adam_step);
    # epsilon=1e-5 runs the full 10-update chain.
    (1.0, 10, 2e-2, 0.25),
    (1e-5, 10, 2e-2, 0.25),
])
def test_nulltext_pnp_matches_reference(pnp_setup, epsilon, opt_steps,
                                        mean_tol, max_tol):
    s = pnp_setup
    zs_t, xts_t = _traj(s, True)
    edited_t, recon_t = s["ref_base"].nulltext_pnp(
        s["pipe"], xT=xts_t[S], xT_ori=xts_t[: S + 1], etas=0,
        prompts=PROMPTS, cfg_scales=[1.0, 5.0], zs=zs_t,
        optimization_steps=opt_steps, epsilon=epsilon,
    )

    from hedit_tpu.edit.pnp_baselines import null_text_pnp

    ours_edit, ours_recon = null_text_pnp(
        s["eps_fn"], s["sched"], s["as_ours"](xts_t[S][None]),
        jnp.asarray(xts_t[: S + 1].numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(zs_t.numpy().transpose(0, 2, 3, 1)),
        uncond_ctx=s["uncond"], src_ctx=s["src"], tar_ctx=s["tar"],
        cfg_tar=5.0, after_skip_steps=S, qk_mask=s["qk_mask"],
        conv_mask=s["conv_mask"], optimization_steps=opt_steps,
        epsilon=epsilon,
    )
    assert_close_pixelwise(ours_edit, edited_t, mean_tol=mean_tol,
                           max_tol=max_tol)
    assert_close_pixelwise(ours_recon, recon_t, mean_tol=mean_tol,
                           max_tol=max_tol)


def test_nulltext_adam_rule_matches_torch_adam():
    """The in-scan Adam of ``null_text_pnp`` (bias-corrected moments, lr
    schedule, early stop with the update applied BEFORE the break) A/B'd
    against ``torch.optim.Adam`` on a deterministic quadratic — isolates the
    optimizer arithmetic from the chaotic UNet-gradient chain (see the
    derivation on the chaotic cases above)."""
    import jax

    rng = np.random.RandomState(7)
    target = rng.randn(4, 6).astype(np.float32)
    u0 = rng.randn(4, 6).astype(np.float32)
    scale = rng.rand(4, 6).astype(np.float32) + 0.5

    def np_loss(u):
        return np.mean((scale * (u - target)) ** 2)

    for thresh, lr in [(1e9, 1e-2), (np_loss(u0) * 0.9, 5e-3), (0.0, 1e-2)]:
        # torch side: mirrors the reference loop (step, THEN break check)
        u_t = torch.tensor(u0, requires_grad=True)
        tgt = torch.tensor(target)
        sc = torch.tensor(scale)
        optim = torch.optim.Adam([u_t], lr=lr)
        for j in range(10):
            loss = ((sc * (u_t - tgt)) ** 2).mean()
            optim.zero_grad()
            loss.backward()
            optim.step()
            if loss.item() < thresh:
                break

        # our side: the exact update arithmetic of null_text_pnp's adam_step
        import jax.numpy as jnp2

        b1, b2, adam_eps = 0.9, 0.999, 1e-8

        def loss_fn(u):
            return jnp2.mean((jnp2.asarray(scale) * (u - jnp2.asarray(target))) ** 2)

        def adam_step(j, state):
            u, m, v, stopped = state
            loss, g = jax.value_and_grad(loss_fn)(u)
            m2 = b1 * m + (1 - b1) * g
            v2 = b2 * v + (1 - b2) * g * g
            jf = j + 1
            mhat = m2 / (1 - b1**jf)
            vhat = v2 / (1 - b2**jf)
            u2 = u - lr * mhat / (jnp2.sqrt(vhat) + adam_eps)
            new_stopped = jnp2.logical_or(stopped, loss < thresh)
            u_out = jnp2.where(stopped, u, u2)
            return (u_out, jnp2.where(stopped, m, m2),
                    jnp2.where(stopped, v, v2), new_stopped)

        u_j = jnp2.asarray(u0)
        u_opt, _, _, _ = jax.lax.fori_loop(
            0, 10, adam_step,
            (u_j, jnp2.zeros_like(u_j), jnp2.zeros_like(u_j), jnp2.array(False)),
        )
        np.testing.assert_allclose(
            np.asarray(u_opt), u_t.detach().numpy(), rtol=1e-5, atol=1e-6,
            err_msg=f"thresh={thresh} lr={lr}",
        )


@needs_reference
def test_negative_prompt_pnp_matches_reference(pnp_setup):
    s = pnp_setup
    zs_t, xts_t = _traj(s, True)
    edited_t, recon_t = s["ref_base"].negative_prompt_pnp(
        s["pipe"], xT=xts_t[S], etas=0, prompts=PROMPTS,
        cfg_scales=[1.0, 5.0], zs=zs_t,
    )

    from hedit_tpu.edit.pnp_baselines import negative_prompt_pnp

    ours_edit, ours_recon = negative_prompt_pnp(
        s["eps_fn"], s["sched"], s["as_ours"](xts_t[S][None]),
        jnp.asarray(zs_t.numpy().transpose(0, 2, 3, 1)),
        uncond_ctx=s["uncond"], src_ctx=s["src"], tar_ctx=s["tar"],
        cfg_tar=5.0, after_skip_steps=S, qk_mask=s["qk_mask"],
        conv_mask=s["conv_mask"],
    )
    assert_close_pixelwise(ours_edit, edited_t)
    assert_close_pixelwise(ours_recon, recon_t)
