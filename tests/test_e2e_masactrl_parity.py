"""END-TO-END cross-framework parity of the MasaCtrl editing loops.

The reference's OWN ``masactrl/masactrl.py`` MutualSelfAttentionControl +
``masactrl_utils.py`` editor-forward semantics (head-batched '(b h) n d'
q/k/v, counter state machine, uncond half ALSO editor-modified) run on the
torch SD UNet replica against our fused-path ``MasaCtrlControl`` (a k/v
row remap — no probability materialization) driving ``h_edit_masactrl``
and the shared pair-baseline loop.

Shimmed: ``masa_ctrl`` package alias (the reference's broken import,
``masactrl.py:8`` — SURVEY.md §2.5) and ``torchvision.utils.save_image``
(imported, unused on this path).
"""

import pytest as _pytest_mod
pytestmark = _pytest_mod.mark.slow  # heavy lane; fast lane = -m "not slow"

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_t = torch.nn

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_e2e_p2p_parity import _install_p2p_shims, _KwHolder, _UNetWrapP2P  # noqa: E402
from test_e2e_text_parity import REF, _TextEnc, _Tok, assert_close_pixelwise  # noqa: E402
from test_torch_parity import _load_ref_module, _randomize, _state_np, needs_reference  # noqa: E402
from test_torch_parity_sd import _TorchSDUNet  # noqa: E402

S = 6
CFG3 = (1.0, 3.0, 5.0)
START_STEP, START_LAYER = 2, 8
PROMPTS = ["", "a dog in the park"]  # MasaCtrl convention: empty source


def _install_masactrl_shims():
    import sys
    import types

    from test_e2e_text_parity import _mk_stub

    _install_p2p_shims()
    if "torchvision" not in sys.modules:
        tv = _mk_stub("torchvision")
        tvu = _mk_stub("torchvision.utils")
        tvu.save_image = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    if "masa_ctrl" not in sys.modules:
        # the reference's masactrl.py:8 imports masa_ctrl.masactrl_utils — a
        # package name that does not exist in the repo (reference bug); alias
        # it to the actual masactrl directory
        pkg = _mk_stub("masa_ctrl")
        pkg.__path__ = [REF + "/text-guided/masactrl"]
        sys.modules["masa_ctrl"] = pkg


def _register_editor(tm, editor, holder):
    """The reference's ``regiter_attention_editor_diffusers`` semantics on
    the replica: every attention layer (cross AND self) runs the editor
    unless use_editor=False; counters advance per call
    (``masactrl_utils.py:35-104``)."""

    def patch(attn_mod, place):
        H, D = attn_mod.heads, attn_mod.dim_head
        scale = D ** -0.5

        def fwd(x, ctx=None):
            is_cross = ctx is not None
            c = x if ctx is None else ctx
            B, L = x.shape[0], x.shape[1]

            def h2b(t):
                return (t.reshape(B, -1, H, D).permute(0, 2, 1, 3)
                        .reshape(B * H, -1, D))

            q, k, v = h2b(attn_mod.to_q(x)), h2b(attn_mod.to_k(c)), h2b(attn_mod.to_v(c))
            sim = torch.einsum("bid,bjd->bij", q, k) * scale
            attn = sim.softmax(dim=-1)
            if holder.cur.get("use_editor", True):
                out = editor(q, k, v, sim, attn, is_cross, place, H,
                             scale=scale)
            else:
                out = torch.einsum("bij,bjd->bid", attn, v)
                out = out.reshape(B, H, L, D).permute(0, 2, 1, 3).reshape(B, L, H * D)
            return attn_mod.to_out(out)

        attn_mod.forward = fwd

    count = 0
    for blocks, place in ((tm.down_blocks, "down"), ([tm.mid_block], "mid"),
                          (tm.up_blocks, "up")):
        for blk in blocks:
            if not hasattr(blk, "attentions"):
                continue
            for tr in blk.attentions:
                for bb in tr.transformer_blocks:
                    patch(bb.attn1, place)
                    patch(bb.attn2, place)
                    count += 2
    editor.num_att_layers = count
    return count


@pytest.fixture(scope="module")
def masa_setup():
    _install_masactrl_shims()
    from types import SimpleNamespace

    ref_ddpm = _load_ref_module(
        "ref_ddpm_inv_ma", "text-guided/inversion/ddpm_inversion.py")
    ref_hedit = _load_ref_module(
        "ref_masactrl_h_edit", "text-guided/inversion/masactrl_h_edit.py")
    ref_bl = _load_ref_module(
        "ref_masactrl_baselines", "text-guided/inversion/masactrl_baselines.py")
    ref_masa = _load_ref_module(
        "ref_masactrl_mod", "text-guided/masactrl/masactrl.py")

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
    holder = _KwHolder()
    pipe = SimpleNamespace(
        unet=_UNetWrapP2P(tm, 16, holder), scheduler=fake_sched,
        tokenizer=_Tok(), text_encoder=_TextEnc(), device=torch.device("cpu"),
    )

    rng = np.random.RandomState(4)
    w0 = rng.randn(1, 4, 16, 16).astype(np.float32) * 0.3
    torch.manual_seed(123)
    _, zs_t, xts_t, _ = ref_ddpm.inversion_forward_process_ddpm(
        pipe, torch.from_numpy(w0), etas=1.0, prog_bar=False,
        prompt=PROMPTS[0], cfg_scale_src=1.0, num_inference_steps=S,
    )

    from hedit_tpu.io_utils.weights import convert_unet
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig

    params = convert_unet(_state_np(tm))
    model = UNet2DCondition(UNetConfig.tiny())

    def eps_fn(x, t, c, ctrl=None):
        if ctrl is None:
            return model.apply(params, x, t, c)
        if getattr(ctrl, "stores_attn", False):
            out, aux = model.apply(params, x, t, c, ctrl, True,
                                   mutable=["attn_store"])
            return out, aux["attn_store"]
        return model.apply(params, x, t, c, ctrl)

    def ctx_of(prompt):
        ids = pipe.tokenizer(prompt).input_ids
        with torch.no_grad():
            return jnp.asarray(pipe.text_encoder(ids)[0].numpy())

    def fresh_editor():
        editor = ref_masa.MutualSelfAttentionControl(
            start_step=START_STEP, start_layer=START_LAYER, total_steps=S)
        n = _register_editor(tm, editor, holder)
        assert n == 32  # replica == SD topology: 16 blocks x (attn1 + attn2)
        return editor

    return dict(
        pipe=pipe, ref_hedit=ref_hedit, ref_bl=ref_bl, sched=sched,
        eps_fn=eps_fn, zs_t=zs_t, xts_t=xts_t, fresh_editor=fresh_editor,
        uncond=ctx_of(""), src=ctx_of(PROMPTS[0]), tar=ctx_of(PROMPTS[1]),
    )


def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


@needs_reference
def test_h_edit_masactrl_matches_reference(masa_setup):
    s = masa_setup
    s["fresh_editor"]()
    edited_t, recon_t = s["ref_hedit"].h_Edit_masactrl_implicit(
        s["pipe"], s["xts_t"][S], eta=1.0, prompts=PROMPTS,
        cfg_scales=list(CFG3), zs=s["zs_t"], optimization_steps=1,
        after_skip_steps=S, is_ddim_inversion=False,
    )

    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.edit.h_edit_ctrl import h_edit_masactrl

    cfg = HEditConfig(cfg_src=CFG3[0], cfg_src_edit=CFG3[1], cfg_tar=CFG3[2],
                      implicit=True, optimization_steps=1)
    ours_edit, ours_recon = h_edit_masactrl(
        s["eps_fn"], s["sched"], _nhwc(s["xts_t"][S].unsqueeze(0)),
        jnp.asarray(s["zs_t"].numpy().transpose(0, 2, 3, 1)),
        uncond_ctx=s["uncond"], src_ctx=s["src"], tar_ctx=s["tar"],
        cfg=cfg, after_skip_steps=S,
        start_step=START_STEP, start_layer=START_LAYER,
    )
    assert_close_pixelwise(ours_edit, edited_t)
    assert_close_pixelwise(ours_recon, recon_t)


@needs_reference
def test_ef_masactrl_matches_reference(masa_setup):
    """EF + MasaCtrl baseline through the shared pair loop
    (ef_or_pnp_inv_p2p driving a MasaCtrlControl)."""
    s = masa_setup
    s["fresh_editor"]()
    edited_t, recon_t = s["ref_bl"].ef_or_pnp_inv_w_masactrl(
        s["pipe"], s["xts_t"][S].unsqueeze(0), etas=1.0, prompts=PROMPTS,
        cfg_scales=[1.5, CFG3[2]], zs=s["zs_t"], is_ddim_inversion=False,
    )

    from hedit_tpu.control.masactrl import MasaCtrlControl
    from hedit_tpu.edit.baselines import ef_or_pnp_inv_p2p

    ctrl = MasaCtrlControl(
        step=jnp.zeros((), jnp.int32), start_step=START_STEP,
        start_layer=START_LAYER,
    )
    ours_edit, ours_recon = ef_or_pnp_inv_p2p(
        s["eps_fn"], s["sched"], _nhwc(s["xts_t"][S].unsqueeze(0)),
        jnp.asarray(s["zs_t"].numpy().transpose(0, 2, 3, 1)),
        uncond_ctx=s["uncond"], src_ctx=s["src"], tar_ctx=s["tar"],
        cfg_src=1.5, cfg_tar=CFG3[2], eta=1.0, is_ddim_inversion=False,
        after_skip_steps=S, control=ctrl,
    )
    assert_close_pixelwise(ours_edit, edited_t)
    assert_close_pixelwise(ours_recon, recon_t)
