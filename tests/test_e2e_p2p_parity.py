"""END-TO-END cross-framework parity of the FLAGSHIP loop: h-Edit + P2P.

Runs the reference's OWN ``p2p_h_edit.h_Edit_p2p_implicit`` with its OWN
controller stack (``p2p/ptp_classes.py`` AttentionRefine -> AttentionReweight,
``seq_aligner`` NW mappers, ``ptp_utils`` time-word alphas) monkey-patched
onto the torch SD UNet replica — exactly the reference's processor semantics:
head-batched [B*H, q, k] probabilities, controller editing the conditional
half in place, ``save_attn=False`` freezing the counters on non-last
optimization loops.  Our fused single-scan ``h_edit_p2p`` — with its
batch-3/batch-4 CFG fusion, fused-path q/k row-select self edit,
linear-token-edit cross edit and probability-path store layers — must
reproduce BOTH branches at float32 tolerance from the same injected
trajectory and the same controller tensors.

This is the strongest parity artifact in the suite: every equivalence the
unit tests assert in isolation (row-layout rearrangement, edit linearity,
alpha/equalizer composition, counter<->step mapping) is certified against
the reference implementation end to end.
"""

import pytest as _pytest_mod
pytestmark = _pytest_mod.mark.slow  # heavy lane; fast lane = -m "not slow"

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_t = torch.nn

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_e2e_text_parity import (  # noqa: E402
    REF,
    _install_shims,
    _TextEnc,
    _Tok,
    _UNetWrap,
    assert_close_pixelwise,
)
from test_torch_parity import _load_ref_module, _randomize, _state_np, needs_reference  # noqa: E402
from test_torch_parity_sd import _TorchSDUNet  # noqa: E402

S = 6
CFGS = (1.0, 3.0, 5.0)
XA, SA = 0.6, 0.4
PROMPTS = ["a cat sitting on grass", "a fluffy dog sitting on grass"]
REWEIGHT_WORD, REWEIGHT_VAL = "fluffy", 2.0


class _TokED(_Tok):
    """_Tok + encode/decode (word-level vocab built lazily) for seq_aligner
    and get_word_inds."""

    def __init__(self):
        self.vocab, self.inv = {}, {}

    def _id(self, w):
        if w not in self.vocab:
            i = sum(ord(c) for c in w) % 97 + 3
            while i in self.inv:  # collision: probe upward
                i += 97
            self.vocab[w], self.inv[i] = i, w
        return self.vocab[w]

    def encode(self, text):
        return [1] + [self._id(w) for w in text.split()] + [2]

    def decode(self, ids):
        return "".join(self.inv.get(int(i), "") for i in ids)

    def __call__(self, prompts, padding=None, max_length=77, truncation=True,
                 return_tensors="pt"):
        if isinstance(prompts, str):
            prompts = [prompts]
        ids = np.zeros((len(prompts), 77), np.int64)
        for i, p in enumerate(prompts):
            seq = self.encode(p)[:77]
            ids[i, :len(seq)] = seq
        from types import SimpleNamespace

        return SimpleNamespace(input_ids=torch.from_numpy(ids))


def _install_p2p_shims():
    """cv2 + diffusers.models.attention_processor.Attention (import-time
    only on the paths exercised) + the ``p2p`` package alias."""
    import sys
    import types

    from test_e2e_text_parity import _mk_stub

    _install_shims()
    # every stub needs a real ModuleSpec (_mk_stub): a bare ModuleType makes
    # any later importlib.util.find_spec probe raise "__spec__ is None" in
    # whichever unrelated test imports transformers afterwards (hit by the
    # sharded suite runner grouping this module with test_models)
    if "cv2" not in sys.modules:
        sys.modules["cv2"] = _mk_stub("cv2")
    if "diffusers.models" not in sys.modules:
        dm = _mk_stub("diffusers.models")
        dap = _mk_stub("diffusers.models.attention_processor")

        class Attention:  # placeholder: referenced as a type only
            pass

        dap.Attention = Attention
        dm.attention_processor = dap
        sys.modules["diffusers.models"] = dm
        sys.modules["diffusers.models.attention_processor"] = dap
        sys.modules["diffusers"].models = dm
    if "p2p" not in sys.modules:
        pkg = _mk_stub("p2p")
        pkg.__path__ = [REF + "/text-guided/p2p"]
        sys.modules["p2p"] = pkg


class _KwHolder:
    cur: dict = {}


def _patch_attn(attn_mod, place, controller, holder):
    """Reference P2PCrossAttnProcessor semantics (``ptp_utils.py:31-122``) on
    the replica's attention module: head-batched batch-major probabilities,
    controller called on the full tensor (it edits the [h//2:] half)."""
    H, D = attn_mod.heads, attn_mod.dim_head

    def fwd(x, ctx=None):
        is_cross = ctx is not None
        c = x if ctx is None else ctx
        B, L = x.shape[0], x.shape[1]

        def h2b(t):
            return (t.reshape(B, -1, H, D).permute(0, 2, 1, 3)
                    .reshape(B * H, -1, D))

        q, k, v = h2b(attn_mod.to_q(x)), h2b(attn_mod.to_k(c)), h2b(attn_mod.to_v(c))
        probs = ((q @ k.transpose(-2, -1)) * D ** -0.5).softmax(-1)
        kw = holder.cur
        if kw.get("use_controller", True):
            probs = controller(probs, is_cross, place, kw.get("save_attn", True))
        o = ((probs @ v).reshape(B, H, L, D).permute(0, 2, 1, 3)
             .reshape(B, L, H * D))
        return attn_mod.to_out(o)

    attn_mod.forward = fwd


def _register_controller(tm, controller, holder):
    count = 0
    for blocks, place in ((tm.down_blocks, "down"), ([tm.mid_block], "mid"),
                          (tm.up_blocks, "up")):
        for blk in blocks:
            if not hasattr(blk, "attentions"):
                continue
            for tr in blk.attentions:
                for bb in tr.transformer_blocks:
                    _patch_attn(bb.attn1, place, controller, holder)
                    _patch_attn(bb.attn2, place, controller, holder)
                    count += 2
    controller.num_att_layers = count


class _UNetWrapP2P(_UNetWrap):
    """Threads cross_attention_kwargs to the patched attentions via the
    holder (the per-call analog of diffusers' kwarg plumbing)."""

    def __init__(self, net, sample_size, holder):
        super().__init__(net, sample_size)
        self._holder = holder

    def forward(self, x, timestep=None, encoder_hidden_states=None,
                cross_attention_kwargs=None):
        self._holder.cur = dict(cross_attention_kwargs or {})
        try:
            return super().forward(x, timestep, encoder_hidden_states)
        finally:
            self._holder.cur = {}


@needs_reference
@pytest.mark.parametrize("cfg_src,inversion", [
    (1.0, "ddpm"),    # flagship h-Edit-R + P2P (fused single-row base)
    (1.25, "ddpm"),   # batch-4 CFG base path
    (1.0, "ddim"),    # h-Edit-D + P2P (un-normalized zs, DDIM reverse_step)
])
def test_h_edit_p2p_implicit_matches_reference(tmp_path, cfg_src, inversion):
    _install_p2p_shims()
    from types import SimpleNamespace

    ref_ddpm = _load_ref_module(
        "ref_ddpm_inv_p2p", "text-guided/inversion/ddpm_inversion.py")
    ref_hedit = _load_ref_module(
        "ref_p2p_h_edit_ctrl", "text-guided/inversion/p2p_h_edit.py")
    ref_classes = _load_ref_module("ref_ptp_classes", "text-guided/p2p/ptp_classes.py")

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
    tok = _TokED()
    holder = _KwHolder()
    pipe = SimpleNamespace(
        unet=_UNetWrapP2P(tm, 16, holder), scheduler=fake_sched,
        tokenizer=tok, text_encoder=_TextEnc(), device=torch.device("cpu"),
    )

    rng = np.random.RandomState(4)
    w0 = rng.randn(1, 4, 16, 16).astype(np.float32) * 0.3
    is_ddim = inversion == "ddim"
    if is_ddim:
        ref_ddim = _load_ref_module(
            "ref_ddim_inv_p2p", "text-guided/inversion/ddim_inversion.py")
        with torch.no_grad():
            _, zs_t, lat_t = ref_ddim.ddim_inversion(
                pipe, torch.from_numpy(w0), PROMPTS[0], cfg_src)
        xts_t = torch.cat(lat_t)  # [S+1, 1->cat, 4, 16, 16] row-stacked
    else:
        torch.manual_seed(123)  # the reference DDPM inversion draws unseeded noise
        _, zs_t, xts_t, _ = ref_ddpm.inversion_forward_process_ddpm(
            pipe, torch.from_numpy(w0), etas=1.0, prog_bar=False,
            prompt=PROMPTS[0], cfg_scale_src=1.0, num_inference_steps=S,
        )

    # ---- reference controller stack: Refine chained into Reweight -------- #
    refine = ref_classes.AttentionRefine(
        PROMPTS, S, cross_replace_steps=XA, self_replace_steps=SA,
        local_blend=None, tokenizer=tok, device=torch.device("cpu"))
    eq = ref_classes.get_equalizer(PROMPTS[1], REWEIGHT_WORD, (REWEIGHT_VAL,), tok)
    controller = ref_classes.AttentionReweight(
        PROMPTS, S, cross_replace_steps=XA, self_replace_steps=SA,
        equalizer=eq, local_blend=None, controller=refine,
        tokenizer=tok, device=torch.device("cpu"))
    _register_controller(tm, controller, holder)

    edited_t, recon_t = ref_hedit.h_Edit_p2p_implicit(
        pipe, xts_t[S], eta=1.0, prompts=PROMPTS, cfg_scales=[cfg_src, *CFGS[1:]],
        zs=zs_t, controller=controller, weight_reconstruction=0.1,
        optimization_steps=2, after_skip_steps=S, is_ddim_inversion=is_ddim,
    )

    # ---- our side: same trajectory, same controller tensors -------------- #
    from hedit_tpu.control.p2p import P2PControl
    from hedit_tpu.edit.h_edit import HEditConfig
    from hedit_tpu.edit.h_edit_p2p import h_edit_p2p
    from hedit_tpu.io_utils.trajectory import load_trajectory
    from hedit_tpu.io_utils.weights import convert_unet
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig

    npz = tmp_path / "traj.npz"
    np.savez(npz, xts=xts_t.detach().numpy(), zs=zs_t.detach().numpy(),
             num_steps=S)
    traj = load_trajectory(str(npz), expect_steps=S)

    params = convert_unet(_state_np(tm))
    model = UNet2DCondition(UNetConfig.tiny())

    def eps_ctrl(x, t, c, ctrl):
        if getattr(ctrl, "stores_attn", False):
            out, aux = model.apply(params, x, t, c, ctrl, True,
                                   mutable=["attn_store"])
            return out, aux["attn_store"]
        return model.apply(params, x, t, c, ctrl)

    def ctx_of(prompt):
        ids = pipe.tokenizer(prompt).input_ids
        with torch.no_grad():
            return jnp.asarray(pipe.text_encoder(ids)[0].numpy())

    ctrl_ours = P2PControl(
        step=jnp.zeros((), jnp.int32),
        cross_alpha=jnp.asarray(
            controller.cross_replace_alpha.numpy().reshape(S + 1, 77)),
        refine_mapper=jnp.asarray(refine.mapper[0].numpy()),
        refine_alphas=jnp.asarray(refine.alphas.reshape(77).numpy()),
        replace_mapper=jnp.eye(77),
        equalizer=jnp.asarray(eq[0].numpy()),
        mode="refine", use_reweight=True,
        self_replace_until=int(SA * S),
        blend_px=16,  # tiny model: 4x4 cross layers hold the store
    )
    cfg = HEditConfig(cfg_src=cfg_src, cfg_src_edit=CFGS[1], cfg_tar=CFGS[2],
                      implicit=True, optimization_steps=2,
                      weight_reconstruction=0.1, is_ddim_inversion=is_ddim)
    ours_edit, ours_recon = h_edit_p2p(
        eps_ctrl, sched, traj.xts[S][None], traj.zs,
        uncond_ctx=ctx_of(""), src_ctx=ctx_of(PROMPTS[0]),
        tar_ctx=ctx_of(PROMPTS[1]), cfg=cfg, after_skip_steps=S,
        control=ctrl_ours,
    )
    for ours, theirs in ((ours_edit, edited_t), (ours_recon, recon_t)):
        # measured drift at seed 123: mean ~1e-6, max 7e-4 on 1/1024 elements
        assert_close_pixelwise(ours, theirs)
