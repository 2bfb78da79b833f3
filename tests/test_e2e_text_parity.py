"""END-TO-END cross-framework parity of the text-guided h-Edit-R loops.

Runs the reference's OWN ``text-guided/inversion/{ddpm_inversion,
p2p_h_edit}.py`` against a diffusers-shaped fake pipeline wrapping the
hand-built torch SD UNet replica from tests/test_torch_parity_sd.py (the
reference modules are torch-only once ``diffusers.utils.torch_utils`` — an
unused import — is stubbed).  The captured inversion trajectory is injected
through ``load_trajectory`` and our fused batch-3 ``h_edit_r`` must
reproduce BOTH return branches at float32 tolerance.

This certifies loop-level equivalences the unit tests assert only in
isolation: the batch-2+batch-4 -> batch-3 CFG fusion, zs/t_to_idx indexing,
``reverse_step`` applied to the [orig, edit] pair with the edit-branch eps,
the step-0 pre-optimization at ``time_ahead`` under skip > 0, and the
L1-reconstruction pull's RMS-normalized rho.
"""

import pytest as _pytest_mod
pytestmark = _pytest_mod.mark.slow  # heavy lane; fast lane = -m "not slow"

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_t = torch.nn

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_torch_parity import _load_ref_module, _randomize, _state_np, needs_reference  # noqa: E402
from test_torch_parity_sd import _TorchSDUNet  # noqa: E402

REF = "/root/reference"
S = 6
CFGS = (1.0, 3.0, 5.0)


def _mk_stub(name):
    """A stub module with a real ModuleSpec.

    ``types.ModuleType`` leaves ``__spec__ = None``, and
    ``importlib.util.find_spec`` raises ``ValueError: <name>.__spec__ is
    None`` for such sys.modules entries — so a bare stub makes EVERY later
    availability probe for 'diffusers' (transformers/accelerate-style
    ``find_spec`` checks) blow up in whichever unrelated test imports them
    after an e2e module ran.  Order-dependence hazard; give the stubs specs."""
    import importlib.machinery

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def _install_shims():
    """Stub diffusers.utils.torch_utils (imported, never called on our path)
    and alias the reference's ``inversion`` package for its absolute imports."""
    if "diffusers" not in sys.modules:
        d = _mk_stub("diffusers")
        du = _mk_stub("diffusers.utils")
        dt = _mk_stub("diffusers.utils.torch_utils")
        dt.randn_tensor = lambda shape, generator=None, device=None, dtype=None: (
            torch.randn(shape, generator=generator, device=device, dtype=dtype))
        d.utils = du
        du.torch_utils = dt
        sys.modules["diffusers"] = d
        sys.modules["diffusers.utils"] = du
        sys.modules["diffusers.utils.torch_utils"] = dt
    if "inversion" not in sys.modules:
        pkg = _mk_stub("inversion")
        pkg.__path__ = [REF + "/text-guided/inversion"]
        sys.modules["inversion"] = pkg


class _Tok:
    """Deterministic fake CLIP tokenizer (padding='max_length' contract)."""

    model_max_length = 77

    def __call__(self, prompts, padding=None, max_length=77, truncation=True,
                 return_tensors="pt"):
        if isinstance(prompts, str):
            prompts = [prompts]
        ids = np.zeros((len(prompts), 77), np.int64)
        for i, p in enumerate(prompts):
            toks = [sum(ord(c) for c in w) % 97 + 3 for w in p.split()][:75]
            seq = [1] + toks + [2]
            ids[i, :len(seq)] = seq
        return SimpleNamespace(input_ids=torch.from_numpy(ids))


class _TextEnc(nn_t.Module):
    def __init__(self):
        super().__init__()
        self.emb = nn_t.Embedding(100, 32)
        g = torch.Generator().manual_seed(5)
        with torch.no_grad():
            self.emb.weight.copy_(
                torch.randn(self.emb.weight.shape, generator=g) * 0.1)

    def forward(self, ids):
        return (self.emb(ids),)


class _UNetWrap(nn_t.Module):
    """diffusers calling convention around the torch SD UNet replica."""

    def __init__(self, net, sample_size):
        super().__init__()
        self.net = net
        self.in_channels = 4
        self.sample_size = sample_size

    class _Out:
        """diffusers UNet output: both ``.sample`` and ``["sample"]`` are
        used by the reference (``ddim_inversion.py:47`` indexes)."""

        def __init__(self, sample):
            self.sample = sample

        def __getitem__(self, key):
            return getattr(self, key)

    def forward(self, x, timestep=None, encoder_hidden_states=None,
                cross_attention_kwargs=None):
        t = torch.as_tensor(timestep)
        if t.dim() == 0:
            t = t[None].expand(x.shape[0])
        return self._Out(self.net(x, t, encoder_hidden_states))


@pytest.fixture(scope="module")
def text_setup(tmp_path_factory):
    _install_shims()
    ref_ddpm = _load_ref_module(
        "ref_ddpm_inv_e2e", "text-guided/inversion/ddpm_inversion.py")
    ref_hedit = _load_ref_module(
        "ref_p2p_h_edit_e2e", "text-guided/inversion/p2p_h_edit.py")

    tm = _TorchSDUNet()
    _randomize(tm, 20)

    from hedit_tpu.core.schedule import Schedule

    sched = Schedule.create(S)  # SD defaults: scaled_linear, leading, offset 1

    # the fake scheduler serves OUR oracle-tested tables to the reference
    # loops, isolating the A/B to the loop math itself
    fake_sched = SimpleNamespace(
        alphas_cumprod=torch.from_numpy(np.asarray(sched.alphas_cumprod)),
        alphas=torch.from_numpy(np.asarray(sched.alphas)),
        final_alpha_cumprod=torch.from_numpy(
            np.asarray(sched.final_alpha_cumprod)),
        timesteps=torch.from_numpy(np.asarray(sched.timesteps)).long(),
        num_inference_steps=S,
        config=SimpleNamespace(num_train_timesteps=1000),
    )
    pipe = SimpleNamespace(
        unet=_UNetWrap(tm, 16), scheduler=fake_sched, tokenizer=_Tok(),
        text_encoder=_TextEnc(), device=torch.device("cpu"),
    )

    src_prompt, tar_prompt = "a cat on grass", "a dog on grass"
    rng = np.random.RandomState(4)
    w0 = rng.randn(1, 4, 16, 16).astype(np.float32) * 0.3

    torch.manual_seed(123)  # the reference DDPM inversion draws unseeded noise
    _, zs_t, xts_t, _ = ref_ddpm.inversion_forward_process_ddpm(
        pipe, torch.from_numpy(w0), etas=1.0, prog_bar=False,
        prompt=src_prompt, cfg_scale_src=1.0, num_inference_steps=S,
    )

    npz = tmp_path_factory.mktemp("traj") / "text_traj.npz"
    np.savez(npz, xts=xts_t.detach().numpy(), zs=zs_t.detach().numpy(),
             num_steps=S)

    # our side: converted UNet + the same context embeddings
    from hedit_tpu.io_utils.trajectory import load_trajectory
    from hedit_tpu.io_utils.weights import convert_unet
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig

    params = convert_unet(_state_np(tm))
    model = UNet2DCondition(UNetConfig.tiny())
    eps_fn = lambda x, t, c: model.apply(params, x, t, c)  # noqa: E731

    def ctx_of(prompt):
        ids = pipe.tokenizer(prompt).input_ids
        with torch.no_grad():
            return jnp.asarray(pipe.text_encoder(ids)[0].numpy())

    traj = load_trajectory(str(npz), expect_steps=S)
    return dict(
        pipe=pipe, ref_hedit=ref_hedit, zs_t=zs_t, xts_t=xts_t, sched=sched,
        eps_fn=eps_fn, traj=traj, prompts=[src_prompt, tar_prompt],
        uncond=ctx_of(""), src=ctx_of(src_prompt), tar=ctx_of(tar_prompt),
    )



def assert_close_pixelwise(ours, theirs_nchw, mean_tol=1e-5, max_tol=2e-3):
    """Cross-framework f32 comparison shaped to the observed error profile:
    the bulk of elements agree to ~1e-6 with rare single-element outliers up
    to ~7e-4 (different accumulation orders through 6 chained UNet steps).
    A semantic bug (wrong coefficient, wrong zs index, wrong row) shifts the
    MEAN by orders of magnitude, so assert a tight mean and a loose max."""
    theirs = theirs_nchw.detach().numpy().transpose(0, 2, 3, 1)
    d = np.abs(np.asarray(ours) - theirs)
    assert d.mean() < mean_tol, f"mean |diff| {d.mean():.2e} >= {mean_tol:.0e}"
    assert d.max() < max_tol, f"max |diff| {d.max():.2e} >= {max_tol:.0e}"


@needs_reference
def test_h_edit_r_explicit_matches_reference(text_setup):
    s = text_setup
    edited_t, recon_t = s["ref_hedit"].h_Edit_R_explicit(
        s["pipe"], s["xts_t"][S], eta=1.0, prompts=s["prompts"],
        cfg_scales=list(CFGS), zs=s["zs_t"], controller=None,
        after_skip_steps=S, is_ddim_inversion=False,
    )

    from hedit_tpu.edit.h_edit import HEditConfig, h_edit_r

    cfg = HEditConfig(cfg_src=CFGS[0], cfg_src_edit=CFGS[1],
                      cfg_tar=CFGS[2], implicit=False)
    ours_edit, ours_recon = h_edit_r(
        s["eps_fn"], s["sched"], s["traj"].xts[S][None], s["traj"].zs,
        uncond_ctx=s["uncond"], src_ctx=s["src"], tar_ctx=s["tar"],
        cfg=cfg, after_skip_steps=S,
    )
    for ours, theirs in ((ours_edit, edited_t), (ours_recon, recon_t)):
        assert_close_pixelwise(ours, theirs)


@needs_reference
def test_h_edit_r_implicit_skip_matches_reference(text_setup):
    """skip=2: exercises the step-0 pre-optimization at time_ahead, 2
    optimization loops, and the L1-reconstruction pull."""
    s = text_setup
    N = S - 2
    edited_t, recon_t = s["ref_hedit"].h_Edit_R_implicit(
        s["pipe"], s["xts_t"][N], eta=1.0, prompts=s["prompts"],
        cfg_scales=list(CFGS), zs=s["zs_t"][:N], controller=None,
        weight_reconstruction=0.1, optimization_steps=2,
        after_skip_steps=N, is_ddim_inversion=False,
    )

    from hedit_tpu.edit.h_edit import HEditConfig, h_edit_r

    cfg = HEditConfig(cfg_src=CFGS[0], cfg_src_edit=CFGS[1],
                      cfg_tar=CFGS[2], implicit=True, optimization_steps=2,
                      weight_reconstruction=0.1)
    ours_edit, ours_recon = h_edit_r(
        s["eps_fn"], s["sched"], s["traj"].xts[N][None], s["traj"].zs,
        uncond_ctx=s["uncond"], src_ctx=s["src"], tar_ctx=s["tar"],
        cfg=cfg, after_skip_steps=N,
    )
    for ours, theirs in ((ours_edit, edited_t), (ours_recon, recon_t)):
        assert_close_pixelwise(ours, theirs)


@needs_reference
def test_ddim_inversion_matches_reference(text_setup):
    """DDIM inversion is deterministic (no RNG), so our invert_ddim is A/B'd
    DIRECTLY against the reference's two-phase ddim_inversion — xT, the
    un-normalized zs residuals, and every trajectory point."""
    s = text_setup
    ref_ddim = _load_ref_module(
        "ref_ddim_inv_e2e", "text-guided/inversion/ddim_inversion.py")

    rng = np.random.RandomState(9)
    w0 = rng.randn(1, 4, 16, 16).astype(np.float32) * 0.3
    with torch.no_grad():
        xT_t, zs_t, lat_t = ref_ddim.ddim_inversion(
            s["pipe"], torch.from_numpy(w0), "a cat on grass", 2.0)

    from hedit_tpu.invert.ddim import invert_ddim

    inv = invert_ddim(
        s["eps_fn"], s["sched"], jnp.asarray(w0.transpose(0, 2, 3, 1)),
        uncond_ctx=s["uncond"], src_ctx=s["src"], cfg_scale=2.0, step_chunk=3,
    )
    np.testing.assert_allclose(
        np.asarray(inv.xT), xT_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(inv.zs), zs_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=2e-5)
    theirs_xts = torch.cat(lat_t).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(inv.xts).reshape(theirs_xts.shape), theirs_xts,
        rtol=1e-4, atol=2e-5)
