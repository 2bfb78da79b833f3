"""The real-checkpoint loading chain, driven END-TO-END (VERDICT r2 #3).

Round 2 A/B'd every converter from in-memory state dicts but never executed
the day-one path real weights take:

    create_sd_pipeline(weights_dir=...) -> _find_ckpt -> load_safetensors
    (incl. BF16 widening) -> converters -> validate_against -> orbax cache

These tests serialize the tiny torch replicas' state dicts to ACTUAL
``.safetensors``/``.ckpt`` files in the layouts the loaders expect
(diffusers-layout dir; DataParallel ``module.``-prefixed torch ckpt;
env-var reward-model ckpts) and assert the loaded pipeline forwards match
the direct in-memory conversion, cold and orbax-warm.  A full-size SD-1.5
key/shape census (meta-device replicas, zero weight bytes) pins the
expected checkpoint surface so converter key drift fails loudly before real
weights ever arrive.
"""

import os

import numpy as np
import pytest

import pytest as _pytest_mod

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_torch_parity import _load_ref_module, _randomize, _state_np, needs_reference  # noqa: E402
from test_torch_parity_sd import _TorchSDUNet, _TorchSDVAE  # noqa: E402

from hedit_tpu.io_utils.safetensors_io import save_safetensors  # noqa: E402


def _np_state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def sd_weights_dir(tmp_path_factory):
    """A diffusers-layout weights dir written from the tiny torch replicas,
    with one BF16 tensor in each tower to exercise the widening path."""
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel as HFModel

    root = tmp_path_factory.mktemp("sd_weights")
    torch.manual_seed(0)
    tm_unet = _TorchSDUNet()
    _randomize(tm_unet, 20)
    tm_vae = _TorchSDVAE()
    _randomize(tm_vae, 22)
    hf_cfg = HFConfig(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=77,
    )
    torch.manual_seed(7)
    tm_text = HFModel(hf_cfg).eval()

    layouts = {
        "unet": (tm_unet, "diffusion_pytorch_model.safetensors"),
        "vae": (tm_vae, "diffusion_pytorch_model.safetensors"),
        "text_encoder": (tm_text, "model.safetensors"),
    }
    for sub, (model, fname) in layouts.items():
        d = root / sub
        d.mkdir()
        state = _np_state(model)
        # one weight tensor per tower stored BF16 (HF fp32/bf16 mixed ckpts)
        bf16_key = next(k for k in state if k.endswith("weight"))
        save_safetensors(str(d / fname), state, bf16_keys=(bf16_key,))
    return dict(root=str(root), unet=tm_unet, vae=tm_vae, text=tm_text)


def test_sd_weights_dir_cold_then_orbax_warm(sd_weights_dir):
    """create_sd_pipeline(weights_dir=...): cold load converts + caches;
    a second construction restores from orbax; both forward-match torch."""
    from hedit_tpu.pipelines.sd import create_sd_pipeline

    root = sd_weights_dir["root"]
    pipe = create_sd_pipeline(weights_dir=root, tiny=True,
                              num_inference_steps=4, with_tokenizer=False)
    assert os.path.isdir(os.path.join(root, "flax_cache", "unet"))

    rs = np.random.RandomState(1)
    x = rs.randn(1, 16, 16, 4).astype(np.float32) * 0.3
    ctx = rs.randn(1, 77, 32).astype(np.float32) * 0.1
    ours = np.asarray(pipe.unet.apply(
        pipe.unet_params, jnp.asarray(x), jnp.array([5]), jnp.asarray(ctx)))
    with torch.no_grad():
        theirs = sd_weights_dir["unet"](
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.tensor([5]), torch.from_numpy(ctx),
        ).numpy().transpose(0, 2, 3, 1)
    # one conv weight rode through BF16 (rel err ~4e-3); everything else f32
    assert np.abs(ours - theirs).mean() < 5e-3

    img = rs.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    lat = np.asarray(pipe.vae_encode(jnp.asarray(img)))
    assert np.isfinite(lat).all()

    # warm: params restored from the orbax cache must be IDENTICAL
    pipe2 = create_sd_pipeline(weights_dir=root, tiny=True,
                               num_inference_steps=4, with_tokenizer=False)
    for a, b in zip(jax.tree_util.tree_leaves(pipe.unet_params),
                    jax.tree_util.tree_leaves(pipe2.unet_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sd_weights_dir_missing_ckpt_fails_loudly(tmp_path):
    from hedit_tpu.pipelines.sd import create_sd_pipeline

    (tmp_path / "unet").mkdir()
    with pytest.raises(FileNotFoundError, match="unet"):
        create_sd_pipeline(weights_dir=str(tmp_path), tiny=True,
                           with_tokenizer=False)


@needs_reference
def test_celeba_ckpt_dataparallel_prefixes(tmp_path):
    """HEDIT_CELEBA_CKPT path: a torch ``.ckpt`` whose keys carry the
    DataParallel ``module.`` prefix (the reference's own strip loop is buggy
    — ``main_edit.py:105-114`` iterates the wrong dict; ours must work)."""
    ref = _load_ref_module("ref_ddpm_diffusion_ckpt",
                           "face-swapping/diffusion/diffusion.py")
    cfg_dict = {
        "type": "simple", "in_channels": 3, "out_ch": 3, "ch": 32,
        "ch_mult": [1, 2], "num_res_blocks": 2, "attn_resolutions": [8],
        "dropout": 0.0, "resamp_with_conv": True, "image_size": 16,
        "num_diffusion_timesteps": 10,
    }
    tm = ref.Model(cfg_dict)
    _randomize(tm, 0)
    prefixed = {"module." + k: v for k, v in tm.state_dict().items()}
    ckpt = tmp_path / "celeba_hq.ckpt"
    torch.save(prefixed, str(ckpt))

    from hedit_tpu.pipelines.face import create_face_pipeline

    pipe = create_face_pipeline(tiny=True, num_inference_steps=4,
                                celeba_ckpt=str(ckpt), with_rewards=False)
    rs = np.random.RandomState(1)
    x = rs.randn(1, 16, 16, 3).astype(np.float32)
    ours = np.asarray(pipe.unet.apply(pipe.unet_params, jnp.asarray(x),
                                      jnp.array([3])))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    torch.tensor([3])).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@needs_reference
@_pytest_mod.mark.slow
def test_face_reward_env_ckpt_loaders(tmp_path, monkeypatch):
    """The HEDIT_ARCFACE_CKPT / HEDIT_LPIPS_CKPT / HEDIT_PARSER_CKPT chain:
    reference-module state dicts serialized to .pth, loaded through the CLI's
    env-var defaults into create_face_pipeline, and forward-checked."""
    import importlib
    import sys

    REF = "/root/reference"
    sys.path.insert(0, os.path.join(REF, "face-swapping", "arcface"))
    try:
        model_irse = importlib.import_module("facial_recognition.model_irse")
    finally:
        sys.path.pop(0)
    arc_t = model_irse.Backbone(input_size=112, num_layers=50,
                                drop_ratio=0.6, mode="ir_se")
    _randomize(arc_t, 1)
    arc_pth = tmp_path / "model_ir_se50.pth"
    torch.save(arc_t.state_dict(), str(arc_pth))

    ref_parse = _load_ref_module("ref_face_parsing_ckpt",
                                 "face-swapping/arcface/face_parsing_model.py")
    par_t = ref_parse.FaceParsing()
    _randomize(par_t, 2)
    par_pth = tmp_path / "face_parsing.pth"
    torch.save(par_t.state_dict(), str(par_pth))

    from test_torch_parity import _TorchLPIPSVgg

    lp_t = _TorchLPIPSVgg()
    _randomize(lp_t, 3)
    lp_pth = tmp_path / "lpips_vgg.pth"
    torch.save(lp_t.state_dict(), str(lp_pth))

    # the CLI reads these env vars as argparse defaults
    monkeypatch.setenv("HEDIT_ARCFACE_CKPT", str(arc_pth))
    monkeypatch.setenv("HEDIT_LPIPS_CKPT", str(lp_pth))
    monkeypatch.setenv("HEDIT_PARSER_CKPT", str(par_pth))
    from hedit_tpu.cli.main_face import parse_args

    args = parse_args(["--ref", "r.jpg", "--source", "s.jpg", "--tiny"])
    assert args.arcface_ckpt == str(arc_pth)
    assert args.lpips_ckpt == str(lp_pth)
    assert args.parser_ckpt == str(par_pth)

    from hedit_tpu.pipelines.face import create_face_pipeline

    pipe = create_face_pipeline(
        tiny=True, num_inference_steps=4, arcface_ckpt=args.arcface_ckpt,
        lpips_ckpt=args.lpips_ckpt, parser_ckpt=args.parser_ckpt,
    )
    rs = np.random.RandomState(4)
    face = rs.rand(1, 112, 112, 3).astype(np.float32) * 2 - 1
    emb = np.asarray(pipe.id_embed(jnp.asarray(face)))
    with torch.no_grad():
        # ascontiguousarray: the reference's Flatten uses .view, which
        # rejects the non-contiguous transpose result
        emb_t = arc_t(torch.from_numpy(
            np.ascontiguousarray(face.transpose(0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(emb, emb_t, rtol=1e-4, atol=2e-5)

    img = rs.rand(1, 16, 16, 3).astype(np.float32) * 2 - 1
    lp = float(pipe.lpips_loss_fn(jnp.asarray(img))(jnp.asarray(img) * 0.5))
    assert np.isfinite(lp)
    seg = np.asarray(pipe.parse(jnp.asarray(img)))
    assert np.isfinite(seg).all()


@_pytest_mod.mark.slow
def test_sd15_full_checkpoint_surface_pinned():
    """Full-size SD-1.5 checkpoint key/shape census (zero weight bytes):
    meta-device torch replicas at real SD-1.5 dims -> converters ->
    validate_against the full Flax templates.  Any converter key drift or
    shape mismatch fails here, BEFORE real weights arrive."""
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel as HFModel

    from hedit_tpu.io_utils.weights import (
        convert_clip_text, convert_unet, convert_vae, validate_against,
    )
    from hedit_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig
    from hedit_tpu.models.vae import AutoencoderKL, VAEConfig

    with torch.device("meta"):
        tm_unet = _TorchSDUNet(chans=(320, 640, 1280, 1280), heads=8,
                               ctx=768, layers=2)
        tm_vae = _TorchSDVAE(chans=(128, 256, 512, 512), latent=4, layers=2)
        hf_cfg = HFConfig(
            vocab_size=49408, hidden_size=768, num_hidden_layers=12,
            num_attention_heads=12, intermediate_size=3072,
            max_position_embeddings=77,
        )
        tm_text = HFModel(hf_cfg)

    def meta_np(model):
        # zeros with the right shapes; weights never materialize on CPU
        return {k: np.zeros(tuple(v.shape), np.float32)
                for k, v in model.state_dict().items()}

    unet_state = meta_np(tm_unet)
    vae_state = meta_np(tm_vae)
    text_state = meta_np(tm_text)
    # the diffusers SD-1.5 checkpoint surfaces, pinned
    assert sum(v.size for v in unet_state.values()) == 859_520_964
    assert sum(v.size for v in vae_state.values()) == 83_653_863
    assert sum(v.size for v in text_state.values()) == 123_060_480

    rng = jax.random.PRNGKey(0)
    unet = UNet2DCondition(UNetConfig.sd15())
    vae = AutoencoderKL(VAEConfig.sd())
    text = CLIPTextModel(CLIPTextConfig.sd15())
    unet_t = jax.eval_shape(unet.init, rng, jnp.zeros((1, 64, 64, 4)),
                            jnp.array(1), jnp.zeros((1, 77, 768)))
    vae_t = jax.eval_shape(vae.init, rng, jnp.zeros((1, 512, 512, 3)))
    text_t = jax.eval_shape(text.init, rng,
                            jnp.zeros((1, 77), jnp.int32))

    validate_against(unet_t, convert_unet(unet_state), "unet_sd15_full")
    validate_against(vae_t, convert_vae(vae_state), "vae_sd_full")
    validate_against(text_t, convert_clip_text(text_state),
                     "text_encoder_sd15_full")
