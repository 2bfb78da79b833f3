"""Cross-framework activation parity of every ported network against the
reference's own torch modules (VERDICT r1 item 2).

For each network: instantiate the REFERENCE torch class (imported from
/root/reference — torch-only modules, no diffusers needed), random-init it
(including randomized BatchNorm running stats so eval-mode BN is actually
exercised), run its state_dict through the repo's converter, and assert the
Flax forward matches the torch forward to float32 tolerance.

Covered:
  * CelebA-HQ DDPM UNet   vs face-swapping/diffusion/diffusion.py:192+
  * IR-SE-50 (ArcFace)    vs arcface/facial_recognition/model_irse.py:9-49
  * Face parser U-Net     vs arcface/face_parsing_model.py:57-121
  * CLIP ViT vision+taps  vs text-guided-n-style/clip_guidance/clip/model.py:230-365
  * VGG16-LPIPS           vs a hand-built torch replica of lpips.LPIPS(net='vgg')
  * SqueezeNet-LPIPS      vs a hand-built torch replica of lpips net='squeeze'
  * DINO ViT              vs a hand-built torch replica of facebookresearch/dino
"""

import importlib
import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_t = torch.nn

REF = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def _load_ref_module(name: str, rel_path: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, rel_path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _state_np(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _randomize(model, seed: int):
    """Random-init every param AND BN running stat (default running stats are
    identity, which would let a mean/var mapping bug pass silently)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for m in model.modules():
            if isinstance(m, (nn_t.BatchNorm1d, nn_t.BatchNorm2d)):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)
    model.eval()


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


# --------------------------------------------------------------------------- #
@needs_reference
def test_ddpm_unet_parity_torch():
    """Tiny-config A/B of the CelebA DDPM UNet converter + module numerics."""
    ref = _load_ref_module("ref_ddpm_diffusion", "face-swapping/diffusion/diffusion.py")
    cfg_dict = {
        "type": "simple", "in_channels": 3, "out_ch": 3, "ch": 32,
        "ch_mult": [1, 2], "num_res_blocks": 2, "attn_resolutions": [8],
        "dropout": 0.0, "resamp_with_conv": True, "image_size": 16,
        "num_diffusion_timesteps": 10,
    }
    tm = ref.Model(cfg_dict)
    _randomize(tm, 0)

    from hedit_tpu.models.ddpm_unet import DDPMConfig, DDPMUNet, convert_ddpm_ckpt

    params = convert_ddpm_ckpt(_state_np(tm))
    model = DDPMUNet(DDPMConfig.tiny())

    rng = np.random.RandomState(1)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    t = np.array([3, 7], np.int64)

    from hedit_tpu.io_utils.weights import validate_against

    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t)
    )
    validate_against(template, params, "ddpm_unet_tiny")

    ours = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(t)))
    with torch.no_grad():
        theirs = tm(_nchw(x), torch.from_numpy(t)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@needs_reference
def test_irse50_parity_torch():
    """Full IR-SE-50 (the architecture is fixed at 112^2/50 layers)."""
    sys.path.insert(0, os.path.join(REF, "face-swapping", "arcface"))
    try:
        model_irse = importlib.import_module("facial_recognition.model_irse")
    finally:
        sys.path.pop(0)
    tm = model_irse.Backbone(input_size=112, num_layers=50, drop_ratio=0.6,
                             mode="ir_se")
    _randomize(tm, 1)

    from hedit_tpu.models.arcface import IRSE50, convert_irse50

    params = convert_irse50(_state_np(tm))
    model = IRSE50()

    rng = np.random.RandomState(2)
    x = (rng.rand(1, 112, 112, 3).astype(np.float32) * 2 - 1)
    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(_nchw(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-5)


@needs_reference
def test_face_parser_parity_torch():
    ref = _load_ref_module("ref_face_parsing", "face-swapping/arcface/face_parsing_model.py")
    tm = ref.FaceParsing()
    _randomize(tm, 2)

    from hedit_tpu.models.face_parser import FaceParsing, convert_face_parser

    params = convert_face_parser(_state_np(tm))
    model = FaceParsing()

    rng = np.random.RandomState(3)
    x = (rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    ours = np.asarray(model.apply(params, jnp.asarray(x), method=FaceParsing.logits))

    # reference forward argmaxes in-place; replay its forward to the logits
    with torch.no_grad():
        xt = _nchw(x)
        c1 = tm.conv1(xt)
        c2 = tm.conv2(tm.maxpool1(c1))
        c3 = tm.conv3(tm.maxpool2(c2))
        c4 = tm.conv4(tm.maxpool3(c3))
        center = tm.center(tm.maxpool4(c4))
        u4 = tm.up_concat4(c4, center)
        u3 = tm.up_concat3(c3, u4)
        u2 = tm.up_concat2(c2, u3)
        u1 = tm.up_concat1(c1, u2)
        theirs = tm.final(u1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    # end-to-end class maps agree too (tm.forward argmaxes NCHW dim 1)
    with torch.no_grad():
        ref_map = tm(_nchw(x)).numpy()[:, 0]
    our_map = np.asarray(model.apply(params, jnp.asarray(x)))
    assert (our_map == ref_map).mean() > 0.99  # ties may flip either way


@needs_reference
def test_clip_vision_taps_parity_torch():
    """Tiny-config A/B of the vendored OpenAI CLIP visual tower, including the
    per-block feature taps the Gram style loss consumes."""
    ref = _load_ref_module("ref_clip_model", "text-guided-n-style/clip_guidance/clip/model.py")
    tm = ref.CLIP(
        embed_dim=16, image_resolution=32, vision_layers=3, vision_width=64,
        vision_patch_size=8, context_length=8, vocab_size=64,
        transformer_width=16, transformer_heads=2, transformer_layers=1,
    )
    _randomize(tm, 3)

    from hedit_tpu.models.clip_vision import (
        CLIPVisionConfig, CLIPVisionTower, convert_clip_vision,
    )

    params = convert_clip_vision(_state_np(tm))
    cfg = CLIPVisionConfig(input_resolution=32, patch_size=8, width=64,
                           layers=3, heads=1, output_dim=16)
    model = CLIPVisionTower(cfg)

    rng = np.random.RandomState(4)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)

    from hedit_tpu.io_utils.weights import validate_against

    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.asarray(x))
    validate_against(template, params, "clip_vision_tiny")

    emb, feats = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        t_emb, t_feats = tm.encode_image_with_features(_nchw(x))
    np.testing.assert_allclose(np.asarray(emb), t_emb.numpy(), rtol=1e-4, atol=1e-5)
    assert len(feats) == len(t_feats) == 3
    for a, b in zip(feats, t_feats):
        # reference taps are LND; ours are [B, L, D]
        np.testing.assert_allclose(
            np.asarray(a), b.permute(1, 0, 2).numpy(), rtol=1e-4, atol=1e-5
        )


# ------------------------------------------------------------------- LPIPS -- #

def _normalize_tensor(x, eps=1e-10):
    # lpips.normalize_tensor: eps OUTSIDE the sqrt
    return x / (torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True)) + eps)


class _TorchLPIPSVgg(nn_t.Module):
    """Replica of lpips.LPIPS(net='vgg'): torchvision VGG16 features with taps
    after relu{1_2,2_2,3_3,4_3,5_3}, unit-normalize, squared diff, 1x1 lin
    heads, spatial mean, sum.  state_dict keys match the lpips/torchvision
    layouts the converter handles (net.features.N / linK.model.1)."""

    TAPS = (3, 8, 15, 22, 29)
    CHANS = (64, 128, 256, 512, 512)

    def __init__(self):
        super().__init__()
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512]
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn_t.MaxPool2d(2))
            else:
                layers += [nn_t.Conv2d(in_ch, v, 3, padding=1), nn_t.ReLU()]
                in_ch = v
        self.net = nn_t.Module()
        self.net.features = nn_t.Sequential(*layers)
        for i, ch in enumerate(self.CHANS):
            lin = nn_t.Module()
            lin.model = nn_t.Sequential(nn_t.Dropout(), nn_t.Conv2d(ch, 1, 1, bias=False))
            setattr(self, f"lin{i}", lin)
        self.register_buffer("shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer("scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def _feats(self, x):
        x = (x - self.shift) / self.scale
        out = []
        for i, layer in enumerate(self.net.features):
            x = layer(x)
            if i in self.TAPS:
                out.append(x)
        return out

    def forward(self, x, y):
        total = 0.0
        for i, (a, b) in enumerate(zip(self._feats(x), self._feats(y))):
            d = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
            w = getattr(self, f"lin{i}").model(d)
            total = total + w.mean(dim=(2, 3)).squeeze(1)
        return total


def test_lpips_vgg_parity_torch():
    tm = _TorchLPIPSVgg()
    _randomize(tm, 5)

    from hedit_tpu.models.lpips_vgg import LPIPSVgg, convert_lpips_vgg

    params = convert_lpips_vgg(_state_np(tm))
    model = LPIPSVgg()

    rng = np.random.RandomState(6)
    x = (rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    y = (rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    ours = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(y)))
    with torch.no_grad():
        theirs = tm(_nchw(x), _nchw(y)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


class _TorchLPIPSSqueeze(nn_t.Module):
    """Replica of lpips.LPIPS(net='squeeze'): SqueezeNet-1.1 features with 7
    taps (relu1, fire3, fire5, fire6..fire9)."""

    CHANS = (64, 128, 256, 384, 384, 512, 512)

    class Fire(nn_t.Module):
        def __init__(self, cin, s, e):
            super().__init__()
            self.squeeze = nn_t.Conv2d(cin, s, 1)
            self.expand1x1 = nn_t.Conv2d(s, e, 1)
            self.expand3x3 = nn_t.Conv2d(s, e, 3, padding=1)

        def forward(self, x):
            s = torch.relu(self.squeeze(x))
            return torch.cat(
                [torch.relu(self.expand1x1(s)), torch.relu(self.expand3x3(s))], 1
            )

    def __init__(self):
        super().__init__()
        F = _TorchLPIPSSqueeze.Fire
        self.net = nn_t.Module()
        self.net.features = nn_t.Sequential(
            nn_t.Conv2d(3, 64, 3, stride=2), nn_t.ReLU(),          # 0, 1
            nn_t.MaxPool2d(3, 2),                                   # 2
            F(64, 16, 64), F(128, 16, 64),                          # 3, 4
            nn_t.MaxPool2d(3, 2),                                   # 5
            F(128, 32, 128), F(256, 32, 128),                       # 6, 7
            nn_t.MaxPool2d(3, 2),                                   # 8
            F(256, 48, 192), F(384, 48, 192),                       # 9, 10
            F(384, 64, 256), F(512, 64, 256),                       # 11, 12
        )
        for i, ch in enumerate(self.CHANS):
            lin = nn_t.Module()
            lin.model = nn_t.Sequential(nn_t.Dropout(), nn_t.Conv2d(ch, 1, 1, bias=False))
            setattr(self, f"lin{i}", lin)
        self.register_buffer("shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer("scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def _feats(self, x):
        x = (x - self.shift) / self.scale
        taps, tap_after = [], {1, 4, 7, 9, 10, 11, 12}
        for i, layer in enumerate(self.net.features):
            x = layer(x)
            if i in tap_after:
                taps.append(x)
        return taps

    def forward(self, x, y):
        total = 0.0
        for i, (a, b) in enumerate(zip(self._feats(x), self._feats(y))):
            d = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
            w = getattr(self, f"lin{i}").model(d)
            total = total + w.mean(dim=(2, 3)).squeeze(1)
        return total


def test_lpips_squeeze_parity_torch():
    tm = _TorchLPIPSSqueeze()
    _randomize(tm, 7)

    from hedit_tpu.models.squeezenet_lpips import LPIPSSqueeze, convert_lpips_squeeze

    params = convert_lpips_squeeze(_state_np(tm))
    model = LPIPSSqueeze()

    rng = np.random.RandomState(8)
    x = (rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    y = (rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    ours = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(y)))
    with torch.no_grad():
        theirs = tm(_nchw(x), _nchw(y)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


# -------------------------------------------------------------------- DINO -- #

class _TorchDinoViT(nn_t.Module):
    """Replica of facebookresearch/dino vision_transformer.py (timm naming:
    patch_embed.proj, cls_token, pos_embed, blocks.N.{norm1,attn.qkv,
    attn.proj,norm2,mlp.fc1,mlp.fc2}, norm) with last-block key extraction."""

    class Block(nn_t.Module):
        def __init__(self, d, h):
            super().__init__()
            self.norm1 = nn_t.LayerNorm(d, eps=1e-6)
            self.attn = nn_t.Module()
            self.attn.qkv = nn_t.Linear(d, 3 * d)
            self.attn.proj = nn_t.Linear(d, d)
            self.norm2 = nn_t.LayerNorm(d, eps=1e-6)
            self.mlp = nn_t.Module()
            self.mlp.fc1 = nn_t.Linear(d, 4 * d)
            self.mlp.fc2 = nn_t.Linear(4 * d, d)
            self.heads = h

        def forward(self, x):
            B, L, D = x.shape
            h = self.heads
            qkv = self.attn.qkv(self.norm1(x))
            qkv = qkv.reshape(B, L, 3, h, D // h).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            s = (q @ k.transpose(-2, -1)) * (D // h) ** -0.5
            out = (s.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, L, D)
            x = x + self.attn.proj(out)
            x = x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
            return x, k

    def __init__(self, patch=8, d=32, layers=2, heads=2, res=32):
        super().__init__()
        self.patch_embed = nn_t.Module()
        self.patch_embed.proj = nn_t.Conv2d(3, d, patch, stride=patch)
        self.cls_token = nn_t.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = nn_t.Parameter(torch.zeros(1, (res // patch) ** 2 + 1, d))
        self.blocks = nn_t.ModuleList(
            [_TorchDinoViT.Block(d, heads) for _ in range(layers)]
        )
        self.norm = nn_t.LayerNorm(d, eps=1e-6)

    def forward(self, x):
        h = self.patch_embed.proj(x)
        B, D, gh, gw = h.shape
        h = h.flatten(2).transpose(1, 2)
        h = torch.cat([self.cls_token.expand(B, -1, -1), h], dim=1) + self.pos_embed
        keys = None
        for blk in self.blocks:
            h, keys = blk(h)
        h = self.norm(h)
        return h[:, 0], keys


def test_dino_vit_parity_torch():
    tm = _TorchDinoViT()
    _randomize(tm, 9)

    from hedit_tpu.models.vit_dino import DINOViT, ViTConfig, convert_dino_vit

    params = convert_dino_vit(_state_np(tm))
    model = DINOViT(ViTConfig.tiny())

    rng = np.random.RandomState(10)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)

    from hedit_tpu.io_utils.weights import validate_against

    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.asarray(x))
    validate_against(template, params, "dino_vit_tiny")

    emb, keys = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        t_emb, t_keys = tm(_nchw(x))
    np.testing.assert_allclose(np.asarray(emb), t_emb.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(keys), t_keys.numpy(), rtol=1e-4, atol=1e-5)


# --------------------------------------------------- eval CLIP embedder ---- #

@needs_reference
def test_eval_clip_embedder_parity_openai():
    """The PieBench metric embedder (text EOT-pool @ projection + vision
    tower) against the vendored OpenAI CLIP's encode_text/encode_image —
    the checkpoint family the reference's directional metric loads
    (local_clip_evaluation.py:49)."""
    ref = _load_ref_module("ref_clip_model2", "text-guided-n-style/clip_guidance/clip/model.py")
    tm = ref.CLIP(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=12, vocab_size=50,
        transformer_width=32, transformer_heads=2, transformer_layers=2,
    )
    _randomize(tm, 11)

    from hedit_tpu.eval_harness.clip_embed import (
        CLIPTextEmbed, convert_openai_or_hf_clip,
    )
    from hedit_tpu.models.clip_text import CLIPTextConfig
    from hedit_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionTower

    tp, vp = convert_openai_or_hf_clip(_state_np(tm))
    tcfg = CLIPTextConfig(vocab_size=50, hidden_size=32, num_layers=2,
                          num_heads=2, max_position_embeddings=12,
                          intermediate_size=128)
    text = CLIPTextEmbed(tcfg, embed_dim=16)
    vcfg = CLIPVisionConfig(input_resolution=32, patch_size=8, width=64,
                            layers=2, heads=1, output_dim=16)
    vision = CLIPVisionTower(vcfg)

    from hedit_tpu.io_utils.weights import validate_against

    ids = np.zeros((2, 12), np.int64)
    rng = np.random.RandomState(12)
    ids[:, 0] = 1
    ids[:, 1:5] = rng.randint(2, 48, size=(2, 4))
    ids[:, 5] = 49  # EOT = highest id (argmax pooling position)
    template = jax.eval_shape(text.init, jax.random.PRNGKey(0),
                              jnp.asarray(ids, jnp.int32))
    validate_against(template, tp, "clip_text_embed_tiny")

    ours_t = np.asarray(text.apply(
        jax.tree_util.tree_map(jnp.asarray, tp), jnp.asarray(ids, jnp.int32)))
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    ours_v, _ = vision.apply(jax.tree_util.tree_map(jnp.asarray, vp),
                             jnp.asarray(x))
    with torch.no_grad():
        theirs_t = tm.encode_text(torch.from_numpy(ids)).numpy()
        theirs_v = tm.encode_image(_nchw(x)).numpy()
    np.testing.assert_allclose(ours_t, theirs_t, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_v), theirs_v, rtol=1e-4, atol=1e-5)
