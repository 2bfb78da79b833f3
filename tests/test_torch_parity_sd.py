"""Activation parity of the SD-1.x UNet / VAE converters against hand-built
torch replicas of the diffusers modules (closes the last two PARITY.md 🟡
rows — diffusers itself is absent in this image, so the replicas implement
``UNet2DConditionModel`` / ``AutoencoderKL`` exactly as SD-1.4/1.5 configures
them, with state_dict keys matching the diffusers layout the converters in
``io_utils/weights.py`` handle).

Same recipe as tests/test_torch_parity.py (VERDICT r1 item 2): random-init
torch replica -> state_dict -> convert_unet/convert_vae -> Flax forward
== torch forward to float32 tolerance.

Quirks locked in by these tests (each was a real deviation caught when the
replicas were first run):
  * GEGLU uses EXACT (erf) gelu — torch F.gelu default, not tanh-approx;
  * transformer LayerNorms use eps=1e-5 (torch default), GroupNorms 1e-5 in
    resnets / 1e-6 in Transformer2D+VAE (diffusers values);
  * the VAE ENCODER downsamplers pad (0,1,0,1) asymmetrically
    (diffusers Encoder passes downsample_padding=0; CompVis ldm heritage),
    while the UNet downsamplers pad symmetrically.

Reference config source: the reference loads these modules via
``StableDiffusionPipeline.from_pretrained`` (``text-guided/main_p2p.py:98-106``).
"""

import pytest as _pytest_mod
pytestmark = _pytest_mod.mark.slow  # heavy lane; fast lane = -m "not slow"

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_t = torch.nn
F_t = torch.nn.functional


def _state_np(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _randomize(model, seed: int):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    model.eval()


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


# ------------------------------------------------------------------ shared -- #

class _TResnet(nn_t.Module):
    """diffusers ResnetBlock2D (SD config: GN32 + silu, optional temb)."""

    def __init__(self, cin, cout, temb_dim=None, eps=1e-5):
        super().__init__()
        self.norm1 = nn_t.GroupNorm(32, cin, eps=eps)
        self.conv1 = nn_t.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn_t.Linear(temb_dim, cout)
        self.norm2 = nn_t.GroupNorm(32, cout, eps=eps)
        self.conv2 = nn_t.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn_t.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F_t.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F_t.silu(temb))[:, :, None, None]
        h = self.conv2(F_t.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class _TDown(nn_t.Module):
    def __init__(self, ch, asymmetric: bool):
        super().__init__()
        self.asymmetric = asymmetric
        self.conv = nn_t.Conv2d(ch, ch, 3, stride=2,
                                padding=0 if asymmetric else 1)

    def forward(self, x):
        if self.asymmetric:  # SD VAE encoder quirk (downsample_padding=0)
            x = F_t.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class _TUp(nn_t.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn_t.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F_t.interpolate(x, scale_factor=2.0, mode="nearest"))


class _TAttn(nn_t.Module):
    """diffusers Attention: to_q/k/v (no bias) + to_out.0."""

    def __init__(self, dim, heads, dim_head, ctx=None):
        super().__init__()
        inner = heads * dim_head
        self.to_q = nn_t.Linear(dim, inner, bias=False)
        self.to_k = nn_t.Linear(ctx or dim, inner, bias=False)
        self.to_v = nn_t.Linear(ctx or dim, inner, bias=False)
        self.to_out = nn_t.Sequential(nn_t.Linear(inner, dim), nn_t.Dropout())
        self.heads, self.dim_head = heads, dim_head

    def forward(self, x, ctx=None):
        c = x if ctx is None else ctx
        B, L, _ = x.shape

        def sh(t):
            return t.reshape(B, -1, self.heads, self.dim_head).transpose(1, 2)

        q, k, v = sh(self.to_q(x)), sh(self.to_k(c)), sh(self.to_v(c))
        s = (q @ k.transpose(-2, -1)) * self.dim_head ** -0.5
        o = (s.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, L, -1)
        return self.to_out(o)


class _TGEGLU(nn_t.Module):
    def __init__(self, dim, dim_out):
        super().__init__()
        self.proj = nn_t.Linear(dim, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F_t.gelu(gate)  # exact erf gelu (torch default)


class _TFF(nn_t.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn_t.ModuleList(
            [_TGEGLU(dim, dim * mult), nn_t.Dropout(), nn_t.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class _TBasicBlock(nn_t.Module):
    def __init__(self, dim, heads, dim_head, ctx):
        super().__init__()
        self.norm1 = nn_t.LayerNorm(dim)  # torch default eps=1e-5
        self.attn1 = _TAttn(dim, heads, dim_head)
        self.norm2 = nn_t.LayerNorm(dim)
        self.attn2 = _TAttn(dim, heads, dim_head, ctx)
        self.norm3 = nn_t.LayerNorm(dim)
        self.ff = _TFF(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class _TTransformer2D(nn_t.Module):
    """SD-1.x Transformer2DModel (conv projections)."""

    def __init__(self, c, heads, dim_head, ctx, depth=1):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn_t.GroupNorm(32, c, eps=1e-6)
        self.proj_in = nn_t.Conv2d(c, inner, 1)
        self.transformer_blocks = nn_t.ModuleList(
            [_TBasicBlock(inner, heads, dim_head, ctx) for _ in range(depth)]
        )
        self.proj_out = nn_t.Conv2d(inner, c, 1)

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, -1)
        for blk in self.transformer_blocks:
            h = blk(h, ctx)
        h = h.reshape(B, H, W, -1).permute(0, 3, 1, 2)
        return self.proj_out(h) + res


# ------------------------------------------------------------------- UNet --- #

class _TorchSDUNet(nn_t.Module):
    """UNet2DConditionModel at the repo's tiny test config (same topology as
    SD-1.5: 3x CrossAttnDownBlock2D + DownBlock2D / mid / UpBlock2D + 3x
    CrossAttnUpBlock2D, layers_per_block=2, conv Transformer projections)."""

    CROSS_DOWN = (True, True, True, False)
    CROSS_UP = (False, True, True, True)

    def __init__(self, chans=(32, 64, 64, 64), heads=2, ctx=32, layers=2):
        super().__init__()
        b0 = chans[0]
        self.b0, temb_dim = b0, 4 * b0
        self.conv_in = nn_t.Conv2d(4, b0, 3, padding=1)
        self.time_embedding = nn_t.Module()
        self.time_embedding.linear_1 = nn_t.Linear(b0, temb_dim)
        self.time_embedding.linear_2 = nn_t.Linear(temb_dim, temb_dim)

        skip_ch = [b0]
        cin = b0
        self.down_blocks = nn_t.ModuleList()
        for bi, ch in enumerate(chans):
            blk = nn_t.Module()
            blk.resnets = nn_t.ModuleList()
            if self.CROSS_DOWN[bi]:
                blk.attentions = nn_t.ModuleList()
            for _ in range(layers):
                blk.resnets.append(_TResnet(cin, ch, temb_dim))
                cin = ch
                if self.CROSS_DOWN[bi]:
                    blk.attentions.append(
                        _TTransformer2D(ch, heads, ch // heads, ctx))
                skip_ch.append(ch)
            if bi != len(chans) - 1:
                blk.downsamplers = nn_t.ModuleList([_TDown(ch, False)])
                skip_ch.append(ch)
            self.down_blocks.append(blk)

        mid_ch = chans[-1]
        self.mid_block = nn_t.Module()
        self.mid_block.resnets = nn_t.ModuleList(
            [_TResnet(mid_ch, mid_ch, temb_dim), _TResnet(mid_ch, mid_ch, temb_dim)]
        )
        self.mid_block.attentions = nn_t.ModuleList(
            [_TTransformer2D(mid_ch, heads, mid_ch // heads, ctx)]
        )

        self.up_blocks = nn_t.ModuleList()
        rev = list(reversed(chans))
        for bi, ch in enumerate(rev):
            blk = nn_t.Module()
            blk.resnets = nn_t.ModuleList()
            if self.CROSS_UP[bi]:
                blk.attentions = nn_t.ModuleList()
            for _ in range(layers + 1):
                blk.resnets.append(_TResnet(cin + skip_ch.pop(), ch, temb_dim))
                cin = ch
                if self.CROSS_UP[bi]:
                    blk.attentions.append(
                        _TTransformer2D(ch, heads, ch // heads, ctx))
            if bi != len(rev) - 1:
                blk.upsamplers = nn_t.ModuleList([_TUp(ch)])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn_t.GroupNorm(32, b0, eps=1e-5)
        self.conv_out = nn_t.Conv2d(b0, 4, 3, padding=1)

    def _temb(self, t):
        half = self.b0 // 2
        # compute in the parameter dtype (float32 normally; float64 when the
        # module was .double()'d for the f64 null-text certification)
        dt = self.time_embedding.linear_1.weight.dtype
        freqs = torch.exp(
            -math.log(10000.0) * torch.arange(half, dtype=dt) / half
        )
        args = t.to(dt)[:, None] * freqs[None]
        emb = torch.cat([args.cos(), args.sin()], dim=-1)  # flip_sin_to_cos
        return self.time_embedding.linear_2(
            F_t.silu(self.time_embedding.linear_1(emb)))

    def forward(self, x, t, ctx):
        temb = self._temb(t)
        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            for li, rn in enumerate(blk.resnets):
                h = rn(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[li](h, ctx)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for li, rn in enumerate(blk.resnets):
                h = rn(torch.cat([h, skips.pop()], dim=1), temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[li](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F_t.silu(self.conv_norm_out(h)))


def test_sd_unet_parity_torch():
    tm = _TorchSDUNet()
    _randomize(tm, 20)

    from hedit_tpu.io_utils.weights import convert_unet, validate_against
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig

    params = convert_unet(_state_np(tm))
    model = UNet2DCondition(UNetConfig.tiny())

    rng = np.random.RandomState(21)
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    t = np.array([3, 7], np.int64)
    ctx = rng.randn(2, 11, 32).astype(np.float32)

    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(ctx),
    )
    validate_against(template, params, "sd_unet_tiny")

    ours = np.asarray(
        model.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)))
    with torch.no_grad():
        theirs = tm(_nchw(x), torch.from_numpy(t),
                    torch.from_numpy(ctx)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


# -------------------------------------------------------------------- VAE --- #

class _TVAEAttn(nn_t.Module):
    """diffusers AutoencoderKL mid-block Attention: single head, biased
    q/k/v projections, modern to_q/to_k/to_v/to_out.0 naming."""

    def __init__(self, c):
        super().__init__()
        self.group_norm = nn_t.GroupNorm(32, c, eps=1e-6)
        self.to_q = nn_t.Linear(c, c)
        self.to_k = nn_t.Linear(c, c)
        self.to_v = nn_t.Linear(c, c)
        self.to_out = nn_t.Sequential(nn_t.Linear(c, c), nn_t.Dropout())

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        s = (q @ k.transpose(-2, -1)) * C ** -0.5
        o = self.to_out(s.softmax(dim=-1) @ v)
        return o.reshape(B, H, W, C).permute(0, 3, 1, 2) + x


class _TorchSDVAE(nn_t.Module):
    """AutoencoderKL at the repo's tiny test config (same topology as the SD
    VAE: 4 encoder blocks x2 resnets with asymmetric-pad downsamples, mid
    attention, 4 decoder blocks x3 resnets with upsamples)."""

    def __init__(self, chans=(32, 32, 64, 64), latent=4, layers=2):
        super().__init__()

        enc = nn_t.Module()
        enc.conv_in = nn_t.Conv2d(3, chans[0], 3, padding=1)
        enc.down_blocks = nn_t.ModuleList()
        cin = chans[0]
        for bi, ch in enumerate(chans):
            blk = nn_t.Module()
            blk.resnets = nn_t.ModuleList()
            for _ in range(layers):
                blk.resnets.append(_TResnet(cin, ch, None, eps=1e-6))
                cin = ch
            if bi != len(chans) - 1:
                blk.downsamplers = nn_t.ModuleList([_TDown(ch, True)])
            enc.down_blocks.append(blk)
        enc.mid_block = nn_t.Module()
        enc.mid_block.resnets = nn_t.ModuleList(
            [_TResnet(chans[-1], chans[-1], None, eps=1e-6) for _ in range(2)]
        )
        enc.mid_block.attentions = nn_t.ModuleList([_TVAEAttn(chans[-1])])
        enc.conv_norm_out = nn_t.GroupNorm(32, chans[-1], eps=1e-6)
        enc.conv_out = nn_t.Conv2d(chans[-1], 2 * latent, 3, padding=1)
        self.encoder = enc

        dec = nn_t.Module()
        rev = list(reversed(chans))
        dec.conv_in = nn_t.Conv2d(latent, rev[0], 3, padding=1)
        dec.mid_block = nn_t.Module()
        dec.mid_block.resnets = nn_t.ModuleList(
            [_TResnet(rev[0], rev[0], None, eps=1e-6) for _ in range(2)]
        )
        dec.mid_block.attentions = nn_t.ModuleList([_TVAEAttn(rev[0])])
        dec.up_blocks = nn_t.ModuleList()
        cin = rev[0]
        for bi, ch in enumerate(rev):
            blk = nn_t.Module()
            blk.resnets = nn_t.ModuleList()
            for _ in range(layers + 1):
                blk.resnets.append(_TResnet(cin, ch, None, eps=1e-6))
                cin = ch
            if bi != len(rev) - 1:
                blk.upsamplers = nn_t.ModuleList([_TUp(ch)])
            dec.up_blocks.append(blk)
        dec.conv_norm_out = nn_t.GroupNorm(32, chans[0], eps=1e-6)
        dec.conv_out = nn_t.Conv2d(chans[0], 3, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn_t.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn_t.Conv2d(latent, latent, 1)

    def encode_moments(self, x):
        h = self.encoder.conv_in(x)
        for blk in self.encoder.down_blocks:
            for rn in blk.resnets:
                h = rn(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = self.encoder.mid_block.resnets[0](h)
        h = self.encoder.mid_block.attentions[0](h)
        h = self.encoder.mid_block.resnets[1](h)
        h = self.encoder.conv_out(F_t.silu(self.encoder.conv_norm_out(h)))
        return self.quant_conv(h).chunk(2, dim=1)

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block.resnets[0](h)
        h = self.decoder.mid_block.attentions[0](h)
        h = self.decoder.mid_block.resnets[1](h)
        for blk in self.decoder.up_blocks:
            for rn in blk.resnets:
                h = rn(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.decoder.conv_out(F_t.silu(self.decoder.conv_norm_out(h)))


def test_geglu_bf16_tanh_form_is_subulp():
    """The bf16 GEGLU path uses the tanh gelu (erf measures +7% e2e,
    scripts/gelu_ab.py).  Exhaustively prove over all 2^16 bf16 inputs that
    the substitution is below bf16 noise: 99.4%+ of inputs round to the
    BIT-IDENTICAL bf16 gelu, and every deviation is <= 1 bf16 ulp of the
    exact value OR absolutely < 5e-4 (the small-|g| dip/tail regions), i.e.
    ~8x below the ~4e-3 per-term rounding noise the surrounding bf16 matmul
    already imposes on O(1) activations."""
    import ml_dtypes
    from scipy.special import erf as _erf

    bits = np.arange(65536, dtype=np.uint16)
    x = bits.view(ml_dtypes.bfloat16).astype(np.float64)
    x = x[np.isfinite(x)]
    g_exact = 0.5 * x * (1 + _erf(x / np.sqrt(2)))
    g_tanh = 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))
    be = g_exact.astype(ml_dtypes.bfloat16)
    bt = g_tanh.astype(ml_dtypes.bfloat16)
    assert (be != bt).mean() < 0.006  # 99.4%+ bit-identical in bf16
    # deviation bound: one bf16 ulp of the exact output, floored at 5e-4
    diff = np.abs(g_exact - g_tanh)
    with np.errstate(divide="ignore"):
        ulp = np.exp2(np.floor(np.log2(np.maximum(np.abs(g_exact), 1e-300))) - 8)
    assert np.all(diff <= np.maximum(ulp, 5e-4))


def test_sd_vae_parity_torch():
    tm = _TorchSDVAE()
    _randomize(tm, 22)

    from hedit_tpu.io_utils.weights import convert_vae, validate_against
    from hedit_tpu.models.vae import SD_VAE_SCALE, AutoencoderKL, VAEConfig

    params = convert_vae(_state_np(tm))
    model = AutoencoderKL(VAEConfig.tiny())

    rng = np.random.RandomState(23)
    x = (rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)

    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.asarray(x))
    validate_against(template, params, "sd_vae_tiny")

    # encoder path: latent_dist.mode() * scale (main_p2p.py:159)
    ours_z = np.asarray(
        model.apply(params, jnp.asarray(x), method=AutoencoderKL.encode_mode))
    with torch.no_grad():
        mean, _ = tm.encode_moments(_nchw(x))
        theirs_z = (mean * SD_VAE_SCALE).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours_z, theirs_z, rtol=1e-4, atol=1e-5)

    # decoder path: vae.decode(w / scale) (main_p2p.py:262-266)
    z = (rng.rand(1, 4, 4, 4).astype(np.float32) * 2 - 1)
    ours_img = np.asarray(
        model.apply(params, jnp.asarray(z), method=AutoencoderKL.decode))
    with torch.no_grad():
        theirs_img = tm.decode(
            _nchw(z) / SD_VAE_SCALE).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours_img, theirs_img, rtol=1e-4, atol=1e-5)
