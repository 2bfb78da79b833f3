"""Flax AutoencoderKL (SD VAE), NHWC.

Parity: diffusers AutoencoderKL as shipped with SD-1.4/1.5.  The reference
uses ``vae.encode(image).latent_dist.mode() * 0.18215`` on the way in
(``text-guided/main_p2p.py:154-159``) and ``vae.decode(w/0.18215)`` on the way
out (``:262-266``); the convenience wrappers here implement exactly that.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from hedit_tpu.models.blocks import ResnetBlock2D, Downsample2D, Upsample2D
from hedit_tpu.ops.attention import controlled_attention
from hedit_tpu.control.base import NO_CONTROL, LayerTag

SD_VAE_SCALE = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    sample_size: int = 512
    dtype: jnp.dtype = jnp.float32
    # route the mid-block attention to the Pallas flash kernel.  Since the
    # routed kernel gained a VJP (ops/flash_attention.py: Pallas/XLA
    # backward), differentiated decodes (the style reward, SURVEY.md 3.4)
    # work either way — the flag is now purely a measured perf choice, not a
    # correctness gate.  (In f32 the [4096, 512] K/V residency fails
    # flash_kv_fits and XLA is used regardless.)
    use_pallas: bool = True

    @staticmethod
    def sd() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(32, 32, 64, 64), sample_size=64)


class VAEAttention(nn.Module):
    """Single-head self-attention at the VAE mid block (diffusers Attention
    with to_q/k/v/to_out on flattened spatial tokens)."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        tag = LayerTag(place="vae", is_cross=False, num_pixels=h * w, index=-1)
        out, _ = controlled_attention(q, k, v, heads=1, layer=tag,
                                      control=NO_CONTROL,
                                      use_pallas=self.use_pallas)
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return out.reshape(b, h, w, c) + residual


class MidBlockVAE(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(self.channels, use_time_emb=False, eps=1e-6,
                          dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttention(self.channels, dtype=self.dtype,
                         use_pallas=self.use_pallas, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, use_time_emb=False, eps=1e-6,
                          dtype=self.dtype, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=cfg.dtype, name="conv_in")(x)
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, use_time_emb=False, eps=1e-6, dtype=cfg.dtype,
                                  name=f"down_blocks_{bi}_resnets_{li}")(x)
            if bi != len(cfg.block_out_channels) - 1:
                # asymmetric (0,1,0,1) pad: the SD VAE encoder quirk — see
                # Downsample2D docstring
                x = Downsample2D(ch, dtype=cfg.dtype, asymmetric_pad=True,
                                 name=f"down_blocks_{bi}_downsamplers_0")(x)
        x = MidBlockVAE(cfg.block_out_channels[-1], dtype=cfg.dtype,
                        use_pallas=cfg.use_pallas, name="mid_block")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=cfg.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        rev = list(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype,
                    name="conv_in")(z)
        x = MidBlockVAE(rev[0], dtype=cfg.dtype, use_pallas=cfg.use_pallas,
                        name="mid_block")(x)
        for bi, ch in enumerate(rev):
            for li in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(ch, use_time_emb=False, eps=1e-6, dtype=cfg.dtype,
                                  name=f"up_blocks_{bi}_resnets_{li}")(x)
            if bi != len(rev) - 1:
                x = Upsample2D(ch, dtype=cfg.dtype,
                               name=f"up_blocks_{bi}_upsamplers_0")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=cfg.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=self.cfg.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=self.cfg.dtype, name="post_quant_conv")

    def encode_moments(self, x):
        """-> (mean, logvar) of the diagonal Gaussian posterior."""
        h = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_mode(self, x):
        """Deterministic latents: `.latent_dist.mode() * 0.18215`
        (``main_p2p.py:159``)."""
        mean, _ = self.encode_moments(x)
        return mean * SD_VAE_SCALE

    def decode(self, z):
        """Image from scaled latents: `vae.decode(w / 0.18215)`
        (``main_p2p.py:262-266``)."""
        return self.decoder(self.post_quant_conv(z / SD_VAE_SCALE))

    def __call__(self, x):
        return self.decode(self.encode_mode(x))
