"""Flax UNet-2D-condition (Stable Diffusion 1.x backbone), TPU layout (NHWC).

Architecture parity: diffusers ``UNet2DConditionModel`` as instantiated by
``StableDiffusionPipeline.from_pretrained('CompVis/stable-diffusion-v1-4')``
(``text-guided/main_p2p.py:98-106``): 4/64/64 latents, block channels
(320, 640, 1280, 1280), 3×CrossAttnDownBlock2D + DownBlock2D, mid cross-attn
block, UpBlock2D + 3×CrossAttnUpBlock2D, 8 heads, context dim 768.

Every attention layer carries a static ``LayerTag`` (place, is_cross,
num_pixels, store index, PnP site indices) so the functional controllers can
make static routing decisions — the analog of the reference's
``register_attention_control`` walk (``ptp_utils.py:277-295``) resolved at
module-construction time instead of runtime monkey-patching.

Feature-injection hook: after each up-block resnet the control's
``map_features(h, site)`` runs — PnP's conv injection site is
``up_1_resnet_1`` (``pnp_utils.py:95-155``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from hedit_tpu.control.base import LayerTag, NO_CONTROL
from hedit_tpu.models.blocks import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    cross_attn_down: Tuple[bool, ...] = (True, True, True, False)
    cross_attn_up: Tuple[bool, ...] = (False, True, True, True)
    layers_per_block: int = 2
    num_heads: int = 8
    cross_attention_dim: int = 768
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def sd15() -> "UNetConfig":
        return UNetConfig()

    @staticmethod
    def tiny(sample_size: int = 16) -> "UNetConfig":
        """Seeded-random test model: same topology, tiny widths.

        Used for golden-numerics tests (SURVEY.md §4) where no pretrained
        weights exist in the environment."""
        return UNetConfig(
            sample_size=sample_size,
            block_out_channels=(32, 64, 64, 64),
            num_heads=2,
            cross_attention_dim=32,
        )


def _build_tags(cfg: UNetConfig):
    """Enumerate attention layers in forward order, assigning LayerTags."""
    tags = {"down": [], "mid": [], "up": []}
    counters = {}
    index = 0

    def tag(place, is_cross, pixels, up_idx=-1, inner=-1):
        nonlocal index
        key = (place, is_cross)
        store_idx = -1
        if pixels <= 32 * 32:
            store_idx = counters.get(key, 0)
            counters[key] = store_idx + 1
        t = LayerTag(
            place=place, is_cross=is_cross, num_pixels=pixels, index=index,
            store_index=store_idx, up_block_index=up_idx, inner_index=inner,
        )
        index += 1
        return t

    res = cfg.sample_size
    for bi, has_attn in enumerate(cfg.cross_attn_down):
        layer = []
        if has_attn:
            for li in range(cfg.layers_per_block):
                px = res * res
                layer.append((tag("down", False, px), tag("down", True, px)))
        tags["down"].append(layer)
        if bi != len(cfg.block_out_channels) - 1:
            res //= 2
    px = res * res
    tags["mid"] = [(tag("mid", False, px), tag("mid", True, px))]
    for bi, has_attn in enumerate(cfg.cross_attn_up):
        layer = []
        if bi > 0:
            res *= 2
        if has_attn:
            for li in range(cfg.layers_per_block + 1):
                px = res * res
                layer.append(
                    (tag("up", False, px, bi, li), tag("up", True, px, bi, li))
                )
        tags["up"].append(layer)
    return tags


class CrossAttnDownBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    tags: tuple
    has_attn: bool
    add_downsample: bool

    @nn.compact
    def __call__(self, x, temb, context, control, use_pallas):
        cfg = self.cfg
        skips = []
        for i in range(cfg.layers_per_block):
            x = ResnetBlock2D(self.out_channels, dtype=cfg.dtype, name=f"resnets_{i}")(x, temb)
            if self.has_attn:
                self_tag, cross_tag = self.tags[i]
                x = Transformer2D(
                    cfg.num_heads, self.out_channels // cfg.num_heads,
                    cfg.cross_attention_dim, self_tag=self_tag, cross_tag=cross_tag,
                    dtype=cfg.dtype, name=f"attentions_{i}",
                )(x, context, control, use_pallas)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=cfg.dtype, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class MidBlock(nn.Module):
    cfg: UNetConfig
    channels: int
    tags: tuple

    @nn.compact
    def __call__(self, x, temb, context, control, use_pallas):
        cfg = self.cfg
        x = ResnetBlock2D(self.channels, dtype=cfg.dtype, name="resnets_0")(x, temb)
        self_tag, cross_tag = self.tags[0]
        x = Transformer2D(
            cfg.num_heads, self.channels // cfg.num_heads, cfg.cross_attention_dim,
            self_tag=self_tag, cross_tag=cross_tag, dtype=cfg.dtype, name="attentions_0",
        )(x, context, control, use_pallas)
        x = ResnetBlock2D(self.channels, dtype=cfg.dtype, name="resnets_1")(x, temb)
        return x


class CrossAttnUpBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    tags: tuple
    has_attn: bool
    add_upsample: bool
    block_index: int

    @nn.compact
    def __call__(self, x, skips, temb, context, control, use_pallas):
        cfg = self.cfg
        for i in range(cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(
                self.out_channels, dtype=cfg.dtype,
                feature_site=f"up_{self.block_index}_resnet_{i}",
                name=f"resnets_{i}",
            )(x, temb, control)
            if self.has_attn:
                self_tag, cross_tag = self.tags[i]
                x = Transformer2D(
                    cfg.num_heads, self.out_channels // cfg.num_heads,
                    cfg.cross_attention_dim, self_tag=self_tag, cross_tag=cross_tag,
                    dtype=cfg.dtype, name=f"attentions_{i}",
                )(x, context, control, use_pallas)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=cfg.dtype, name="upsamplers_0")(x)
        return x


class UNet2DCondition(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, H, W, C] NHWC latents
        timesteps,  # scalar or [B]
        encoder_hidden_states: jnp.ndarray,  # [B, 77, ctx_dim]
        control=NO_CONTROL,
        use_pallas: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        tags = _build_tags(cfg)

        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        temb = timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
            # f32 sinusoid in production (diffusers parity, even for bf16
            # models); f64 only when the model itself is f64 (parity rigs)
            dtype=jnp.float64 if cfg.dtype == jnp.float64 else jnp.float32,
        ).astype(cfg.dtype)
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=cfg.dtype, name="time_embedding"
        )(temb)

        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=cfg.dtype, name="conv_in",
        )(sample)

        skips = [x]
        for bi, ch in enumerate(cfg.block_out_channels):
            last = bi == len(cfg.block_out_channels) - 1
            x, block_skips = CrossAttnDownBlock(
                cfg, ch, tuple(tags["down"][bi]), cfg.cross_attn_down[bi],
                add_downsample=not last, name=f"down_blocks_{bi}",
            )(x, temb, encoder_hidden_states, control, use_pallas)
            skips.extend(block_skips)

        x = MidBlock(cfg, cfg.block_out_channels[-1], tuple(tags["mid"]), name="mid_block")(
            x, temb, encoder_hidden_states, control, use_pallas
        )

        rev = list(reversed(cfg.block_out_channels))
        for bi, ch in enumerate(rev):
            last = bi == len(rev) - 1
            x = CrossAttnUpBlock(
                cfg, ch, tuple(tags["up"][bi]), cfg.cross_attn_up[bi],
                add_upsample=not last, block_index=bi, name=f"up_blocks_{bi}",
            )(x, skips, temb, encoder_hidden_states, control, use_pallas)

        from hedit_tpu.ops.groupnorm import FusedGroupNorm

        x = FusedGroupNorm(num_groups=32, epsilon=1e-5, act="silu",
                           name="conv_norm_out")(x)
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype,
            name="conv_out",
        )(x)
        return x
