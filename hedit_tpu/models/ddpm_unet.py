"""Flax CelebA-HQ pixel-space DDPM UNet (SDEdit checkpoint architecture).

Parity: ``face-swapping/diffusion/diffusion.py`` — the in-repo "simple" DDPM
model: GroupNorm(32, eps 1e-6) + swish, sinusoidal temb (fairseq variant,
:6-24), ResnetBlock with temb projection (:77-134), single-head AttnBlock with
1x1 convs and c^-0.5 scaling (:137-190), asymmetric-padded stride-2 downsample
(:55-74), nearest upsample + conv (:36-52).  Config as hardcoded at
``face-swapping/main_edit.py:84-100``: ch=128, ch_mult (1,1,2,2,4,4),
2 res blocks, attention at 16x16, 256x256x3.

Layout NHWC; module names mirror the torch attribute paths so the ckpt port
(``celeba_hq.ckpt``) is mechanical.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class DDPMConfig:
    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    in_channels: int = 3
    resolution: int = 256
    resamp_with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def celeba_hq() -> "DDPMConfig":
        return DDPMConfig()

    @staticmethod
    def tiny() -> "DDPMConfig":
        return DDPMConfig(ch=32, ch_mult=(1, 2), resolution=16,
                          attn_resolutions=(8,))


def ddpm_timestep_embedding(timesteps, dim: int) -> jnp.ndarray:
    """Fairseq-style sinusoidal embedding ([sin, cos], denominator half-1)."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    out = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, [(0, 0), (0, 1)])
    return out


def _norm(name):
    # nn.GroupNorm, MEASURED fastest at this model's B=1 f32 256^2 shapes:
    # 6.68 ms/fwd vs 11.2 with FusedGroupNorm (whose two-pass torch-parity
    # variance reads the huge activation twice; the Pallas kernel only fits
    # the <=64^2 slabs).  The activation stays a separate op at call sites.
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)


class DDPMResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_ch = x.shape[-1]
        h = nn.swish(_norm("norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="temb_proj")(
            nn.swish(temb)
        )
        h = h + t[:, None, None, :]
        h = nn.swish(_norm("norm2")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x + h


class DDPMAttnBlock(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _norm("norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h)
        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        w = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w * (c ** -0.5), axis=2).astype(v.dtype)
        h = jnp.einsum("bij,bjc->bic", w, v)
        h = h.reshape(b, hh, ww, c)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return x + h


class DDPMDownsample(nn.Module):
    with_conv: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            # torch: asymmetric pad (right, bottom) then stride-2 valid conv
            x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
            return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                           dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DDPMUpsample(nn.Module):
    with_conv: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        if self.with_conv:
            x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name="conv")(x)
        return x


class DDPMUNet(nn.Module):
    cfg: DDPMConfig

    @nn.compact
    def __call__(self, x, t):
        cfg = self.cfg
        num_res = len(cfg.ch_mult)
        temb_ch = cfg.ch * 4

        if jnp.ndim(t) == 0:
            t = jnp.broadcast_to(t, (x.shape[0],))
        temb = ddpm_timestep_embedding(t, cfg.ch)
        temb = nn.Dense(temb_ch, dtype=cfg.dtype, name="temb_dense_0")(temb)
        temb = nn.swish(temb)
        temb = nn.Dense(temb_ch, dtype=cfg.dtype, name="temb_dense_1")(temb)

        hs = [nn.Conv(cfg.ch, (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype,
                      name="conv_in")(x)]
        curr_res = cfg.resolution
        in_ch_mult = (1,) + cfg.ch_mult
        for i_level in range(num_res):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = DDPMResnetBlock(
                    block_out, dtype=cfg.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(hs[-1], temb)
                if curr_res in cfg.attn_resolutions:
                    h = DDPMAttnBlock(
                        dtype=cfg.dtype, name=f"down_{i_level}_attn_{i_block}"
                    )(h)
                hs.append(h)
            if i_level != num_res - 1:
                hs.append(
                    DDPMDownsample(cfg.resamp_with_conv, dtype=cfg.dtype,
                                   name=f"down_{i_level}_downsample")(hs[-1])
                )
                curr_res //= 2

        h = hs[-1]
        h = DDPMResnetBlock(h.shape[-1], dtype=cfg.dtype, name="mid_block_1")(h, temb)
        h = DDPMAttnBlock(dtype=cfg.dtype, name="mid_attn_1")(h)
        h = DDPMResnetBlock(h.shape[-1], dtype=cfg.dtype, name="mid_block_2")(h, temb)

        for i_level in reversed(range(num_res)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = DDPMResnetBlock(
                    block_out, dtype=cfg.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(jnp.concatenate([h, hs.pop()], axis=-1), temb)
                if curr_res in cfg.attn_resolutions:
                    h = DDPMAttnBlock(
                        dtype=cfg.dtype, name=f"up_{i_level}_attn_{i_block}"
                    )(h)
            if i_level != 0:
                h = DDPMUpsample(cfg.resamp_with_conv, dtype=cfg.dtype,
                                 name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        h = nn.swish(_norm("norm_out")(h))
        return nn.Conv(cfg.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=cfg.dtype, name="conv_out")(h)


# ------------------------------------------------------------- weight port #

def convert_ddpm_ckpt(state: dict):
    """celeba_hq.ckpt torch keys -> this module's param tree.

    Reference load path: ``face-swapping/main_edit.py:104-114`` (including the
    DataParallel 'module.' prefix possibility; the reference's strip loop is
    buggy — iterates the wrong dict — and is fixed here)."""
    from hedit_tpu.io_utils.weights import convert_state_dict

    state = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state.items()
    }
    fixups = [
        (r"^temb\.dense_0", "temb_dense_0"),
        (r"^temb\.dense_1", "temb_dense_1"),
        (r"^down_(\d+)\.block_(\d+)", r"down_\1_block_\2"),
        (r"^down_(\d+)\.attn_(\d+)", r"down_\1_attn_\2"),
        (r"^down_(\d+)\.downsample", r"down_\1_downsample"),
        (r"^up_(\d+)\.block_(\d+)", r"up_\1_block_\2"),
        (r"^up_(\d+)\.attn_(\d+)", r"up_\1_attn_\2"),
        (r"^up_(\d+)\.upsample", r"up_\1_upsample"),
        (r"^mid\.block_1", "mid_block_1"),
        (r"^mid\.attn_1", "mid_attn_1"),
        (r"^mid\.block_2", "mid_block_2"),
    ]
    out = convert_state_dict(
        state, fixups, skip=lambda k: k.startswith("logvar")
    )
    # 1x1 conv q/k/v/proj_out/nin_shortcut keep HWIO conv layout (handled by
    # the generic 4D rule); nothing else to fix.
    return out
