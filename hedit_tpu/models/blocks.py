"""Shared Flax building blocks for the SD UNet / VAE.

TPU-first design notes
----------------------
* All spatial tensors are NHWC (TPU conv layout); the reference is NCHW torch.
* Module / parameter names mirror the diffusers attribute paths
  (``down_blocks_0 / attentions_0 / transformer_blocks_0 / attn1 / to_q``) so
  the HF->Flax weight port (``hedit_tpu/io_utils/weights.py``) is a pure
  renaming + transposition.
* Attention is routed through ``hedit_tpu.ops.attention.controlled_attention``
  so attention control (P2P/MasaCtrl/PnP) lives INSIDE jit; stored maps are
  surfaced via flax ``sow`` into the ``attn_store`` collection.

Architecture parity targets: diffusers UNet2DConditionModel /AutoencoderKL as
configured by SD-1.4/1.5 (loaded at ``text-guided/main_p2p.py:98-106``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hedit_tpu.control.base import LayerTag, NO_CONTROL
from hedit_tpu.ops.attention import controlled_attention


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, diffusers `get_timestep_embedding`
    semantics (SD config: flip_sin_to_cos=True, freq_shift=0).

    ``dtype`` is the COMPUTE dtype of the sinusoid: float32 in production
    (matching diffusers even for bf16 models); float64 for the x64 parity
    rigs, where an f32 sinusoid would reintroduce the noise floor the f64
    A/B exists to remove."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=dtype)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(dtype)[:, None] * emb[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, [(0, 0), (0, 1)])
    return out


class TimestepEmbedding(nn.Module):
    """time_embedding MLP: linear_1 -> silu -> linear_2."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample):
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        x = nn.silu(x)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)


class ResnetBlock2D(nn.Module):
    """GN32+silu+conv ×2 with timestep projection and optional skip conv.

    ``feature_site`` names this block for the control's ``map_features`` hook,
    applied to the conv branch AFTER conv2 and BEFORE the skip-add — the exact
    injection point of PnP's conv control (``pnp_utils.py:132-142``)."""

    out_channels: int
    use_time_emb: bool = True
    groups: int = 32
    eps: float = 1e-5
    feature_site: str = ""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, control=NO_CONTROL):
        from hedit_tpu.ops.groupnorm import FusedGroupNorm
        from hedit_tpu.ops.int8_conv import Int8RoutableConv

        in_channels = x.shape[-1]
        h = FusedGroupNorm(num_groups=self.groups, epsilon=self.eps,
                           act="silu", name="norm1")(x)
        # Int8RoutableConv == nn.Conv (identical params/numerics) unless
        # HEDIT_INT8_CONV=1 routes the measured-win res<=32 large-C_in
        # shapes onto the int8 MXU path (ops/int8_conv.py)
        h = Int8RoutableConv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv1",
        )(h)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = FusedGroupNorm(num_groups=self.groups, epsilon=self.eps,
                           act="silu", name="norm2")(h)
        h = Int8RoutableConv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv2",
        )(h)
        if self.feature_site:
            h = control.map_features(h, self.feature_site)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    """Stride-2 conv downsample.

    ``asymmetric_pad`` is the SD VAE-encoder quirk: diffusers' Encoder builds
    its DownEncoderBlock2D with ``downsample_padding=0``, which makes
    Downsample2D F.pad the input (0,1,0,1) — bottom/right only — before a
    pad-0 conv (inherited from CompVis ldm).  The UNet's downsamplers use the
    ordinary symmetric padding=1.  Caught by tests/test_torch_parity_sd.py."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    asymmetric_pad: bool = False

    @nn.compact
    def __call__(self, x):
        pad = ((0, 1), (0, 1)) if self.asymmetric_pad else ((1, 1), (1, 1))
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=pad,
            dtype=self.dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv",
        )(x)


class CrossAttention(nn.Module):
    """Multi-head attention with pluggable functional control.

    Mirrors diffusers Attention (to_q/to_k/to_v/to_out.0); the control hook is
    the functional analog of `P2PCrossAttnProcessor` (``ptp_utils.py:31-122``).
    """

    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    layer_tag: Optional[LayerTag] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, control=NO_CONTROL, use_pallas: bool = True):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        out, store = controlled_attention(
            q, k, v, heads=self.heads, layer=self.layer_tag, control=control,
            use_pallas=use_pallas,
        )
        for name, val in store.items():
            self.sow("attn_store", name, val)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU uses F.gelu's default = EXACT erf gelu, which the
        # f32 path matches (caught by tests/test_torch_parity_sd.py; the tanh
        # approximation drifts up to 4.7e-4 absolute).  In bfloat16 compute
        # the two forms round to the SAME bf16 value for 99.4%+ of all 2^16
        # inputs and the rest deviate <= max(1 bf16 ulp, 5e-4) — ~8x below
        # the bf16 matmul's own per-term rounding noise (exhaustive check in
        # tests/test_torch_parity_sd.py) — while erf measures +0.2 ms per
        # large-token FF call = +7% e2e (scripts/gelu_ab.py), so bf16 keeps
        # the cheap tanh form.
        approx = jnp.dtype(self.dtype) == jnp.bfloat16
        return h * nn.gelu(gate, approximate=bool(approx))


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    """self-attn (attn1) -> cross-attn (attn2) -> GEGLU FF, pre-LN."""

    dim: int
    heads: int
    dim_head: int
    context_dim: int
    self_tag: Optional[LayerTag] = None
    cross_tag: Optional[LayerTag] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, control=NO_CONTROL, use_pallas: bool = True):
        # epsilon=1e-5: torch nn.LayerNorm's default, which diffusers'
        # BasicTransformerBlock uses (flax defaults to 1e-6)
        h = nn.LayerNorm(name="norm1", epsilon=1e-5, dtype=self.dtype)(x)
        x = x + CrossAttention(
            self.dim, self.heads, self.dim_head, layer_tag=self.self_tag,
            dtype=self.dtype, name="attn1",
        )(h, None, control, use_pallas)
        h = nn.LayerNorm(name="norm2", epsilon=1e-5, dtype=self.dtype)(x)
        x = x + CrossAttention(
            self.dim, self.heads, self.dim_head, context_dim=self.context_dim,
            layer_tag=self.cross_tag, dtype=self.dtype, name="attn2",
        )(h, context, control, use_pallas)
        h = nn.LayerNorm(name="norm3", epsilon=1e-5, dtype=self.dtype)(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """GN -> 1x1 conv proj_in -> transformer blocks -> 1x1 conv proj_out + skip.

    SD-1.x uses conv projections (use_linear_projection=False)."""

    heads: int
    dim_head: int
    context_dim: int
    depth: int = 1
    self_tag: Optional[LayerTag] = None
    cross_tag: Optional[LayerTag] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, control=NO_CONTROL, use_pallas: bool = True):
        from hedit_tpu.ops.groupnorm import FusedGroupNorm

        b, hgt, wid, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        h = FusedGroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        h = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(b, hgt * wid, inner)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                inner, self.heads, self.dim_head, self.context_dim,
                self_tag=self.self_tag, cross_tag=self.cross_tag,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(h, context, control, use_pallas)
        h = h.reshape(b, hgt, wid, inner)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual
