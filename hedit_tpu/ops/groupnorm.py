"""Pallas TPU fused GroupNorm(+SiLU).

The UNet's hottest non-matmul op: GN(32) + silu before every conv
(SURVEY.md §5.7 north star).  XLA computes GN as separate
reduce/normalize/mul HLOs; this kernel fuses stats, normalization, affine and
the activation in one VMEM pass per batch row.

Design: grid over batch; each program holds one [HW, C] slab in VMEM.
Per-group statistics use the MXU via a one-hot [C, G] membership matmul
(lane-dim segment reductions are VPU-hostile; a tiny matmul is free).
Falls back to the jnp implementation off-TPU or when a slab exceeds the VMEM
budget (VAE 512x512 resolutions) — the UNet latent path (<= 64x64) always
fits.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Empirical routing bounds from compiler observations on v5e:
#   OOM:   f32 [1024,1920] (slab 7.86M -> 36.43M scoped),
#          bf16 [1024,1280] (slab 2.62M -> 24.89M scoped)
#   works: bf16 [4096,320] (slab 2.62M), [256,2560], [1024,960] and smaller —
#          i.e. every site the end-to-end bench exercises under the 4.7x rule.
# The scoped footprint is shape-dependent beyond a simple multiplier (the two
# 2.62M slabs above differ 2x in scoped usage), so routing is the proven
# multiplier rule plus a point-exclusion for the one observed OOM region:
# wide channels at large spatial extent.
VMEM_BYTES = 16 * 1024 * 1024
SLAB_MULTIPLIER = 4.7


def group_norm_reference(x, scale, bias, *, groups: int, eps: float = 1e-5,
                         act: Optional[str] = None):
    """jnp oracle: NHWC groupnorm with channel-grouped stats (torch parity).

    Deliberately reshape-free: the textbook ``reshape(b, hw, g, c//g)`` form
    makes XLA relayout the activation channels-major ({2,1,0,3} copies, ~10%
    of the UNet forward in device profiles).  Group statistics instead use a
    tiny one-hot [C, G] matmul, keeping everything in the conv-native NHWC
    layout so the normalize/affine/act fuses into neighbors.
    """
    b, h, w, c = x.shape
    x32 = x.astype(jnp.float32)
    n = h * w * (c // groups)
    onehot = jnp.asarray(np.eye(groups, dtype=np.float32)
                         .repeat(c // groups, axis=0))  # [C, G]
    # Spatial sums as MXU dots over the [B, HW, C] view (ones contraction
    # over HW), NOT jnp.sum(axis=(1,2)): the plain reduce makes XLA lay
    # consumers out with (batch, channel) on (sublane, lane) — batch-minor
    # {3,0,2,1} activations — which turns any 1x1 conv it fuses with into
    # per-pixel m=B matmuls (measured 3.08 ms vs a 0.07 ms roof on the
    # up_blocks_3 shortcut conv at [16,64,64,320]).  A dot keeps HW on
    # sublanes, i.e. the conv-native {3,2,1,0} layout.  The ones operand is
    # a [HW, 2] MATRIX (column 0 read, column 1 discarded): XLA's algebraic
    # simplifier strength-reduces a ones-VECTOR dot straight back into the
    # reduce (verified in HLO metadata), matrix dots survive.
    if b >= 4:
        ones_hw = jnp.ones((b, 2, h * w), jnp.float32)

        def spatial_sum(t):  # [B, HW, C] -> [B, C]
            # batched [2, HW] x [HW, C]: contraction over HW streams the
            # native (HW sublanes, C lanes) layout; row 1 of the ones
            # operand only keeps the rhs a matrix (a ones-VECTOR dot is
            # strength-reduced back into the reduce by XLA)
            return jax.lax.dot_general(
                ones_hw, t, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, 0, :]
    else:
        # At tiny batch the dot's [B, C] outputs tile T(B,128) and drag the
        # big activations batch-minor with 1/8 sublane utilization (measured
        # 2x SLOWER on the B=1 face UNet); the plain reduce wins there.
        def spatial_sum(t):
            return jnp.sum(t, axis=1)

    s = spatial_sum(x32.reshape(b, h * w, c))           # [B, C]
    mean_g = (s @ onehot) / n                           # [B, G]
    mean_c = (mean_g @ onehot.T)[:, None, None, :]      # [B,1,1,C]
    # two-pass variance (E[(x-m)^2], torch semantics): the one-pass
    # E[x^2]-E[x]^2 form drifts enough to break 50-step reconstruction
    # identities at atol 1e-3
    d = x32 - mean_c
    s2 = spatial_sum((d * d).reshape(b, h * w, c))
    var_g = (s2 @ onehot) / n                           # [B, G]
    inv_c = (jax.lax.rsqrt(var_g + eps) @ onehot.T)[:, None, None, :]
    y = d * inv_c * scale + bias
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _gn_kernel(x_ref, scale_ref, bias_ref, onehot_ref, o_ref, *, groups: int,
               eps: float, act: Optional[str]):
    x = x_ref[...].astype(jnp.float32)  # [HW, C]
    hw, c = x.shape
    onehot = onehot_ref[...]  # [C, G] float32
    n = hw * (c // groups)
    s = jnp.sum(x, axis=0, keepdims=True)          # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    gs = jnp.dot(s, onehot, preferred_element_type=jnp.float32)    # [1, G]
    gs2 = jnp.dot(s2, onehot, preferred_element_type=jnp.float32)
    mean_g = gs / n
    var_g = gs2 / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast back to channels via onehot^T
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, onehot.T, preferred_element_type=jnp.float32)
    y = (x - mean_c) * inv_c
    y = y * scale_ref[...] + bias_ref[...]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "act", "interpret"))
def group_norm_pallas(x, scale, bias, *, groups: int, eps: float = 1e-5,
                      act: Optional[str] = None, interpret: bool = False):
    b, h, w, c = x.shape
    hw = h * w
    onehot = np.zeros((c, groups), np.float32)
    onehot[np.arange(c), np.arange(c) // (c // groups)] = 1.0
    out = pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, act=act),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
    )(x.reshape(b, hw, c), scale.reshape(1, c), bias.reshape(1, c),
      jnp.asarray(onehot))
    return out.reshape(b, h, w, c)


def group_norm(x, scale, bias, *, groups: int, eps: float = 1e-5,
               act: Optional[str] = None, use_pallas: bool = True,
               interpret: bool = False):
    """Fused GN(+act); routes to the Pallas kernel when profitable."""
    b, h, w, c = x.shape
    slab_bytes = h * w * c * x.dtype.itemsize
    on_tpu = jax.devices()[0].platform == "tpu"
    if use_pallas and (on_tpu or interpret) \
            and slab_bytes * SLAB_MULTIPLIER <= VMEM_BYTES \
            and not (c > 640 and h * w >= 1024) \
            and c % groups == 0 and c % 128 == 0:
        return group_norm_pallas(x, scale, bias, groups=groups, eps=eps,
                                 act=act, interpret=interpret)
    return group_norm_reference(x, scale, bias, groups=groups, eps=eps, act=act)


from flax import linen as nn  # noqa: E402


class FusedGroupNorm(nn.Module):
    """Drop-in for nn.GroupNorm (same 'scale'/'bias' params) with optional
    fused activation, Pallas-backed on TPU."""

    num_groups: int = 32
    epsilon: float = 1e-5
    act: Optional[str] = None
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm(
            x, scale, bias, groups=self.num_groups, eps=self.epsilon,
            act=self.act, use_pallas=self.use_pallas,
        )
