"""GroupNorm(+SiLU) — XLA dot-form stats (the measured winner) + an opt-in
Pallas kernel kept as a tested artifact.

RESOLUTION of the "GroupNorm as a Pallas kernel" north star (VERDICT r1
item 9), from the round-1/2 device-plane measurements:

* The real GN cost on this toolchain was never the reduce itself — it was
  LAYOUT: the textbook ``reshape(b, hw, g, c//g)`` form forced channels-major
  relayout copies (~10% of the UNet forward), and ``jnp.sum(axis=(1,2))``
  stats made XLA lay fused consumers out batch-minor, turning a neighboring
  1x1 conv into per-pixel matmuls (3.08 ms vs a 0.07 ms roof).  The
  reshape-free one-hot-matmul form below fixes both INSIDE XLA
  (e2e 4.66 -> 4.05 s/image, then 34.3 -> 33.3 ms/fwd).
* With those fixes in, GN is absent from the device-plane top-30 ops and the
  Pallas kernel's end-to-end effect is bench noise (PERF_NOTES, routing-rule
  sweeps: 5.18-5.46 s/image spread = tunnel noise).  Mosaic also cannot
  compile lane-unaligned channel counts (C=320, every res-64 site), and the
  kernel's scoped-VMEM footprint is shape-dependent beyond a simple slab
  multiplier (observed 36.43M scoped for a 7.86M f32 slab), so auto-routing
  needed empirical magic numbers with compile-time-OOM risk on unseen shapes.

Decision: the XLA dot-form IS the GroupNorm story; the Pallas kernel is kept
(oracle-tested, ``group_norm_pallas``) but only runs when explicitly
requested via ``HEDIT_GN_PALLAS=1`` — never by shape-based auto-routing.
Conservative by construction: no VMEM heuristics in the default path.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


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
    """GN(+act).  Default: the XLA dot-form (see module docstring).  The
    Pallas kernel runs only on explicit opt-in (``HEDIT_GN_PALLAS=1`` AND
    ``use_pallas``) for re-measurement on future toolchains; the opt-in
    still requires lane-aligned channels (Mosaic rejects c % 128 != 0)."""
    b, h, w, c = x.shape
    on_tpu = jax.devices()[0].platform == "tpu"
    if use_pallas and (on_tpu or interpret) \
            and os.environ.get("HEDIT_GN_PALLAS") == "1" \
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
