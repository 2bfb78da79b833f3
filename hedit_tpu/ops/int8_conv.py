"""Opt-in w8a8 int8 convolution routing for the UNet's high-intensity convs.

Round-3 probes (PERF_NOTES "int8 convs", ``scripts/int8_conv_probe.py`` /
``int8_conv_unrolled.py``) measured the int8 MXU path (394 TOPS nominal vs
~197 bf16 TFLOPS) winning 1.1-1.4x ONLY where conv arithmetic intensity is
already high — the res<=32 large-C_in convs (1280->640 at res 32,
2560->1280 at res 16, at 118+ TF bf16) — and losing or washing everywhere
else (the dynamic-quant VPU pass swamps the MXU saving at res 64 / dense
shapes).  This module harvests exactly that lever, OFF by default:

* ``HEDIT_INT8_CONV=1`` routes qualifying 3x3 resnet convs
  (spatial side <= ``HEDIT_INT8_CONV_MAX_RES`` [32] and
  C_in >= ``HEDIT_INT8_CONV_MIN_CI`` [1280]) through dynamic per-tensor
  activation quantization + static per-output-channel weight quantization
  + s8xs8->s32 ``conv_general_dilated``.
* Every other shape, and the default configuration, takes flax's stock
  ``nn.Conv`` path — :class:`Int8RoutableConv` subclasses ``nn.Conv`` and
  creates the IDENTICAL parameter tree (``kernel``/``bias``, same shapes,
  same init), so checkpoints, tensor-parallel sharding rules
  (``parallel/mesh.py:UNET_PARAM_RULES``) and converters are unaffected.

The flag is read at TRACE time (static routing — no runtime branch in the
compiled program); set it before the first jit of the process.
Quality guardrail: ``tests/test_int8_conv.py`` bounds the quantization
drift per-conv and end-to-end through a UNet forward; the measured e2e
step-time/drift numbers on the real chip live in PERF_NOTES round 4
(``scripts/int8_conv_e2e.py``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn


def int8_conv_enabled() -> bool:
    return os.environ.get("HEDIT_INT8_CONV", "0") == "1"


def _max_res() -> int:
    return int(os.environ.get("HEDIT_INT8_CONV_MAX_RES", "32"))


def _min_ci() -> int:
    return int(os.environ.get("HEDIT_INT8_CONV_MIN_CI", "1280"))


def should_route_int8(h: int, w: int, ci: int) -> bool:
    """Static routing decision for a [B,h,w,ci] NHWC conv input — the
    measured win region only (see module docstring)."""
    return (int8_conv_enabled()
            and max(h, w) <= _max_res() and ci >= _min_ci())


def w8a8_conv(x, kernel, bias, *, padding, dtype):
    """Dynamic-activation / per-output-channel-weight int8 3x3 conv.

    x: [B,H,W,Ci] (any float dtype); kernel: [kh,kw,Ci,Co] (param dtype);
    returns [B,H,W,Co] in ``dtype``.  Symmetric quantization to [-127,127];
    accumulation in int32 on the MXU; dequant fused into the epilogue.

    Differentiable via a straight-through estimator: the VJP is that of the
    unquantized float conv (``jnp.round`` has zero gradient, which would
    silently kill the through-UNet gradient modes — NMG/face/style/
    null-text — under the flag).
    """
    return _w8a8_ste(x, kernel, bias, _canon_pad(padding),
                     jnp.dtype(dtype).name)


def _canon_pad(padding):
    return padding if isinstance(padding, str) else tuple(map(tuple, padding))


from functools import partial  # noqa: E402


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _w8a8_ste(x, kernel, bias, padding, dtype_name):
    dtype = jnp.dtype(dtype_name)
    kernel = kernel.astype(jnp.float32)
    # static per-output-channel weight scales (folded by XLA at compile
    # time for literal params; cheap otherwise)
    w_scale = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0  # [Co]
    w_scale = jnp.maximum(w_scale, 1e-12)
    k_i8 = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)
    # dynamic per-tensor activation scale
    xf = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    x_i8 = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_i8, k_i8, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (a_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def _float_conv(x, kernel, bias, padding, dtype_name):
    dtype = jnp.dtype(dtype_name)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel.astype(jnp.float32), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def _w8a8_fwd(x, kernel, bias, padding, dtype_name):
    return _w8a8_ste(x, kernel, bias, padding, dtype_name), (x, kernel, bias)


def _w8a8_bwd(padding, dtype_name, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(lambda a, k, b: _float_conv(a, k, b, padding,
                                                 dtype_name),
                     x, kernel, bias)
    return vjp(g)


_w8a8_ste.defvjp(_w8a8_fwd, _w8a8_bwd)


class Int8RoutableConv(nn.Conv):
    """Drop-in ``nn.Conv`` whose qualifying NHWC 3x3 instances ride the
    int8 MXU path when ``HEDIT_INT8_CONV=1``; parameter tree identical to
    ``nn.Conv`` in both modes."""

    @nn.compact
    def __call__(self, x):
        plain_3x3 = (
            x.ndim == 4
            and self.feature_group_count == 1
            and self.strides in (None, 1, (1, 1))
            and all(d in (None, 1, (1, 1))
                    for d in (self.kernel_dilation, self.input_dilation))
        )
        h, w, ci = x.shape[-3], x.shape[-2], x.shape[-1]
        if not (plain_3x3 and should_route_int8(h, w, ci)):
            return super().__call__(x)
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, ci, self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype)
                if self.use_bias else None)
        return w8a8_conv(x, kernel, bias, padding=self.padding,
                         dtype=self.dtype or x.dtype)
