"""Inference-mode layers for frozen reward/eval networks.

The reward models (ArcFace, VGG-LPIPS, face parser, DINO) are always frozen
critics in the reference — BatchNorm runs in eval mode with stored running
statistics.  FrozenBatchNorm keeps (scale, bias, mean, var) as ordinary
params so the whole network is a plain pytree with a clean VJP."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm over the channel (last) axis."""

    features: int
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        y = (x - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale + bias
        return y


class PReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (self.features,))
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def adaptive_avg_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Exact torch AdaptiveAvgPool2d semantics as a [out, in] matrix:
    output i averages input[floor(i*in/out) : ceil((i+1)*in/out)].

    Applied separably (rows then cols); exact and differentiable."""
    P = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)
        P[i, start:end] = 1.0 / (end - start)
    return P


def adaptive_avg_pool_2d(x: jnp.ndarray, out_hw: int) -> jnp.ndarray:
    """x [B, H, W, C] -> [B, out, out, C] with torch-adaptive semantics."""
    H, W = x.shape[1], x.shape[2]
    Ph = jnp.asarray(adaptive_avg_pool_matrix(H, out_hw))
    Pw = jnp.asarray(adaptive_avg_pool_matrix(W, out_hw))
    x = jnp.einsum("oh,bhwc->bowc", Ph, x)
    return jnp.einsum("ow,bhwc->bhoc", Pw, x)
