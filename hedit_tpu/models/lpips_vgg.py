"""Flax VGG16-LPIPS perceptual loss (frozen, differentiable).

Parity: the ``lpips.LPIPS(net='vgg')`` critic used by the face-swap workload
(``arcface/arcface_model.py:69-95``): inputs in [-1, 1] are shifted/scaled by
the ImageNet constants, passed through VGG16 features with taps after
relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3, channel-unit-normalized,
squared-diffed, mapped through learned 1x1 "lin" layers, spatially averaged,
and summed over taps.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv plan: (channels, num convs) per stage; taps after each stage
VGG16_STAGES: Tuple[Tuple[int, int], ...] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """[B, H, W, 3] (already scaled) -> 5 stage activations."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        conv_idx = 0
        for si, (ch, n) in enumerate(VGG16_STAGES):
            for _ in range(n):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
            taps.append(x)
            if si != len(VGG16_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPSVgg(nn.Module):
    """LPIPS distance between two [-1, 1] NHWC images."""

    @nn.compact
    def __call__(self, x, y) -> jnp.ndarray:
        shift = jnp.asarray(SHIFT)
        scale = jnp.asarray(SCALE)
        net = VGG16Features(name="net")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin_{i}")(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def convert_lpips_vgg(state: dict):
    """Port the `lpips` package's state dict (net.slice*/lin*) to this tree."""
    import numpy as np

    from hedit_tpu.io_utils.weights import _unflatten

    flat = {}
    # torchvision vgg16.features conv indices per layer
    tv_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for my_idx, tv_idx in enumerate(tv_conv_idx):
        for cand in (
            f"net.features.{tv_idx}",  # torchvision layout
            _slice_key(my_idx, tv_idx),  # lpips slice layout
        ):
            if f"{cand}.weight" in state:
                w = np.asarray(state[f"{cand}.weight"]).transpose(2, 3, 1, 0)
                flat[("net", f"conv_{my_idx}", "kernel")] = w
                flat[("net", f"conv_{my_idx}", "bias")] = np.asarray(
                    state[f"{cand}.bias"]
                )
                break
    for i in range(5):
        for cand in (f"lin{i}.model.1", f"lins.{i}.model.1"):
            if f"{cand}.weight" in state:
                w = np.asarray(state[f"{cand}.weight"]).transpose(2, 3, 1, 0)
                flat[(f"lin_{i}", "kernel")] = w
                break
    return {"params": _unflatten(flat)}


def _slice_key(my_idx: int, tv_idx: int) -> str:
    # lpips stores vgg as net.slice1..slice5 with torchvision indices inside
    bounds = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
    for si, (lo, hi) in enumerate(bounds):
        if lo <= tv_idx < hi:
            return f"net.slice{si + 1}.{tv_idx}"
    return f"net.slice5.{tv_idx}"
