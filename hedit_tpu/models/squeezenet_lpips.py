"""Flax SqueezeNet-1.1 LPIPS (the net the reference evaluates with:
torchmetrics LearnedPerceptualImagePatchSimilarity(net_type='squeeze'),
``evaluation/matrics_calculator.py:276``).

SqueezeNet 1.1 features: conv1(64,k3,s2) -> pool -> fire(16,64,64) x2 -> pool
-> fire(32,128,128) x2 -> pool -> fire(48,192,192) x2, fire(64,256,256) x2,
with LPIPS taps after [relu1, fire2, fire4, fire6, fire7, fire8, fire9]
(7 taps in the lpips package's squeeze config).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hedit_tpu.models.lpips_vgg import SHIFT, SCALE


class Fire(nn.Module):
    squeeze: int
    expand: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name="expand1x1")(s))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), padding=((1, 1), (1, 1)),
                             name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeFeatures(nn.Module):
    """7 tap activations of SqueezeNet-1.1 features."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        h = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), padding="VALID",
                            name="conv1")(x))
        taps.append(h)                                   # relu1
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = Fire(16, 64, name="fire2")(h)
        h = Fire(16, 64, name="fire3")(h)
        taps.append(h)                                   # after fire3 (slice2)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = Fire(32, 128, name="fire4")(h)
        h = Fire(32, 128, name="fire5")(h)
        taps.append(h)                                   # after fire5 (slice3)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = Fire(48, 192, name="fire6")(h)
        taps.append(h)                                   # slice4
        h = Fire(48, 192, name="fire7")(h)
        taps.append(h)                                   # slice5
        h = Fire(64, 256, name="fire8")(h)
        taps.append(h)                                   # slice6
        h = Fire(64, 256, name="fire9")(h)
        taps.append(h)                                   # slice7
        return taps


class LPIPSSqueeze(nn.Module):
    """LPIPS distance with the squeeze backbone (7 lin heads)."""

    @nn.compact
    def __call__(self, x, y) -> jnp.ndarray:
        shift = jnp.asarray(SHIFT)
        scale = jnp.asarray(SCALE)
        net = SqueezeFeatures(name="net")
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


def convert_lpips_squeeze(state: dict):
    """lpips-package squeeze state dict -> this tree.

    torchvision squeezenet1_1.features indices: 0 conv1; 3,4 fire2,3; 6,7
    fire4,5; 9..12 fire6..9.  Fire submodules squeeze/expand1x1/expand3x3."""
    import re

    from hedit_tpu.io_utils.weights import _unflatten

    layer_map = {
        "0": "conv1", "3": "fire2", "4": "fire3", "6": "fire4", "7": "fire5",
        "9": "fire6", "10": "fire7", "11": "fire8", "12": "fire9",
    }
    flat = {}
    for key, arr in state.items():
        arr = np.asarray(arr, dtype=np.float32)
        m = re.search(r"(\d+)\.(?:([a-z0-9x]+)\.)?(weight|bias)$", key)
        lm = re.search(r"lins?\.?(\d)\.model\.1\.weight$", key)
        if lm:
            flat[(f"lin_{lm.group(1)}", "kernel")] = arr.transpose(2, 3, 1, 0)
        elif m and m.group(1) in layer_map:
            idx, sub, leaf = m.groups()
            path = ("net", layer_map[idx]) + ((sub,) if sub else ())
            if leaf == "weight":
                flat[path + ("kernel",)] = arr.transpose(2, 3, 1, 0)
            else:
                flat[path + ("bias",)] = arr
    return {"params": _unflatten(flat)}
