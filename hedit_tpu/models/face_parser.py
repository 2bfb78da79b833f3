"""Flax face-parsing U-Net (CelebAMask-HQ unet), frozen inference.

Parity: ``face-swapping/arcface/face_parsing_model.py`` — unetConv2
(conv-BN-relu x2), maxpool encoder at filters [16, 32, 64, 128, 256]
(feature_scale=4), unetUp with ConvTranspose2d(k=2, s=2) and skip concat,
final 1x1 conv to 19 classes + argmax.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from hedit_tpu.models.frozen_layers import FrozenBatchNorm

FILTERS: Tuple[int, ...] = (16, 32, 64, 128, 256)  # 64..1024 / feature_scale 4


class UnetConv2(nn.Module):
    out_size: int

    @nn.compact
    def __call__(self, x):
        for i in (1, 2):
            x = nn.Conv(self.out_size, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"conv{i}_conv")(x)
            x = FrozenBatchNorm(self.out_size, name=f"conv{i}_bn")(x)
            x = nn.relu(x)
        return x


class UnetUp(nn.Module):
    out_size: int

    @nn.compact
    def __call__(self, skip, x):
        x = nn.ConvTranspose(self.out_size, (2, 2), strides=(2, 2), name="up")(x)
        # reference pads the skip if sizes mismatch (:50-53); with power-of-two
        # inputs they match.
        return UnetConv2(self.out_size, name="conv")(
            jnp.concatenate([skip, x], axis=-1)
        )


class FaceParsing(nn.Module):
    n_classes: int = 19

    @nn.compact
    def logits(self, x):
        """[B, H, W, 3] in [-1, 1] -> [B, H, W, n_classes] logits."""
        c1 = UnetConv2(FILTERS[0], name="conv1")(x)
        p1 = nn.max_pool(c1, (2, 2), strides=(2, 2))
        c2 = UnetConv2(FILTERS[1], name="conv2")(p1)
        p2 = nn.max_pool(c2, (2, 2), strides=(2, 2))
        c3 = UnetConv2(FILTERS[2], name="conv3")(p2)
        p3 = nn.max_pool(c3, (2, 2), strides=(2, 2))
        c4 = UnetConv2(FILTERS[3], name="conv4")(p3)
        p4 = nn.max_pool(c4, (2, 2), strides=(2, 2))
        center = UnetConv2(FILTERS[4], name="center")(p4)
        u4 = UnetUp(FILTERS[3], name="up_concat4")(c4, center)
        u3 = UnetUp(FILTERS[2], name="up_concat3")(c3, u4)
        u2 = UnetUp(FILTERS[1], name="up_concat2")(c2, u3)
        u1 = UnetUp(FILTERS[0], name="up_concat1")(c1, u2)
        return nn.Conv(self.n_classes, (1, 1), name="final")(u1)

    def __call__(self, x):
        """[B, H, W, 3] in [-1, 1] -> [B, H, W] int class map."""
        return jnp.argmax(self.logits(x), axis=-1)


def convert_face_parser(state: dict):
    """face_parsing.pth torch keys -> this tree.

    torch: conv{1..4}/center .conv{1,2}.{0 conv,1 bn}; up_concatN.conv.convM,
    up_concatN.up (ConvTranspose2d); final."""
    import numpy as np

    from hedit_tpu.io_utils.weights import _unflatten

    flat = {}

    def conv(t, f, transpose=False):
        w = np.asarray(state[f"{t}.weight"])
        if transpose:
            # torch ConvTranspose2d [in, out, H, W] -> flax [H, W, in, out]
            w = w.transpose(2, 3, 0, 1)
            # torch correlates flipped; flax ConvTranspose matches with kernel
            # flipped spatially
            w = w[::-1, ::-1]
        else:
            w = w.transpose(2, 3, 1, 0)
        flat[tuple(f.split("/")) + ("kernel",)] = w
        if f"{t}.bias" in state:
            flat[tuple(f.split("/")) + ("bias",)] = np.asarray(state[f"{t}.bias"])

    def bn(t, f):
        for a, b in (("weight", "scale"), ("bias", "bias"),
                     ("running_mean", "mean"), ("running_var", "var")):
            flat[tuple(f.split("/")) + (b,)] = np.asarray(state[f"{t}.{a}"])

    def unetconv(t, f):
        for i in (1, 2):
            conv(f"{t}.conv{i}.0", f"{f}/conv{i}_conv")
            bn(f"{t}.conv{i}.1", f"{f}/conv{i}_bn")

    for name in ("conv1", "conv2", "conv3", "conv4", "center"):
        unetconv(name, name)
    for name in ("up_concat4", "up_concat3", "up_concat2", "up_concat1"):
        unetconv(f"{name}.conv", f"{name}/conv")
        conv(f"{name}.up", f"{name}/up", transpose=True)
    conv("final", "final")
    return {"params": _unflatten(flat)}
