"""Flax IR-SE-50 ArcFace backbone (frozen, differentiable — used as a VJP
target by the face-swap reward guidance).

Parity: ``face-swapping/arcface/facial_recognition/model_irse.py:9-49`` +
``helpers.py`` — input conv/BN/PReLU, 4 stages of bottleneck_IR_SE blocks
((64,64)x3, (64,128)x4, (128,256)x14, (256,512)x3, first block of each stage
stride 2), output BN2d -> flatten -> Linear(512*7*7 -> 512) -> BN1d, then
l2-norm.  IDLoss wrapper semantics from ``arcface/arcface_model.py:12-67``:
adaptive-pool to 256, crop [35:223, 32:220], adaptive-pool to 112, embed,
cosine similarity vs a reference embedding.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from hedit_tpu.models.frozen_layers import (
    FrozenBatchNorm,
    PReLU,
    adaptive_avg_pool_2d,
)

IR_SE_50_BLOCKS: Tuple[Tuple[int, int, int], ...] = tuple(
    [(64, 64, 2)] + [(64, 64, 1)] * 2
    + [(64, 128, 2)] + [(128, 128, 1)] * 3
    + [(128, 256, 2)] + [(256, 256, 1)] * 13
    + [(256, 512, 2)] + [(512, 512, 1)] * 2
)


class SEModule(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels // self.reduction, (1, 1), use_bias=False,
                    name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), use_bias=False, name="fc2")(s)
        return x * nn.sigmoid(s)


class BottleneckIRSE(nn.Module):
    in_channel: int
    depth: int
    stride: int

    @nn.compact
    def __call__(self, x):
        if self.in_channel == self.depth:
            # MaxPool2d(1, stride): pure subsampling
            shortcut = x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = nn.Conv(self.depth, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="shortcut_conv")(x)
            shortcut = FrozenBatchNorm(self.depth, name="shortcut_bn")(shortcut)
        h = FrozenBatchNorm(self.in_channel, name="res_bn1")(x)
        h = nn.Conv(self.depth, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name="res_conv1")(h)
        h = PReLU(self.depth, name="res_prelu")(h)
        h = nn.Conv(self.depth, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, name="res_conv2")(h)
        h = FrozenBatchNorm(self.depth, name="res_bn2")(h)
        h = SEModule(self.depth, name="res_se")(h)
        return h + shortcut


class IRSE50(nn.Module):
    """[B, 112, 112, 3] in [-1, 1] -> l2-normalized [B, 512] embeddings."""

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name="input_conv")(x)
        h = FrozenBatchNorm(64, name="input_bn")(h)
        h = PReLU(64, name="input_prelu")(h)
        for i, (cin, depth, stride) in enumerate(IR_SE_50_BLOCKS):
            h = BottleneckIRSE(cin, depth, stride, name=f"body_{i}")(h)
        h = FrozenBatchNorm(512, name="output_bn2d")(h)
        # flatten matches torch NCHW order: [B, C, H, W] row-major
        b = h.shape[0]
        h = h.transpose(0, 3, 1, 2).reshape(b, -1)
        h = nn.Dense(512, name="output_linear")(h)
        h = FrozenBatchNorm(512, affine=True, name="output_bn1d")(h)
        return h / jnp.linalg.norm(h, axis=1, keepdims=True)


def extract_feats(params, model: IRSE50, image: jnp.ndarray) -> jnp.ndarray:
    """IDLoss.extract_feats (``arcface_model.py:41-46``): pool-to-256, crop
    [35:223, 32:220], pool-to-112, embed.  image [B, H, W, 3] in [-1, 1]."""
    x = image
    if x.shape[1] != 256:
        x = adaptive_avg_pool_2d(x, 256)
    x = x[:, 35:223, 32:220, :]
    x = adaptive_avg_pool_2d(x, 112)
    return model.apply(params, x)


def cosine_sim(params, model: IRSE50, image, ref_embed) -> jnp.ndarray:
    feats = extract_feats(params, model, image)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    ref = ref_embed / jnp.linalg.norm(ref_embed, axis=-1, keepdims=True)
    return jnp.sum(feats * ref, axis=-1)


def cosine_loss(params, model: IRSE50, image, ref_embed) -> jnp.ndarray:
    return jnp.mean(1.0 - cosine_sim(params, model, image, ref_embed))


# --------------------------------------------------------------- weight port #

def convert_irse50(state: dict):
    """model_ir_se50.pth torch keys -> this module's tree.

    torch layout: input_layer.{0,1,2}, body.N.{shortcut_layer, res_layer.M},
    output_layer.{0,3,4}."""
    import numpy as np

    from hedit_tpu.io_utils.weights import _unflatten

    flat = {}

    def put(path, arr):
        flat[tuple(path.split("/"))] = np.asarray(arr)

    def bn(prefix_t, prefix_f):
        put(f"{prefix_f}/scale", state[f"{prefix_t}.weight"])
        put(f"{prefix_f}/bias", state[f"{prefix_t}.bias"])
        put(f"{prefix_f}/mean", state[f"{prefix_t}.running_mean"])
        put(f"{prefix_f}/var", state[f"{prefix_t}.running_var"])

    def conv(prefix_t, prefix_f):
        w = np.asarray(state[f"{prefix_t}.weight"]).transpose(2, 3, 1, 0)
        put(f"{prefix_f}/kernel", w)
        if f"{prefix_t}.bias" in state:
            put(f"{prefix_f}/bias", state[f"{prefix_t}.bias"])

    conv("input_layer.0", "input_conv")
    bn("input_layer.1", "input_bn")
    put("input_prelu/alpha", state["input_layer.2.weight"])

    for i, (cin, depth, stride) in enumerate(IR_SE_50_BLOCKS):
        t = f"body.{i}"
        f = f"body_{i}"
        if cin != depth:
            conv(f"{t}.shortcut_layer.0", f"{f}/shortcut_conv")
            bn(f"{t}.shortcut_layer.1", f"{f}/shortcut_bn")
        bn(f"{t}.res_layer.0", f"{f}/res_bn1")
        conv(f"{t}.res_layer.1", f"{f}/res_conv1")
        put(f"{f}/res_prelu/alpha", state[f"{t}.res_layer.2.weight"])
        conv(f"{t}.res_layer.3", f"{f}/res_conv2")
        bn(f"{t}.res_layer.4", f"{f}/res_bn2")
        conv(f"{t}.res_layer.5.fc1", f"{f}/res_se/fc1")
        conv(f"{t}.res_layer.5.fc2", f"{f}/res_se/fc2")

    bn("output_layer.0", "output_bn2d")
    put("output_linear/kernel", np.asarray(state["output_layer.3.weight"]).T)
    put("output_linear/bias", state["output_layer.3.bias"])
    bn("output_layer.4", "output_bn1d")
    return {"params": _unflatten(flat)}
