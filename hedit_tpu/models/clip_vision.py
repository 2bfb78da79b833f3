"""Flax CLIP ViT-B/16 vision tower with per-block feature taps.

Parity: the vendored OpenAI CLIP visual encoder
(``text-guided-n-style/clip_guidance/clip/model.py:203-240, 339-365``):
patch conv (no bias), class embedding + positional embedding, pre-LN,
12 ResidualAttentionBlocks (MultiheadAttention + QuickGELU MLP), collecting
every block's output — the style loss consumes block index 2
(``base_clip.py:55-66``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    input_resolution: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512

    @staticmethod
    def vit_b16() -> "CLIPVisionConfig":
        return CLIPVisionConfig()

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(input_resolution=32, patch_size=8, width=32,
                                layers=3, heads=2, output_dim=16)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class MHAttention(nn.Module):
    """torch nn.MultiheadAttention parity (packed in_proj, out_proj)."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, x):  # x [B, L, D]
        b, l, d = x.shape
        qkv = nn.Dense(3 * d, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = d // self.heads

        def heads_split(t):
            return t.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        p = nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(d, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x + MHAttention(self.width, self.heads, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, name="mlp_c_proj")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """x [B, H, W, 3] (CLIP-normalized) -> (embedding [B, out],
        features: per-block [B, L, width])."""
        c = self.cfg
        h = nn.Conv(c.width, (c.patch_size,) * 2, strides=(c.patch_size,) * 2,
                    use_bias=False, padding="VALID", name="conv1")(x)
        b, gh, gw, _ = h.shape
        h = h.reshape(b, gh * gw, c.width)
        cls = self.param("class_embedding",
                         nn.initializers.normal(c.width**-0.5), (c.width,))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c.width**-0.5),
                         (gh * gw + 1, c.width))
        h = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.width)), h], axis=1)
        h = h + pos[None]
        h = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(h)
        feats = []
        for i in range(c.layers):
            h = ResidualAttentionBlock(c.width, c.heads, name=f"resblocks_{i}")(h)
            feats.append(h)
        out = nn.LayerNorm(epsilon=1e-5, name="ln_post")(h[:, 0, :])
        proj = self.param("proj", nn.initializers.normal(c.width**-0.5),
                          (c.width, c.output_dim))
        return out @ proj, feats


def convert_clip_vision(state: dict):
    """OpenAI CLIP state dict (visual.*) -> this tree."""
    import re

    import numpy as np

    from hedit_tpu.io_utils.weights import _unflatten

    flat = {}
    for key, arr in state.items():
        if not key.startswith("visual."):
            continue
        k = key[len("visual."):]
        arr = np.asarray(arr, dtype=np.float32)
        if k == "conv1.weight":
            flat[("conv1", "kernel")] = arr.transpose(2, 3, 1, 0)
        elif k in ("class_embedding", "positional_embedding", "proj"):
            flat[(k,)] = arr
        elif k.startswith("ln_pre") or k.startswith("ln_post"):
            name, leaf = k.split(".")
            flat[(name, "scale" if leaf == "weight" else "bias")] = arr
        else:
            m = re.match(r"transformer\.resblocks\.(\d+)\.(.+)", k)
            if not m:
                continue
            i, rest = m.group(1), m.group(2)
            base = (f"resblocks_{i}",)
            if rest == "attn.in_proj_weight":
                flat[base + ("attn", "in_proj", "kernel")] = arr.T
            elif rest == "attn.in_proj_bias":
                flat[base + ("attn", "in_proj", "bias")] = arr
            elif rest == "attn.out_proj.weight":
                flat[base + ("attn", "out_proj", "kernel")] = arr.T
            elif rest == "attn.out_proj.bias":
                flat[base + ("attn", "out_proj", "bias")] = arr
            elif rest.startswith("ln_"):
                name, leaf = rest.split(".")
                flat[base + (name, "scale" if leaf == "weight" else "bias")] = arr
            elif rest.startswith("mlp."):
                _, name, leaf = rest.split(".")
                flat[base + (f"mlp_{name}",
                             "kernel" if leaf == "weight" else "bias")] = (
                    arr.T if leaf == "weight" else arr
                )
    return {"params": _unflatten(flat)}
