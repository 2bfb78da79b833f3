"""Flax DINO ViT (timm-style) with attention key extraction.

Parity: the structure-distance metric's feature extractor
(``text-guided/evaluation/matrics_calculator.py:12-171``): dino_vitb8 loaded
via torch.hub, hooked to read the KEYS of the last attention block; the metric
is the MSE between the two images' key self-similarity (cosine) matrices
(``calculate_global_ssim_loss``, :238-247).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 8
    width: int = 768
    layers: int = 12
    heads: int = 12

    @staticmethod
    def dino_vitb8() -> "ViTConfig":
        return ViTConfig()

    @staticmethod
    def tiny() -> "ViTConfig":
        return ViTConfig(patch_size=8, width=32, layers=2, heads=2)


class ViTBlock(nn.Module):
    width: int
    heads: int
    return_keys: bool = False

    @nn.compact
    def __call__(self, x):
        b, l, d = x.shape
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = d // self.heads

        def split(t):
            return t.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
        p = nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        x = x + nn.Dense(d, name="proj")(out)
        h2 = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h2 = nn.Dense(4 * d, name="mlp_fc1")(h2)
        h2 = nn.gelu(h2, approximate=False)
        h2 = nn.Dense(d, name="mlp_fc2")(h2)
        x = x + h2
        if self.return_keys:
            return x, kh
        return x


class DINOViT(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x [B, H, W, 3] (ImageNet-normalized) ->
        (cls embedding [B, D], last-layer keys [B, heads, L, hd])."""
        c = self.cfg
        h = nn.Conv(c.width, (c.patch_size,) * 2, strides=(c.patch_size,) * 2,
                    padding="VALID", name="patch_embed")(x)
        b, gh, gw, _ = h.shape
        h = h.reshape(b, gh * gw, c.width)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.width))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw + 1, c.width))
        h = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.width)), h], axis=1)
        h = h + pos
        keys = None
        for i in range(c.layers):
            last = i == c.layers - 1
            blk = ViTBlock(c.width, c.heads, return_keys=last, name=f"blocks_{i}")
            if last:
                h, keys = blk(h)
            else:
                h = blk(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        return h[:, 0], keys


def key_self_similarity(keys: jnp.ndarray) -> jnp.ndarray:
    """Keys [B, heads, L, hd] -> cosine self-similarity [B, L, L] over the
    head-concatenated key vectors (VitExtractor semantics, :160-171)."""
    b, h, l, hd = keys.shape
    k = keys.transpose(0, 2, 1, 3).reshape(b, l, h * hd)
    k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
    return jnp.einsum("bld,bmd->blm", k, k)


def structure_distance(apply_fn, img_a, img_b, *, size: int = 224) -> jnp.ndarray:
    """DINO key self-similarity MSE (``calculate_global_ssim_loss``)."""
    import jax

    def prep(img):
        # inputs [B,H,W,3] in [0,255] or [0,1]; reference resizes to 224 and
        # ImageNet-normalizes (:187-200)
        x = img / 255.0 if img.max() > 2.0 else img
        b = x.shape[0]
        x = jax.image.resize(x, (b, size, size, 3), method="bilinear")
        return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    _, ka = apply_fn(prep(img_a))
    _, kb = apply_fn(prep(img_b))
    return jnp.mean((key_self_similarity(ka) - key_self_similarity(kb)) ** 2)


def structure_distance_batch(apply_fn, img_a, img_b,
                             *, size: int = 224) -> jnp.ndarray:
    """Per-pair structure distances [B] — one DINO forward per image stack
    instead of per sample (the batched evaluation harness lane)."""
    import jax

    def prep(img):
        x = img / 255.0 if img.max() > 2.0 else img
        b = x.shape[0]
        x = jax.image.resize(x, (b, size, size, 3), method="bilinear")
        return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    _, ka = apply_fn(prep(img_a))
    _, kb = apply_fn(prep(img_b))
    d = (key_self_similarity(ka) - key_self_similarity(kb)) ** 2
    return jnp.mean(d, axis=(1, 2))


def convert_dino_vit(state: dict):
    """torch.hub dino state dict -> this tree."""
    import numpy as np

    from hedit_tpu.io_utils.weights import _unflatten

    flat = {}
    for key, arr in state.items():
        arr = np.asarray(arr, dtype=np.float32)
        if key == "patch_embed.proj.weight":
            flat[("patch_embed", "kernel")] = arr.transpose(2, 3, 1, 0)
        elif key == "patch_embed.proj.bias":
            flat[("patch_embed", "bias")] = arr
        elif key == "cls_token":
            flat[("cls_token",)] = arr
        elif key == "pos_embed":
            flat[("pos_embed",)] = arr
        elif key.startswith("norm."):
            flat[("norm", "scale" if key.endswith("weight") else "bias")] = arr
        elif key.startswith("blocks."):
            parts = key.split(".")
            i, rest = parts[1], ".".join(parts[2:])
            base = (f"blocks_{i}",)
            mapping = {
                "norm1.weight": ("norm1", "scale"), "norm1.bias": ("norm1", "bias"),
                "norm2.weight": ("norm2", "scale"), "norm2.bias": ("norm2", "bias"),
                "attn.qkv.weight": ("qkv", "kernel"), "attn.qkv.bias": ("qkv", "bias"),
                "attn.proj.weight": ("proj", "kernel"), "attn.proj.bias": ("proj", "bias"),
                "mlp.fc1.weight": ("mlp_fc1", "kernel"), "mlp.fc1.bias": ("mlp_fc1", "bias"),
                "mlp.fc2.weight": ("mlp_fc2", "kernel"), "mlp.fc2.bias": ("mlp_fc2", "bias"),
            }
            if rest in mapping:
                path = base + mapping[rest]
                flat[path] = arr.T if rest.endswith("weight") and arr.ndim == 2 else arr
    return {"params": _unflatten(flat)}
