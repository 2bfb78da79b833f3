"""CLIP Gram-matrix style loss.

Parity: ``text-guided-n-style/clip_guidance/base_clip.py:31-66`` — resize the
[-1,1] image to 224 bicubic, normalize with the CLIP stats adapted to [-1,1]
inputs, run the vision tower with feature taps, take block-2 features minus
the CLS token, Gram G = f^T f, residual G1 - G2; the loss is the Frobenius
norm of the residual (``inversion/h_edit.py:172-173``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hedit_tpu.ops.resize import resize_torch

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess_pm1(img: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """[-1,1] NHWC -> CLIP-normalized, resized (``base_clip.py:38-41,55-57``).

    The resize matches torch's ``F.interpolate(mode='bicubic')`` exactly
    (a=-0.75, no antialias — NOT jax.image.resize's Keys a=-0.5 kernel);
    the style VJP differentiates through it."""
    x = resize_torch(img, (size, size), mode="bicubic")
    mean = jnp.asarray(CLIP_MEAN * 2 - 1)
    std = jnp.asarray(CLIP_STD * 2)
    return (x - mean) / std


def gram_from_features(feats_block: jnp.ndarray) -> jnp.ndarray:
    """Block features [B, L, D] -> Gram [D, D] of batch item 0, CLS dropped."""
    f = feats_block[0, 1:, :]
    return f.T @ f


def gram_residual(vision_apply, img_pm1, ref_gram, *, block: int = 2,
                  size: int = 224) -> jnp.ndarray:
    _, feats = vision_apply(clip_preprocess_pm1(img_pm1, size))
    return gram_from_features(feats[block]) - ref_gram


def style_loss(vision_apply, img_pm1, ref_gram, *, block: int = 2,
               size: int = 224) -> jnp.ndarray:
    r = gram_residual(vision_apply, img_pm1, ref_gram, block=block, size=size)
    return jnp.linalg.norm(r)


def reference_gram(vision_apply, ref_img_01: jnp.ndarray, *, block: int = 2):
    """Precompute the style image's Gram.  The reference normalizes the style
    image from [0,1] with the raw CLIP stats (``base_clip.py:42-52``)."""
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    x = (ref_img_01 - mean) / std
    _, feats = vision_apply(x)
    return jax.lax.stop_gradient(gram_from_features(feats[block]))
