"""Face-mask construction: segmentation encoding + soft erosion.

Parity: ``face-swapping/arcface/face_utils.py`` —
* ``encode_segmentation`` (:5-24): class-id map -> (face, mouth, hair) binary
  maps; no-neck part ids [1..7, 10, 11, 12].
* ``SoftErosion`` (:26-52): radial-distance kernel, iterated min-convolution,
  threshold 0.6/0.9 to 1.0 with sub-threshold renormalization.
Driver flow (``main_edit.py:184-191``): mask = soft_erode(face_map + mouth_map)
with kernel 13, threshold 0.9, 7 iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NO_NECK_IDS = (1, 2, 3, 4, 5, 6, 7, 10, 11, 12)
WITH_NECK_IDS = (1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 13, 14)
MOUTH_ID = 10
HAIR_ID = 13


def encode_segmentation(seg: jnp.ndarray, no_neck: bool = True) -> jnp.ndarray:
    """seg [B, H, W] int -> [B, H, W, 3] float (face, mouth, hair)."""
    ids = NO_NECK_IDS if no_neck else WITH_NECK_IDS
    face = jnp.zeros(seg.shape, jnp.float32)
    for vid in ids:
        face = jnp.where(seg == vid, 1.0, face)
    mouth = (seg == MOUTH_ID).astype(jnp.float32)
    hair = (seg == HAIR_ID).astype(jnp.float32)
    return jnp.stack([face, mouth, hair], axis=-1)


def _erosion_kernel(kernel_size: int) -> np.ndarray:
    r = kernel_size // 2
    y, x = np.meshgrid(np.arange(kernel_size), np.arange(kernel_size),
                       indexing="ij")
    dist = np.sqrt((x - r) ** 2 + (y - r) ** 2)
    k = dist.max() - dist
    return (k / k.sum()).astype(np.float32)


def soft_erosion(
    x: jnp.ndarray,
    kernel_size: int = 15,
    threshold: float = 0.6,
    iterations: int = 1,
):
    """x [B, H, W, 1] -> (soft mask, bool mask)."""
    k = jnp.asarray(_erosion_kernel(kernel_size))[:, :, None, None]
    pad = kernel_size // 2

    def conv(v):
        return jax.lax.conv_general_dilated(
            v, k, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    for _ in range(iterations - 1):
        x = jnp.minimum(x, conv(x))
    x = conv(x)
    mask = x >= threshold
    below = jnp.where(mask, -jnp.inf, x)
    below_max = jnp.maximum(jnp.max(below), 1e-12)
    x = jnp.where(mask, 1.0, x / below_max)
    return x, mask


def build_face_mask(
    seg: jnp.ndarray, *, kernel_size: int = 13, threshold: float = 0.9,
    iterations: int = 7,
) -> jnp.ndarray:
    """face+mouth soft mask (``main_edit.py:184-191``): [B, H, W, 1]."""
    enc = encode_segmentation(seg)
    fm = (enc[..., 0] + enc[..., 1])[..., None]
    soft, _ = soft_erosion(fm, kernel_size, threshold, iterations)
    return soft
