"""Attention-map analysis utilities.

Parity: the visualization/analysis API of ``p2p/ptp_classes.py``:
``aggregate_attention`` (:300-313) — average stored maps of a given
resolution across layers and steps for one prompt row;
``show_cross_attention`` (:316-330) — per-token heatmap tiles with the
token text drawn underneath (PIL here instead of cv2) composed into a
grid; and ``show_self_attention_comp`` (:333-347) — top SVD components
of the aggregated self-attention map.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def aggregate_attention(
    store_sums: Dict[str, np.ndarray],
    *,
    res: int,
    from_where: Sequence[str] = ("down", "up"),
    is_cross: bool = True,
    select: int = 0,
    num_steps: int = 1,
) -> np.ndarray:
    """Average attention over layers/heads/steps -> [res, res, K].

    store_sums: {store_name: [2, heads, px, K]} accumulated over steps (the
    LocalBlend carry's contents, or any collection of sown maps).
    select: prompt row (0 = source/base, 1 = edited).
    """
    kind = "cross" if is_cross else "self"
    maps = []
    for name, arr in sorted(store_sums.items()):
        place = name.split("_")[0]
        if place not in from_where or f"_{kind}_" not in name:
            continue
        arr = np.asarray(arr)
        if arr.shape[2] != res * res:
            continue
        maps.append(arr[select].reshape(-1, res, res, arr.shape[-1]))
    if not maps:
        raise ValueError(f"no stored {kind} maps at resolution {res}")
    out = np.concatenate(maps, axis=0)
    return out.sum(0) / out.shape[0] / max(num_steps, 1)


def cross_attention_images(
    store_sums: Dict[str, np.ndarray],
    token_ids: Sequence[int],
    *,
    res: int = 16,
    select: int = 0,
    num_steps: int = 1,
) -> np.ndarray:
    """Per-token normalized attention heatmaps [n_tokens, res, res] in [0, 1]
    (array form of ``show_cross_attention``)."""
    agg = aggregate_attention(
        store_sums, res=res, is_cross=True, select=select, num_steps=num_steps
    )
    out = []
    for i, _ in enumerate(token_ids):
        img = agg[:, :, i]
        out.append(img / (img.max() + 1e-12))
    return np.stack(out)


def _text_under_image(image: np.ndarray, text: str) -> np.ndarray:
    """Append a white strip under ``image`` with ``text`` centered in it
    (``ptp_utils.py:124-135`` semantics, PIL's built-in bitmap font instead
    of cv2)."""
    from PIL import Image, ImageDraw

    h, w, c = image.shape
    strip_h = int(h * 0.2)
    out = np.full((h + strip_h, w, c), 255, dtype=np.uint8)
    out[:h] = image
    pil = Image.fromarray(out)
    draw = ImageDraw.Draw(pil)
    # default bitmap font: no font files needed in this image
    box = draw.textbbox((0, 0), text)
    tw, th = box[2] - box[0], box[3] - box[1]
    draw.text(((w - tw) // 2, h + (strip_h - th) // 2), text, fill=(0, 0, 0))
    return np.asarray(pil)


def view_images(images: np.ndarray, num_rows: int = 1, offset_ratio: float = 0.02):
    """Compose [N, H, W, 3] uint8 tiles into one PIL grid image with white
    gutters (``ptp_utils.py:137-155`` semantics, returned instead of
    displayed)."""
    from PIL import Image

    images = np.asarray(images)
    n = images.shape[0]
    cols = int(np.ceil(n / num_rows))
    h, w = images.shape[1], images.shape[2]
    off = int(h * offset_ratio)
    grid = np.full(
        (num_rows * h + (num_rows - 1) * off,
         cols * w + (cols - 1) * off, 3), 255, dtype=np.uint8)
    for i in range(n):
        r, c = divmod(i, cols)
        grid[r * (h + off):r * (h + off) + h,
             c * (w + off):c * (w + off) + w] = images[i]
    return Image.fromarray(grid)


def show_cross_attention(
    store_sums: Dict[str, np.ndarray],
    prompt: str,
    tokenizer,
    *,
    res: int = 16,
    select: int = 0,
    num_steps: int = 1,
    tile_px: int = 256,
):
    """Per-token heatmap tiles labeled with the decoded token text, composed
    into one PIL image (``ptp_classes.py:316-330``)."""
    from PIL import Image

    token_ids = tokenizer.encode(prompt)
    heat = cross_attention_images(
        store_sums, token_ids, res=res, select=select, num_steps=num_steps)
    tiles = []
    for i, tid in enumerate(token_ids):
        img = (255 * heat[i]).astype(np.uint8)
        img = np.repeat(img[:, :, None], 3, axis=2)
        img = np.asarray(Image.fromarray(img).resize((tile_px, tile_px)))
        tiles.append(_text_under_image(img, tokenizer.decode([int(tid)])))
    return view_images(np.stack(tiles))


def self_attention_components(
    store_sums: Dict[str, np.ndarray],
    *,
    res: int = 16,
    max_com: int = 10,
    select: int = 0,
    num_steps: int = 1,
) -> np.ndarray:
    """Top-``max_com`` SVD components of the aggregated self-attention map,
    each min-max normalized to [0, 1]: [max_com, res, res]
    (array form of ``show_self_attention_comp``, ``ptp_classes.py:333-347``)."""
    agg = aggregate_attention(
        store_sums, res=res, is_cross=False, select=select,
        num_steps=num_steps,
    ).reshape(res * res, res * res)
    _, _, vh = np.linalg.svd(agg - agg.mean(axis=1, keepdims=True))
    comps = vh[:max_com].reshape(max_com, res, res)
    comps = comps - comps.min(axis=(1, 2), keepdims=True)
    comps = comps / (comps.max(axis=(1, 2), keepdims=True) + 1e-12)
    return comps


def show_self_attention_comp(
    store_sums: Dict[str, np.ndarray],
    *,
    res: int = 16,
    max_com: int = 10,
    select: int = 0,
    num_steps: int = 1,
    tile_px: int = 256,
):
    """SVD-component tiles side by side as one PIL image
    (``ptp_classes.py:333-347``)."""
    from PIL import Image

    comps = self_attention_components(
        store_sums, res=res, max_com=max_com, select=select,
        num_steps=num_steps)
    tiles = [
        np.asarray(Image.fromarray(
            np.repeat((255 * c).astype(np.uint8)[:, :, None], 3, axis=2)
        ).resize((tile_px, tile_px)))
        for c in comps
    ]
    return view_images(np.stack(tiles))
