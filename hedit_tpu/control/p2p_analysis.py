"""Attention-map analysis utilities.

Parity: the visualization/analysis API of ``p2p/ptp_classes.py``:
``aggregate_attention`` (:300-313) — average stored maps of a given
resolution across layers and steps for one prompt row; and the cross-map
image grids of ``show_cross_attention`` (:316-330) reduced to array form
(no cv2 text rendering; callers compose PIL output).
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
