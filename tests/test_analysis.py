"""Attention-map analysis parity: the AttentionMapStore control (reference
AttentionStore, ptp_classes.py:124-159) + the show_cross_attention /
show_self_attention_comp renderers (ptp_classes.py:316-347)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hedit_tpu.control.p2p_analysis import (
    aggregate_attention,
    self_attention_components,
    show_cross_attention,
    show_self_attention_comp,
    view_images,
)
from hedit_tpu.control.store import AttentionMapStore
from hedit_tpu.edit.h_edit_p2p import flatten_attn_store
from hedit_tpu.pipelines.sd import create_sd_pipeline


def _stored_maps(store_self=True):
    pipe = create_sd_pipeline(tiny=True, num_inference_steps=4, seed=0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32) * 0.2)
    ctx = jnp.asarray(rng.randn(2, 77, 32).astype(np.float32) * 0.1)
    ctrl = AttentionMapStore(store_self=store_self)
    _, aux = pipe.unet_eps(x, jnp.full((2,), 501, jnp.int32), ctx, ctrl)
    return {k: np.asarray(v) for k, v in flatten_attn_store(aux).items()}


def test_attention_map_store_records_cross_and_self():
    maps = _stored_maps()
    assert any("_cross_" in k for k in maps)
    assert any("_self_" in k for k in maps)
    for v in maps.values():
        assert v.ndim == 4 and v.shape[0] == 2  # [B, H, Q, K]
        # rows of softmax sum to 1
        np.testing.assert_allclose(v.sum(-1), 1.0, atol=1e-3)

    # cross-only store drops the self maps
    maps_c = _stored_maps(store_self=False)
    assert not any("_self_" in k for k in maps_c)


def test_aggregate_and_renderers():
    from hedit_tpu.models.tokenizer import CLIPTokenizer

    maps = _stored_maps()
    res = 16  # tiny model: 16x16 latents -> 256-px maps

    agg = aggregate_attention(maps, res=res, is_cross=True, select=0)
    assert agg.shape[:2] == (res, res)

    tok = CLIPTokenizer()
    img = show_cross_attention(maps, "a cat riding a bicycle", tok, res=res)
    n_tokens = len(tok.encode("a cat riding a bicycle"))
    assert img.size[1] > 256  # tile + text strip
    assert img.size[0] >= n_tokens * 256  # one tile per token + gutters

    comps = self_attention_components(maps, res=res, max_com=4)
    assert comps.shape == (4, res, res)
    assert float(comps.min()) >= 0.0 and float(comps.max()) <= 1.0

    grid = show_self_attention_comp(maps, res=res, max_com=4)
    assert grid.size[0] >= 4 * 256


def test_view_images_grid_shape():
    tiles = np.zeros((6, 10, 10, 3), np.uint8)
    grid = view_images(tiles, num_rows=2)
    # 2 rows x 3 cols of 10px tiles with 0px offset (int(10*0.02)=0)
    assert grid.size == (30, 20)


def test_aggregate_raises_without_maps():
    with pytest.raises(ValueError, match="no stored"):
        aggregate_attention({}, res=16, is_cross=False)
