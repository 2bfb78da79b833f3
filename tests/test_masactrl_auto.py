"""Auto-mask MasaCtrl tests (store pass + mask aggregation)."""

import jax
import jax.numpy as jnp
import numpy as np

from hedit_tpu.control.masactrl_auto import (
    CrossMapStore,
    aggregate_token_mask,
    auto_mask_control,
    masactrl_auto_masks,
)
from hedit_tpu.pipelines.sd import create_sd_pipeline


def test_aggregate_token_mask():
    # two layers, 4 rows, 4x4=16 pixels, 8 tokens; token 3 hot in one corner
    maps = {}
    for name in ("a", "b"):
        m = np.zeros((4, 16, 8), np.float32)
        m[2, 0, 3] = 4.0  # row 2, pixel 0, token 3
        m[2, 5, 3] = 2.0
        maps[name] = jnp.asarray(m)
    img = aggregate_token_mask(maps, (3,), row=2)
    assert img.shape == (4, 4)
    assert float(img[0, 0]) == 1.0  # max-normalized peak
    assert float(img.min()) == 0.0


def test_auto_masks_from_tiny_unet():
    pipe = create_sd_pipeline(tiny=True, num_inference_steps=4, seed=0)
    rng = np.random.RandomState(0)
    x4 = jnp.asarray(rng.randn(4, 16, 16, 4).astype(np.float32) * 0.2)
    ctx4 = jnp.asarray(rng.randn(4, 77, 32).astype(np.float32) * 0.1)
    eps_ctrl = lambda x, t, c, ctrl: pipe.unet_eps(x, t, c, ctrl)  # noqa: E731
    # tiny model: 16x16-px cross maps live at the sample resolution (256 px)
    mask_s, mask_t = masactrl_auto_masks(
        eps_ctrl, x4, jnp.full((4,), 501, jnp.int32), ctx4,
        ref_token_idx=(1,), cur_token_idx=(1,), thres=0.3, px=256,
    )
    res = int(256**0.5)
    assert mask_s.shape == (res, res) and mask_t.shape == (res, res)
    assert set(np.unique(np.asarray(mask_s))).issubset({0.0, 1.0})
    # masks feed the masked mutual-attention control
    ctrl = auto_mask_control(jnp.array(5), mask_s, mask_t, start_layer=0)
    eps = eps_ctrl(x4, jnp.full((4,), 501, jnp.int32), ctx4, ctrl)
    assert eps.shape == x4.shape
    assert bool(jnp.isfinite(eps).all())
