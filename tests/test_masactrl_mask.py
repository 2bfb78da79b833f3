"""Mask-guided MasaCtrl tests."""

import jax
import jax.numpy as jnp
import numpy as np

from hedit_tpu.control.base import LayerTag
from hedit_tpu.control.masactrl_mask import MasaCtrlMaskControl
from hedit_tpu.ops.attention import controlled_attention


def _ctrl(step=5, start_step=4, start_layer=0):
    mask = np.zeros((4, 4), np.float32)
    mask[:, :2] = 1.0  # left half is foreground
    return MasaCtrlMaskControl(
        step=jnp.array(step), mask_s=jnp.asarray(mask), mask_t=jnp.asarray(mask),
        start_step=start_step, start_layer=start_layer,
    )


def test_override_fires_on_qualifying_layers():
    tag = LayerTag(place="up", is_cross=False, num_pixels=16, index=6)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(4, 2, 16, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(4, 2, 16, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(4, 2, 16, 8).astype(np.float32))
    out = _ctrl().override_attention(q, k, v, tag)
    assert out is not None and out.shape == q.shape
    assert bool(jnp.isfinite(out).all())
    # cross layers: no override
    tag_cross = LayerTag(place="up", is_cross=True, num_pixels=16, index=7)
    assert _ctrl().override_attention(q, k, v, tag_cross) is None


def test_before_start_step_is_plain_attention():
    from hedit_tpu.ops.flash_attention import reference_attention

    tag = LayerTag(place="up", is_cross=False, num_pixels=16, index=6)
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(4, 2, 16, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(4, 2, 16, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(4, 2, 16, 8).astype(np.float32))
    out = _ctrl(step=1).override_attention(q, k, v, tag)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_target_rows_attend_source_kv():
    """With a full-foreground mask, target output must equal attention of the
    target queries against the SOURCE k/v (mutual attention)."""
    from hedit_tpu.ops.flash_attention import reference_attention

    tag = LayerTag(place="up", is_cross=False, num_pixels=16, index=6)
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(4, 2, 16, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(4, 2, 16, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(4, 2, 16, 8).astype(np.float32))
    ones = jnp.ones((4, 4))
    ctrl = MasaCtrlMaskControl(step=jnp.array(5), mask_s=ones, mask_t=ones,
                               start_step=4, start_layer=0)
    out = ctrl.override_attention(q, k, v, tag)
    want_tar = reference_attention(q[1:2], k[0:1], v[0:1])[0]
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(want_tar),
                               rtol=1e-4, atol=1e-5)


def test_integration_through_controlled_attention():
    tag = LayerTag(place="up", is_cross=False, num_pixels=16, index=6)
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(4, 16, 16).astype(np.float32))  # [B, S, H*D]
    out, store = controlled_attention(q, q, q, heads=2, layer=tag, control=_ctrl())
    assert out.shape == q.shape and store == {}
    assert bool(jnp.isfinite(out).all())
