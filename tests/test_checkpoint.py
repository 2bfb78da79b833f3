"""Orbax converted-weight caching tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from hedit_tpu.io_utils.checkpoint import load_or_convert, load_params, save_params


def test_save_load_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    params = {"params": {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3),
                                   "bias": jnp.zeros(3)}}}
    path = str(tmp_path / "ckpt")
    save_params(params, path)
    restored = load_params(path, template=params)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["layer"]["kernel"]),
        np.asarray(params["params"]["layer"]["kernel"]),
    )


def test_load_or_convert_caches(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    calls = []

    def convert():
        calls.append(1)
        return {"w": jnp.ones((4,))}

    p1 = load_or_convert(str(tmp_path), "model", convert)
    p2 = load_or_convert(str(tmp_path), "model", convert,
                         template={"w": jnp.ones((4,))})
    assert len(calls) == 1  # second call hit the cache
    np.testing.assert_allclose(np.asarray(p2["w"]), np.ones(4))
