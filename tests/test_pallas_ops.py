"""Pallas kernel correctness (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hedit_tpu.ops.groupnorm import group_norm_pallas, group_norm_reference


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 128), 32), ((1, 16, 16, 256), 32)])
def test_groupnorm_kernel_oracle(shape, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    c = shape[-1]
    scale = jnp.asarray(rng.randn(c).astype(np.float32))
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    want = group_norm_reference(x, scale, bias, groups=groups)
    got = group_norm_pallas(x, scale, bias, groups=groups, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_groupnorm_kernel_silu_fused():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    scale = jnp.ones(128)
    bias = jnp.zeros(128)
    want = group_norm_reference(x, scale, bias, groups=32, act="silu")
    got = group_norm_pallas(x, scale, bias, groups=32, act="silu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
