"""The opt-in int8 conv lever (ops/int8_conv.py; VERDICT r3 #3).

Round-3 probes measured w8a8 convs 1.1-1.4x ONLY at the res<=32 large-C_in
sites; these tests pin (a) bit-exact nn.Conv parity with the flag OFF
(the default), (b) the routing gate, (c) the quantization drift bound,
(d) the straight-through VJP that keeps the through-UNet gradient modes
alive, and (e) end-to-end UNet forward drift with the flag ON.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hedit_tpu.ops.int8_conv import (
    Int8RoutableConv,
    should_route_int8,
    w8a8_conv,
)


@pytest.fixture
def int8_on(monkeypatch):
    monkeypatch.setenv("HEDIT_INT8_CONV", "1")
    monkeypatch.setenv("HEDIT_INT8_CONV_MAX_RES", "32")
    monkeypatch.setenv("HEDIT_INT8_CONV_MIN_CI", "1280")


def _float_ref(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


def test_w8a8_drift_bound():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 16, 16, 64).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, 64, 32).astype(np.float32) * 0.05)
    b = jnp.asarray(rs.randn(32).astype(np.float32) * 0.1)
    ref = _float_ref(x, k, b)
    out = w8a8_conv(x, k, b, padding=((1, 1), (1, 1)), dtype=jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    # 8-bit symmetric quant, per-channel weights + per-tensor acts: the
    # error budget is ~2*(1/254) rms per factor -> ~1% relative
    assert 1e-4 < rel < 2e-2, rel


def test_ste_gradient_matches_float_conv():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 8, 8, 16).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 3, 16, 8).astype(np.float32) * 0.1)
    b = jnp.zeros((8,), jnp.float32)

    gx_q = jax.grad(lambda a: jnp.sum(jnp.sin(
        w8a8_conv(a, k, b, padding=((1, 1), (1, 1)), dtype=jnp.float32))))(x)
    gx_f = jax.grad(lambda a: jnp.sum(jnp.sin(_float_ref(a, k, b))))(x)
    # the STE backward IS the float conv's VJP; cotangents differ only via
    # the (quantized vs float) primal feeding sin' — bound accordingly
    rel = float(jnp.linalg.norm(gx_q - gx_f) / jnp.linalg.norm(gx_f))
    assert rel < 5e-2, rel
    assert bool(jnp.isfinite(gx_q).all()) and float(jnp.abs(gx_q).max()) > 0


def test_routing_gate(int8_on):
    assert should_route_int8(16, 16, 2560)
    assert should_route_int8(32, 32, 1280)
    assert not should_route_int8(64, 64, 2560)  # res too large
    assert not should_route_int8(16, 16, 640)   # C_in too small


def test_flag_off_is_bitexact_nn_conv():
    from flax import linen as nn

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 8, 8, 32).astype(np.float32))
    ours = Int8RoutableConv(16, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=jnp.float32)
    stock = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)), dtype=jnp.float32)
    p1 = ours.init(jax.random.PRNGKey(0), x)
    p2 = stock.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    np.testing.assert_array_equal(np.asarray(ours.apply(p1, x)),
                                  np.asarray(stock.apply(p2, x)))


def test_flag_on_param_tree_unchanged_and_routed(int8_on, monkeypatch):
    from flax import linen as nn

    monkeypatch.setenv("HEDIT_INT8_CONV_MIN_CI", "32")
    monkeypatch.setenv("HEDIT_INT8_CONV_MAX_RES", "8")
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 8, 8, 32).astype(np.float32))
    ours = Int8RoutableConv(16, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=jnp.float32)
    stock = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)), dtype=jnp.float32)
    p1 = ours.init(jax.random.PRNGKey(0), x)
    p2 = stock.init(jax.random.PRNGKey(0), x)
    # identical params (checkpoints/sharding rules unaffected) ...
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), p1, p2)
    # ... but the computation is now quantized: small nonzero drift
    a = np.asarray(ours.apply(p1, x))
    b = np.asarray(stock.apply(p2, x))
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert 1e-5 < rel < 2e-2, rel


def test_unet_forward_drift_with_flag(int8_on, monkeypatch):
    """End-to-end: a tiny-UNet forward with thresholds lowered to cover its
    inner blocks must drift by a bounded-small relative amount, with the
    identical param pytree."""
    from hedit_tpu.pipelines.sd import create_sd_pipeline

    monkeypatch.delenv("HEDIT_INT8_CONV", raising=False)
    pipe = create_sd_pipeline(tiny=True, num_inference_steps=2, seed=0)
    rs = np.random.RandomState(4)
    u = pipe.unet.cfg
    x = jnp.asarray(rs.randn(1, u.sample_size, u.sample_size, 4)
                    .astype(np.float32) * 0.2)
    ctx = jnp.asarray(rs.randn(1, 77, u.cross_attention_dim)
                      .astype(np.float32) * 0.1)
    t = jnp.array([3], jnp.int32)
    ref = np.asarray(pipe.unet.apply(pipe.unet_params, x, t, ctx))

    monkeypatch.setenv("HEDIT_INT8_CONV", "1")
    monkeypatch.setenv("HEDIT_INT8_CONV_MIN_CI",
                       str(min(u.block_out_channels)))
    monkeypatch.setenv("HEDIT_INT8_CONV_MAX_RES", str(u.sample_size))
    out = np.asarray(pipe.unet.apply(pipe.unet_params, x, t, ctx))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert 1e-5 < rel < 5e-2, rel
