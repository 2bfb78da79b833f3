"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig
from hedit_tpu.parallel.mesh import (
    make_mesh,
    param_spec,
    shard_batch,
    shard_unet_params,
)


def test_mesh_axes():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_param_spec_rules():
    assert param_spec("down_blocks_0/attentions_0/transformer_blocks_0/attn1/to_q/kernel") == \
        jax.sharding.PartitionSpec(None, "model")
    assert param_spec("mid_block/attentions_0/transformer_blocks_0/attn2/to_out_0/kernel") == \
        jax.sharding.PartitionSpec("model", None)
    assert param_spec("down_blocks_0/resnets_0/conv1/kernel") == \
        jax.sharding.PartitionSpec(None, None, None, "model")
    assert param_spec("down_blocks_0/resnets_0/norm1/scale") == jax.sharding.PartitionSpec()


def test_shard_unet_params_and_batch():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model_parallel=2)
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    x = jnp.zeros((4, 16, 16, 4))
    ctx = jnp.zeros((4, 77, cfg.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), x, jnp.array(1), ctx)
    sharded = shard_unet_params(params, mesh)
    # a to_q kernel should be sharded over 'model' on its output dim
    leaf = sharded["params"]["down_blocks_0"]["attentions_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert "model" in str(leaf.sharding.spec)
    xb = shard_batch(x, mesh)
    assert "data" in str(xb.sharding.spec)
    # forward still runs with sharded params + batch
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c))(
            sharded, xb, jnp.array(1), ctx
        )
    assert out.shape == (4, 16, 16, 4)
    assert bool(jnp.isfinite(out).all())


def test_bf16_forward_finite():
    import dataclasses

    cfg = dataclasses.replace(UNetConfig.tiny(), dtype=jnp.bfloat16)
    model = UNet2DCondition(cfg)
    x = jnp.ones((1, 16, 16, 4), jnp.float32) * 0.1
    ctx = jnp.ones((1, 77, cfg.cross_attention_dim), jnp.float32) * 0.1
    params = model.init(jax.random.PRNGKey(0), x, jnp.array(1), ctx)
    out = model.apply(params, x, jnp.array(501), ctx)
    assert bool(jnp.isfinite(out).all())
