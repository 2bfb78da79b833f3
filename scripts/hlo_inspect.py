"""Dump the compiled HLO of the batch-4 UNet forward and locate the hot
fusions seen in the device profile (e.g. the [64,32,9,C] shapes) to
identify XLA's conv strategy.
"""
import os
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import dataclasses
from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig  # noqa: E402

cfg = dataclasses.replace(UNetConfig.sd15(), dtype=jnp.bfloat16)
unet = UNet2DCondition(cfg)
x = jnp.zeros((4, 64, 64, 4), jnp.bfloat16)
t = jnp.full((4,), 500, jnp.int32)
ctx = jnp.zeros((4, 77, 768), jnp.bfloat16)
params = jax.eval_shape(lambda: unet.init(jax.random.PRNGKey(0), x, t, ctx))
params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

compiled = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c)).lower(
    params, x, t, ctx).compile()
txt = compiled.as_text()
path = "/tmp/unet_hlo.txt"
with open(path, "w") as f:
    f.write(txt)
print("HLO chars:", len(txt), "->", path)

targets = sys.argv[1:] or ["fusion.229", "fusion.534", "fusion.757"]
for tgt in targets:
    m = re.search(rf"%{re.escape(tgt)} = .*", txt)
    print(f"\n### %{tgt}:")
    print(m.group(0)[:600] if m else "  (not found)")
