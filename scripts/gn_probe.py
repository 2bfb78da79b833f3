"""Probe the GroupNorm routing boundary on the real backend.

Drives hedit_tpu.ops.groupnorm.group_norm (the public op API) at the shapes
that bracket the routing rule: the known-OOM region (C>640 at hw>=1024) must
take the XLA path and still compile/run; the proven pallas envelope shapes
must run finite through the kernel.
"""
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from hedit_tpu.ops import groupnorm as gn  # noqa: E402

CASES = [
    # (h, w, c)         expectation
    (32, 32, 1280),   # known scoped-VMEM OOM point -> must route XLA
    (64, 64, 320),    # proven pallas envelope (res-64 UNet site)
    (16, 16, 2560),   # small slab, wide channels (res-16 concat site)
    (32, 32, 1920),   # f32-OOM shape; bf16 slab 3.93M -> multiplier excludes
]

for h, w, c in CASES:
    x = jnp.ones((2, h, w, c), jnp.bfloat16)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    slab = h * w * c * 2
    routed_pallas = (slab * gn.SLAB_MULTIPLIER <= gn.VMEM_BYTES
                     and not (c > 640 and h * w >= 1024)
                     and c % 32 == 0 and c % 128 == 0)
    y = gn.group_norm(x, scale, bias, groups=32, act="silu")
    ok = bool(jnp.isfinite(y.astype(jnp.float32)).all())
    print(f"[{h}x{w}x{c}] slab={slab/2**20:.2f}M route="
          f"{'pallas' if routed_pallas else 'xla'} finite={ok}")
print("gn_probe done on", jax.devices()[0].platform)
