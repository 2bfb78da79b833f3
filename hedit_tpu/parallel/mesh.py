"""Device mesh + sharding rules.

The reference is single-GPU (SURVEY.md §2: ``--device_num`` is the only device
control; no distributed backend exists).  The TPU-native scale-out plan
(SURVEY.md §5.8) is:

* ``data`` axis — embarrassingly parallel PieBench samples (the dominant axis:
  700 independent images),
* ``model`` axis — tensor parallelism over attention heads / MLP hidden of the
  UNet, available from day one so batch-CFG UNet calls can shard if ever
  needed.

Sharding is expressed with ``jax.sharding.NamedSharding`` on the param pytree
and on the batched inputs; XLA inserts the collectives (psum over 'model' for
row-sharded output projections) — no hand-written communication.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % model_parallel == 0, "n_devices must divide by model_parallel"
    arr = np.array(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def dp_mesh(batch: int) -> Mesh:
    """A data-axis mesh whose size divides the batch: gcd(B, n_devices)
    devices (all of them when B is a multiple — the production case; a
    clean subset otherwise, e.g. a batch of 2 on an 8-device host)."""
    import math

    return make_mesh(math.gcd(batch, len(jax.devices())), model_parallel=1)


# (path-regex, PartitionSpec) — first match wins.  Column-parallel for
# qkv/up-proj (shard output features), row-parallel for out/down-proj (shard
# input features; XLA inserts the psum).
UNET_PARAM_RULES: Sequence[Tuple[str, P]] = (
    (r"(to_q|to_k|to_v)/kernel$", P(None, "model")),
    (r"to_out_0/kernel$", P("model", None)),
    (r"ff/net_0/proj/kernel$", P(None, "model")),
    (r"ff/net_2/kernel$", P("model", None)),
    (r"(conv1|conv2|conv_shortcut|conv)/kernel$", P(None, None, None, "model")),
    (r"time_emb_proj/kernel$", P(None, "model")),
)


def param_spec(path: str) -> P:
    for pat, spec in UNET_PARAM_RULES:
        if re.search(pat, path):
            return spec
    return P()  # replicate


def _path_str(keypath) -> str:
    return "/".join(
        getattr(k, "key", getattr(k, "idx", str(k))) if not isinstance(k, str) else k
        for k in keypath
    )


def resolve_spec(path: str, shape: Tuple[int, ...], axis_size: int) -> P:
    """The tp placement decision for one leaf: its rule spec, or replication
    when the sharded dim is not divisible by the axis size (e.g. 4-channel
    conv_out).  Pure function of (path, shape) so shardings can be censused
    at any axis size via ``jax.eval_shape`` without materializing weights."""
    spec = param_spec(path)
    for dim, name in enumerate(spec):
        if name == "model" and shape[dim] % axis_size != 0:
            return P()
    return spec


def shard_unet_params(params, mesh: Mesh):
    """Apply the tensor-parallel rules over the 'model' axis."""
    axis = mesh.shape["model"]

    def place(keypath, leaf):
        spec = resolve_spec(_path_str(keypath), leaf.shape, axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def shard_batch(x, mesh: Mesh):
    """Shard the leading (sample) axis over 'data'."""
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
