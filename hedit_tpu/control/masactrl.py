"""MasaCtrl (mutual self-attention) as a functional q/k/v remap.

Parity: ``text-guided/masactrl/masactrl.py:11-69`` — for SELF-attention layers
with pair-index >= start_layer (of 16 q/k-pairs in SD-1.5) and editing step >=
start_step, ALL rows in each CFG half attend to the FIRST row's keys/values
(the source); applied to both the unconditional and conditional halves
(:60-67, k/v sliced ``[:num_heads]`` per half).

The reference's counter state machine (``masactrl_utils.py:6-32``) reduces to:
pair index = LayerTag.index // 2 (attn1/attn2 alternate in visit order, same
as the reference's ``cur_att_layer // 2``), and the editing step is a dynamic
leaf.  No probability materialization is needed — this control composes with
the fused/flash attention path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import LayerTag


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


# Self-attention pair count per backbone (reference ``masactrl.py:12-15``
# MODEL_TYPE map): start_layer indexes into this range.  Only SD is built in
# this framework; the SDXL constant is carried for config parity.
MODEL_TYPE_LAYERS: Dict[str, int] = {"SD": 16, "SDXL": 70}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MasaCtrlControl:
    step: jnp.ndarray                       # dynamic editing-step index
    start_step: int = _static(default=4)    # --step (main_masactrl.py:88)
    start_layer: int = _static(default=10)  # --layer (main_masactrl.py:89)
    num_halves: int = _static(default=2)    # CFG halves in the batch
    total_layers: int = _static(default=MODEL_TYPE_LAYERS["SD"])

    stores_attn = False

    def __post_init__(self):
        # start_layer indexes the backbone's self-attention pair range
        # (reference ``masactrl.py:12-15``): validate against total_layers so
        # an SDXL-style config actually changes behavior instead of silently
        # carrying an unread constant.
        if not 0 <= self.start_layer < self.total_layers:
            raise ValueError(
                f"start_layer={self.start_layer} out of range for a backbone "
                f"with {self.total_layers} self-attention layers"
            )

    def _applies(self, layer: LayerTag) -> bool:
        return (
            not layer.is_cross
            and layer.place in ("down", "mid", "up")
            and (layer.index // 2) >= self.start_layer
        )

    def needs_probs(self, layer: LayerTag) -> bool:
        return False

    def map_qkv(self, q, k, v, layer: LayerTag):
        if not self._applies(layer):
            return q, k, v
        B = k.shape[0]
        half = B // self.num_halves
        src_rows = (jnp.arange(B) // half) * half  # first row of each half
        on = self.step >= self.start_step
        k_new = jnp.where(on, k[src_rows], k)
        v_new = jnp.where(on, v[src_rows], v)
        return q, k_new, v_new

    def edit_probs(self, probs, layer: LayerTag) -> Tuple[jnp.ndarray, Dict]:
        return probs, {}

    def map_features(self, h, site: str):
        return h
