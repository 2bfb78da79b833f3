"""Store-only attention control — the reference's ``AttentionStore``
(``p2p/ptp_classes.py:124-159``): record post-softmax attention maps at
every layer whose query length is <= 32x32, cross and self, without editing
anything.  The recorded maps feed the analysis utilities in
``control/p2p_analysis.py`` (``aggregate_attention`` /
``show_cross_attention`` / ``show_self_attention_comp``).

Unlike the reference (which mutates a running dict inside the processor),
the maps come back through the flax ``attn_store`` sow collection keyed by
``LayerTag.store_name`` ("{place}_{cross|self}_{idx}") — flatten with
``hedit_tpu.edit.h_edit_p2p.flatten_attn_store`` and sum across steps on the
host (or in a scan carry, as LocalBlend does for the cross subset).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import LayerTag


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AttentionMapStore:
    """Record every <=``max_pixels`` attention map, cross and/or self.

    Values are full per-head probabilities [B, H, Q, K] — ``select`` a batch
    row in ``aggregate_attention``.  Storing self maps at 32x32 costs
    B*H*1024*1024 floats per layer; restrict with ``max_pixels`` or
    ``store_self=False`` when only cross maps are needed.
    """

    max_pixels: int = _static(default=32 * 32)
    store_cross: bool = _static(default=True)
    store_self: bool = _static(default=True)

    stores_attn = True

    def needs_probs(self, layer: LayerTag) -> bool:
        if layer.store_index < 0 or layer.num_pixels > self.max_pixels:
            return False
        return self.store_cross if layer.is_cross else self.store_self

    def map_qkv(self, q, k, v, layer: LayerTag):
        return q, k, v

    def map_features(self, h, site: str):
        return h

    def override_attention(self, q, k, v, layer: LayerTag):
        return None

    def edit_probs(
        self, probs: jnp.ndarray, layer: LayerTag
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        return probs, {layer.store_name: probs}
