"""Plug-and-Play feature/attention injection as functional hooks.

Parity: ``text-guided/plug_n_play/pnp_utils.py`` —
* q/k injection on the self-attention (attn1) of decoder blocks
  up_blocks {1: [1, 2], 2: [0, 1, 2], 3: [0, 1, 2]} (:88-93): when the
  timestep is inside the injection schedule, the target row's q and k are
  replaced by the source row's (:52-58).  Batch layout is exactly
  [source, target] (injection only fires at batch size 2, docs.md:19-26).
* conv-feature injection at up_blocks[1].resnets[1] (:95-155): the conv-branch
  hidden states (post conv2, PRE skip-add) of the target row are replaced by
  the source row's (:132-142).

The reference gates on ``t in injection_schedule`` with a module attribute set
before every UNet call (``register_time``, :12-26).  Here the gate is a pair
of dynamic booleans computed from the scan step index against
``int(N * pnp_attn_t)`` / ``int(N * pnp_f_t)`` thresholds
(``main_plugnplay.py:189-194``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, FrozenSet, Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import LayerTag

PNP_ATTN_SITES: FrozenSet[Tuple[int, int]] = frozenset(
    {(1, 1), (1, 2), (2, 0), (2, 1), (2, 2), (3, 0), (3, 1), (3, 2)}
)
PNP_CONV_SITE = "up_1_resnet_1"


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PnPControl:
    qk_on: jnp.ndarray    # dynamic bool — step < int(N * pnp_attn_t)
    conv_on: jnp.ndarray  # dynamic bool — step < int(N * pnp_f_t)

    stores_attn = False

    def needs_probs(self, layer: LayerTag) -> bool:
        return False

    def map_qkv(self, q, k, v, layer: LayerTag):
        if layer.is_cross or (layer.up_block_index, layer.inner_index) not in PNP_ATTN_SITES:
            return q, k, v
        # rows: [source, target]; inject source q/k into target (:52-58)
        q_new = q.at[1].set(jnp.where(self.qk_on, q[0], q[1]))
        k_new = k.at[1].set(jnp.where(self.qk_on, k[0], k[1]))
        return q_new, k_new, v

    def edit_probs(self, probs, layer: LayerTag) -> Tuple[jnp.ndarray, Dict]:
        return probs, {}

    def map_features(self, h, site: str):
        if site != PNP_CONV_SITE:
            return h
        return h.at[1].set(jnp.where(self.conv_on, h[0], h[1]))


def pnp_step_gates(after_skip_steps: int, pnp_attn_t: float, pnp_f_t: float):
    """(qk_mask, conv_mask) over the editing loop: step i is inside the
    schedule iff i < int(N * frac) (``main_plugnplay.py:189-194``)."""
    import numpy as np

    N = after_skip_steps
    qk = np.arange(N) < int(N * pnp_attn_t)
    conv = np.arange(N) < int(N * pnp_f_t)
    return jnp.asarray(qk), jnp.asarray(conv)
