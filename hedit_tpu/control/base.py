"""Attention-control protocol: the functional replacement for the reference's
monkey-patched attention processors.

The reference implements three control mechanisms by mutating diffusers
``Attention`` modules at runtime:

* Prompt-to-Prompt — a processor that materializes attention probabilities and
  hands them to a stateful controller (``text-guided/p2p/ptp_utils.py:31-122``).
* MasaCtrl — a forward monkey-patch that makes target queries attend to source
  keys/values (``text-guided/masactrl/masactrl_utils.py:35-104``).
* Plug-and-Play — q/k injection on decoder self-attention
  (``text-guided/plug_n_play/pnp_utils.py:29-93``).

Here, control is a *pytree argument* threaded through the UNet apply call.  Each
attention layer asks the control object:

1. ``map_qkv``      — pre-attention q/k/v remapping (MasaCtrl k/v source swap,
                      PnP q/k injection).  Keeps the fused/flash path usable.
2. ``needs_probs``  — STATIC decision: does this layer require materialized
                      attention probabilities?  Only P2P ever returns True, and
                      only on layers it can actually edit/store.
3. ``edit_probs``   — probability-space edit + (name -> stored map) dict for the
                      attention store.  Stored maps are *post-edit*, matching the
                      reference's in-place view mutation semantics
                      (``ptp_classes.py:202-227`` — the stored tensor shares
                      storage with the edited view).

Dynamic state (step index, accumulated maps) lives in pytree leaves so the whole
editing loop — controller included — compiles into one ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LayerTag:
    """Static identity of one attention layer inside the UNet.

    Built once at module-construction time; hashable, never traced.

    place: 'down' | 'mid' | 'up' — matches the reference's place_in_unet tags
    is_cross: cross-attention (text keys) vs self-attention
    num_pixels: query sequence length (static — sample size is static)
    index: global attention-layer index in forward visit order
    store_index: index within the per-(place, kind) store list counting only
        layers with num_pixels <= 32*32 (the reference's store filter,
        ``ptp_classes.py:135-141``); -1 if not storable.
    up_block_index / inner_index: position used by PnP's injection-site filter
        (``pnp_utils.py:88-93``).
    """

    place: str
    is_cross: bool
    num_pixels: int
    index: int
    store_index: int = -1
    up_block_index: int = -1
    inner_index: int = -1

    @property
    def store_name(self) -> str:
        kind = "cross" if self.is_cross else "self"
        return f"{self.place}_{kind}_{self.store_index}"


class NoControl:
    """Identity control — the `use_controller: False` path
    (``p2p_h_edit.py:79,439``)."""

    def map_qkv(self, q, k, v, layer: LayerTag):
        return q, k, v

    def needs_probs(self, layer: LayerTag) -> bool:
        return False

    def edit_probs(self, probs, layer: LayerTag) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        return probs, {}

    def map_features(self, h, site: str):
        """Spatial-feature hook at up-block resnet outputs (PnP conv
        injection site, ``pnp_utils.py:95-155``).  Identity by default."""
        return h

    def override_attention(self, q, k, v, layer: "LayerTag"):
        """Full-attention override hook for controls that must intervene in
        LOGIT space (e.g. mask-guided MasaCtrl's fg/bg-separated attention,
        ``masactrl/masactrl.py:93-150``).  Return None to use the standard
        fused/probability paths."""
        return None


# Register NoControl as an empty pytree so it can cross jit boundaries freely.
NO_CONTROL = NoControl()

import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(
    NoControl, lambda c: ((), ()), lambda aux, children: NO_CONTROL
)
