"""Auto-mask MasaCtrl: foreground masks derived from cross-attention maps.

Parity: ``text-guided/masactrl/masactrl.py:151-286``
(MutualSelfAttentionControlMaskAuto) — 16x16 cross-attention maps are
aggregated (mean over layers and heads), reduced at the ref/cur token
indices, min-max normalized, binarized at ``thres``, and used as the fg/bg
masks of the masked mutual self-attention.

TPU re-design: the reference accumulates cross maps layer-by-layer inside one
monkey-patched forward, so early self layers see only the maps produced
before them.  Functionally that is a partially-warmed-up estimate of the same
mask; here the maps come from a dedicated STORE pass over the full UNet
(``collect_cross16``), giving every self layer the complete-step mask, and
the masked attention itself reuses ``MasaCtrlMaskControl``.  Costs one extra
UNet pass per controlled call; mask quality is equal-or-better (all layers
contribute).  Documented deviation — the variant is exercised by none of the
reference mains.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import LayerTag
from hedit_tpu.control.masactrl_mask import MasaCtrlMaskControl


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CrossMapStore:
    """Store-only control: head-meaned cross-attention maps at a target
    resolution (the reference stores 16x16 maps, :231-234)."""

    px: int = _static(default=256)

    stores_attn = True

    def needs_probs(self, layer: LayerTag) -> bool:
        return layer.is_cross and layer.num_pixels == self.px

    def map_qkv(self, q, k, v, layer: LayerTag):
        return q, k, v

    def map_features(self, h, site: str):
        return h

    def override_attention(self, q, k, v, layer: LayerTag):
        return None

    def edit_probs(self, probs, layer: LayerTag) -> Tuple[jnp.ndarray, Dict]:
        # [B, H, Q, K] -> head-meaned [B, Q, K] (:230-233)
        return probs, {f"cross16_{layer.place}_{layer.store_index}": probs.mean(axis=1)}


def aggregate_token_mask(
    maps: Dict[str, jnp.ndarray], token_idx: Sequence[int], row: int
) -> jnp.ndarray:
    """Mean maps over layers, sum over token indices, min-max normalize
    (:213-226).  maps values: [B, Q, K]; returns [res, res]."""
    stack = jnp.stack([v for k, v in sorted(maps.items())])  # [L, B, Q, K]
    mean = stack.mean(axis=0)[row]  # [Q, K]
    res = int(mean.shape[0] ** 0.5)
    img = mean[:, jnp.asarray(list(token_idx))].sum(-1).reshape(res, res)
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo + 1e-12)


def masactrl_auto_masks(
    eps_fn, x4, t, ctx4, *, ref_token_idx=(1,), cur_token_idx=(1,),
    thres: float = 0.1, px: int = 256,
):
    """Run the store pass and return binarized (mask_s, mask_t).

    x4 rows [u_src, u_tar, c_src, c_tar]; masks read the CONDITIONAL rows
    (source = row 2 -> mask[-2] convention, target = row 3)."""
    from hedit_tpu.edit.h_edit_p2p import flatten_attn_store

    _, aux = eps_fn(x4, t, ctx4, CrossMapStore(px=px))
    maps = flatten_attn_store(aux)
    mask_s = aggregate_token_mask(maps, ref_token_idx, row=2)
    mask_t = aggregate_token_mask(maps, cur_token_idx, row=3)
    return (mask_s >= thres).astype(jnp.float32), (mask_t >= thres).astype(jnp.float32)


def auto_mask_control(step, mask_s, mask_t, *, start_step=4, start_layer=10):
    return MasaCtrlMaskControl(
        step=step, mask_s=mask_s, mask_t=mask_t,
        start_step=start_step, start_layer=start_layer,
    )
