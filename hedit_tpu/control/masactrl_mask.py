"""Mask-guided MasaCtrl (explicit foreground/background masks).

Parity: ``text-guided/masactrl/masactrl.py:71-148``
(MutualSelfAttentionControlMask) — for qualifying self-attention layers:
* source rows attend their own k/v;
* target rows attend the SOURCE k/v twice, with the source mask applied in
  LOGIT space — foreground pass masks out background keys
  (sim + min where mask==0) and vice versa (:100-110);
* the two results are blended per-query-pixel by the TARGET mask interpolated
  to the layer resolution (:136-143).

Batch layout [u_src, u_tar, c_src, c_tar] (both CFG halves edited, as in the
plain MasaCtrl).  Realized through the ``override_attention`` hook since the
intervention happens pre-softmax.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import LayerTag

NEG = -1e30


def _static(**kw):
    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MasaCtrlMaskControl:
    step: jnp.ndarray         # dynamic editing-step index
    mask_s: jnp.ndarray       # [H, W] float source mask
    mask_t: jnp.ndarray       # [H, W] float target mask
    start_step: int = _static(default=4)
    start_layer: int = _static(default=10)

    stores_attn = False

    def _applies(self, layer: LayerTag) -> bool:
        return (
            not layer.is_cross
            and layer.place in ("down", "mid", "up")
            and (layer.index // 2) >= self.start_layer
        )

    def needs_probs(self, layer: LayerTag) -> bool:
        return False

    def map_qkv(self, q, k, v, layer: LayerTag):
        return q, k, v

    def edit_probs(self, probs, layer: LayerTag) -> Tuple[jnp.ndarray, Dict]:
        return probs, {}

    def map_features(self, h, site: str):
        return h

    def override_attention(self, q, k, v, layer: LayerTag):
        """q/k/v [4, heads, L, hd] with rows [u_src, u_tar, c_src, c_tar]."""
        if not self._applies(layer):
            return None
        d = q.shape[-1]
        res = int(layer.num_pixels ** 0.5)
        m_s = jax.image.resize(self.mask_s[None, None], (1, 1, res, res),
                               method="nearest").reshape(-1)  # [L]
        m_t = jax.image.resize(self.mask_t[None, None], (1, 1, res, res),
                               method="nearest").reshape(-1)[:, None]  # [L,1]

        def attn(qr, kr, vr, logit_bias=None):
            s = jnp.einsum("hqd,hkd->hqk", qr, kr,
                           preferred_element_type=jnp.float32) / (d**0.5)
            if logit_bias is not None:
                s = s + logit_bias[None, None, :]
            p = jax.nn.softmax(s, axis=-1).astype(vr.dtype)
            return jnp.einsum("hqk,hkd->hqd", p, vr)

        fg_bias = jnp.where(m_s == 0, NEG, 0.0)  # fg pass: drop bg keys
        bg_bias = jnp.where(m_s == 1, NEG, 0.0)

        def target(qr):
            fg = attn(qr, k[0], v[0], fg_bias)
            bg = attn(qr, k[0], v[0], bg_bias)
            return fg * m_t[None].astype(fg.dtype) + bg * (1 - m_t[None]).astype(fg.dtype)

        out_u_src = attn(q[0], k[0], v[0])
        out_c_src = attn(q[2], k[2], v[2])
        out_u_tar = target(q[1])
        out_c_tar = target(q[3])
        full = jnp.stack([out_u_src, out_u_tar, out_c_src, out_c_tar])

        on = self.step >= self.start_step
        plain = jnp.stack([
            attn(q[0], k[0], v[0]), attn(q[1], k[1], v[1]),
            attn(q[2], k[2], v[2]), attn(q[3], k[3], v[3]),
        ])
        return jnp.where(on, full, plain)
