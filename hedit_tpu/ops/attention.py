"""Dual-path attention dispatch.

The reference's ``P2PCrossAttnProcessor`` (``text-guided/p2p/ptp_utils.py:31-122``)
always materializes attention probabilities so a controller may mutate them.
Here the path is chosen *statically* per (layer, control):

* fused path — Pallas flash attention for long self-attention, XLA
  einsum-softmax for short sequences.  Used whenever
  ``control.needs_probs(layer)`` is False (includes MasaCtrl / PnP, which only
  remap q/k/v and never read probabilities).
* probability path — materialize ``softmax(qk^T)``, let the control edit/store,
  then ``probs @ v``.  Only P2P-controlled layers take this path, and P2P
  ignores self-attention above 32x32 tokens (``ptp_classes.py:194-200``), so the
  4096-token self-attention never materializes probabilities.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import LayerTag, NoControl
from hedit_tpu.ops.flash_attention import flash_attention, reference_attention

# Minimum query length for routing to the Pallas kernel; below this the XLA
# fused path wins (kernel launch + padding overheads dominate).
FLASH_MIN_SEQ = 1024


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[B, S, H*D] -> [B, H, S, D]"""
    b, s, hd = x.shape
    return x.reshape(b, s, heads, hd // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, D] -> [B, S, H*D]"""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def attention_probs(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Materialized softmax(q k^T / sqrt(d)) in float32: [B, H, Sq, Sk]."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    return jax.nn.softmax(s / (d**0.5), axis=-1)


def fused_attention(q, k, v, *, use_pallas: bool = True) -> jnp.ndarray:
    """Route to Pallas flash or XLA by sequence length (static shapes)."""
    sq, sk = q.shape[2], k.shape[2]
    on_tpu = jax.devices()[0].platform == "tpu"
    if use_pallas and on_tpu and sq >= FLASH_MIN_SEQ and sk >= FLASH_MIN_SEQ:
        return flash_attention(q, k, v)
    return reference_attention(q, k, v)


def controlled_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    heads: int,
    layer: LayerTag,
    control=NoControl(),
    use_pallas: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Multi-head attention with functional control hooks.

    q/k/v: [B, S, H*D] (pre head-split projections).
    Returns ([B, Sq, H*D], stored-maps dict for the attention store).
    """
    qh = split_heads(q, heads)
    kh = split_heads(k, heads)
    vh = split_heads(v, heads)

    if hasattr(control, "override_attention"):
        out = control.override_attention(qh, kh, vh, layer)
        if out is not None:
            return merge_heads(out).astype(q.dtype), {}

    qh, kh, vh = control.map_qkv(qh, kh, vh, layer)

    if control.needs_probs(layer):
        edit_pair = getattr(control, "edit_pair", None)
        cs = getattr(control, "cond_start", 0)
        if edit_pair is not None and qh.shape[0] > 2:
            # Row-split: P2P reads row cs and writes row cs+1 only, so
            # probabilities are materialized for that pair alone; every other
            # row rides the fused path.  Halves (batch-4) the prob-path
            # QK/softmax work and cuts its PV to one row.
            probs2 = attention_probs(qh[cs:cs + 2], kh[cs:cs + 2])  # [2,H,Q,K]
            new_repl, store = edit_pair(probs2[0], probs2[1], layer)
            out_edit = jnp.einsum(
                "hqk,hkd->hqd", new_repl.astype(vh.dtype), vh[cs + 1]
            )[None]
            b = qh.shape[0]

            def drop_edit_row(x):
                if cs + 2 >= b:
                    return x[:cs + 1]
                return jnp.concatenate([x[:cs + 1], x[cs + 2:]], axis=0)

            out_rest = fused_attention(
                drop_edit_row(qh), drop_edit_row(kh), drop_edit_row(vh),
                use_pallas=use_pallas,
            )
            parts = [out_rest[:cs + 1], out_edit]
            if cs + 2 < qh.shape[0]:
                parts.append(out_rest[cs + 1:])
            out = jnp.concatenate(parts, axis=0)
            return merge_heads(out).astype(q.dtype), store
        probs = attention_probs(qh, kh)  # [B, H, Sq, Sk] f32
        probs, store = control.edit_probs(probs, layer)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(vh.dtype), vh
        )
        return merge_heads(out).astype(q.dtype), store

    out = fused_attention(qh, kh, vh, use_pallas=use_pallas)
    return merge_heads(out), {}
