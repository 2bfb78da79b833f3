"""Dual-path attention dispatch.

The reference's ``P2PCrossAttnProcessor`` (``text-guided/p2p/ptp_utils.py:31-122``)
always materializes attention probabilities so a controller may mutate them.
Here the path is chosen *statically* per (layer, control):

* fused path — Pallas flash attention for long self-attention, XLA
  einsum-softmax for short sequences.  Used whenever
  ``control.needs_probs(layer)`` is False.  MasaCtrl / PnP only remap q/k/v
  (``map_qkv``); P2P's self edit is a q/k row-select (also ``map_qkv``) and
  its cross edit a linear map over the token axis applied to the edit row's
  values (``linear_token_edit``) — all ride this path.
* probability path — materialize ``softmax(qk^T)``, let the control edit/store,
  then ``probs @ v``.  Taken ONLY at the blend-resolution (16²) cross layers
  whose post-edit maps the attention store / LocalBlend read
  (``ptp_classes.py:135-141``), and only for the (base, edit) row pair.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hedit_tpu.control.base import LayerTag, NoControl
from hedit_tpu.ops.flash_attention import (
    flash_attention_diff,
    flash_kv_fits,
    reference_attention,
)

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
    if (use_pallas and on_tpu and sq >= FLASH_MIN_SEQ and sk >= FLASH_MIN_SEQ
            and flash_kv_fits(sk, q.shape[3], q.dtype.itemsize)):
        # bounded (max-free) kernel: 4.38 ms vs the exact-max v3's 5.15 at
        # the hot [4,32,4096,40] bf16 shape, sitting on the measured 4.34 ms
        # dot->cast->dot MXU floor (scripts/flash_ablate.py).  The _diff
        # wrapper adds a VJP (through-UNet gradient modes: NMG, null-text,
        # EF style) without touching the forward kernel.
        return flash_attention_diff(q, k, v)
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

    map_qkv hooks (MasaCtrl/PnP) are batch-row remaps and run on the packed
    [B, S, H*D] layout directly; only probability-path edits and
    override_attention see head-split views.  The fused path splits heads at
    the kernel boundary (measured faster end-to-end than the packed-layout
    kernel, whose per-head in-kernel lane slicing costs more than the
    head-split copies it saves: 2.02 vs 2.06 s/image on the flagship bench).
    """
    if hasattr(control, "override_attention"):
        out = control.override_attention(
            split_heads(q, heads), split_heads(k, heads),
            split_heads(v, heads), layer)
        if out is not None:
            return merge_heads(out).astype(q.dtype), {}

    q, k, v = control.map_qkv(q, k, v, layer)

    def fused(qp, kp, vp):
        return merge_heads(fused_attention(
            split_heads(qp, heads), split_heads(kp, heads),
            split_heads(vp, heads), use_pallas=use_pallas))

    lin = getattr(control, "linear_token_edit", None)
    le = lin(layer) if lin is not None else None
    if le is not None:
        # Cross P2P edit as a linear map over the token axis (see
        # P2PControl.linear_token_edit): the edit row's value matrix becomes
        # b * v_edit in the main fused call, plus one extra fused row
        # (q_base, k_base, A @ v_edit) added into the edit row's output.
        # No probability tensor is materialized.
        A, b = le
        cs = getattr(control, "cond_start", 0)
        assert cs + 2 <= q.shape[0], (
            f"cond_start={cs} needs batch >= {cs + 2}, got {q.shape[0]}"
        )
        v_e = v[cs + 1]
        v_mod = v.at[cs + 1].set((b[:, None] * v_e.astype(jnp.float32))
                                 .astype(v.dtype))
        out = fused(q, k, v_mod)
        va = (A @ v_e.astype(jnp.float32)).astype(v.dtype)
        extra = fused(q[cs:cs + 1], k[cs:cs + 1], va[None])
        return out.at[cs + 1].add(extra[0]).astype(q.dtype), {}

    if control.needs_probs(layer):
        edit_pair = getattr(control, "edit_pair", None)
        cs = getattr(control, "cond_start", 0)
        if edit_pair is not None and q.shape[0] > 2:
            # The pair slice must be in-bounds: JAX clamps out-of-range
            # slices, which would silently compute edit_pair(base, base).
            assert cs + 2 <= q.shape[0], (
                f"cond_start={cs} needs batch >= {cs + 2}, got {q.shape[0]}"
            )
            # Row-split: P2P reads row cs and writes row cs+1 only, so
            # probabilities are materialized for that pair alone; every other
            # row rides the fused path.  Halves (batch-4) the prob-path
            # QK/softmax work and cuts its PV to one row.
            probs2 = attention_probs(
                split_heads(q[cs:cs + 2], heads),
                split_heads(k[cs:cs + 2], heads))  # [2, H, Q, K]
            new_repl, store = edit_pair(probs2[0], probs2[1], layer)
            vh_edit = split_heads(v[cs + 1:cs + 2], heads)[0]
            out_edit = merge_heads(jnp.einsum(
                "hqk,hkd->hqd", new_repl.astype(v.dtype), vh_edit)[None])
            b = q.shape[0]

            def drop_edit_row(x):
                if cs + 2 >= b:
                    return x[:cs + 1]
                return jnp.concatenate([x[:cs + 1], x[cs + 2:]], axis=0)

            out_rest = fused(
                drop_edit_row(q), drop_edit_row(k), drop_edit_row(v))
            parts = [out_rest[:cs + 1], out_edit]
            if cs + 2 < b:
                parts.append(out_rest[cs + 1:])
            return jnp.concatenate(parts, axis=0).astype(q.dtype), store
        qh, kh, vh = (split_heads(t, heads) for t in (q, k, v))
        probs = attention_probs(qh, kh)  # [B, H, Sq, Sk] f32
        probs, store = control.edit_probs(probs, layer)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(vh.dtype), vh
        )
        return merge_heads(out).astype(q.dtype), store

    return fused(q, k, v).astype(q.dtype), {}
