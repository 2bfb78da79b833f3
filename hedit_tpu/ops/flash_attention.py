"""Pallas TPU flash attention for the control-free UNet attention paths.

The reference materializes full [heads, Q, K] probability tensors on every
attention call so controllers can mutate them (``p2p/ptp_utils.py:84-106``).
On TPU that costs HBM bandwidth: the 64x64-latent self-attention is
[B, 8, 4096, 4096] per call.  This kernel streams K/V blocks through VMEM with
an online softmax, so probabilities never touch HBM.  It is used whenever the
active control object does not need probabilities for a layer
(``hedit_tpu/ops/attention.py``); P2P-edited layers fall back to the
probability path by design.

Layout: q [B, H, Sq, D], k/v [B, H, Sk, D].  Heads are folded into the grid.
D is zero-padded to a lane multiple (128) outside the kernel — zeros change
neither q.k^T nor p.v.  Sk is padded to a block multiple with an additive -inf
mask derived in-kernel from the true length (static).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float, sk: int, blk_k: int):
    """One (batch*head, q-block) program: online softmax over all K blocks."""
    q = q_ref[...].astype(jnp.float32) * sm_scale  # [blk_q, D]
    blk_q, d = q.shape
    num_k_blocks = k_ref.shape[0] // blk_k

    def body(ki, carry):
        acc, m_i, l_i = carry
        k_blk = k_ref[pl.ds(ki * blk_k, blk_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(ki * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [blk_q, blk_k]
        # mask padded keys (static sk)
        col = jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1) + ki * blk_k
        s = jnp.where(col < sk, s, NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((blk_q, d), jnp.float32)
    m0 = jnp.full((blk_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0, l0))
    o_ref[...] = (acc / l_i).astype(o_ref.dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "interpret"))
def flash_attention(q, k, v, *, blk_q: int = 512, blk_k: int = 512, interpret: bool = False):
    """Softmax attention, numerically matching
    ``softmax(q k^T / sqrt(D)) v`` in float32.

    q: [B, H, Sq, D]; k, v: [B, H, Sk, D].  Returns [B, H, Sq, D] in q.dtype.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sm_scale = 1.0 / (d**0.5)

    blk_q = min(blk_q, max(128, sq))
    blk_k = min(blk_k, max(128, sk))

    qp = _pad_to(_pad_to(q, 3, 128), 2, blk_q)
    kp = _pad_to(_pad_to(k, 3, 128), 2, blk_k)
    vp = _pad_to(_pad_to(v, 3, 128), 2, blk_k)
    dp = qp.shape[3]
    sqp, skp = qp.shape[2], kp.shape[2]

    qf = qp.reshape(b * h, sqp, dp)
    kf = kp.reshape(b * h, skp, dp)
    vf = vp.reshape(b * h, skp, dp)

    grid = (b * h, sqp // blk_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, sm_scale=sm_scale, sk=sk, blk_k=blk_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, blk_q, dp), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((None, skp, dp), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, skp, dp), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, blk_q, dp), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sqp, dp), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)

    return out.reshape(b, h, sqp, dp)[:, :, :sq, :d]


def reference_attention(q, k, v):
    """XLA einsum-softmax-einsum attention (fp32 softmax), used for small
    sequence lengths and as the oracle in tests."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s / (d**0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(q.dtype)
