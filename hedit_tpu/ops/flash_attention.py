"""Pallas TPU flash attention for the control-free UNet attention paths.

The reference materializes full [heads, Q, K] probability tensors on every
attention call so controllers can mutate them (``p2p/ptp_utils.py:84-106``).
On TPU that costs HBM bandwidth: the 64x64-latent self-attention is
[B, 8, 4096, 4096] per call.  This kernel streams K/V blocks through VMEM with
an online softmax, so probabilities never touch HBM.  It is used whenever the
active control object does not need probabilities for a layer
(``hedit_tpu/ops/attention.py``); P2P-edited layers fall back to the
probability path by design.

Everything runs in the TRANSPOSED form, chosen from MXU cost probes on v5e
(scripts/mm_probe.py + scripts/flash_variants.py):
- The MXU charges contractions <= 128 at the full 128 depth, so the SD head
  dims (40/80/160) need NO zero-padding — scores come from the
  rhs/lhs-transposed dot forms on natural [S, D] blocks at identical cost.
- Scores are built transposed, sT [blk_k, blk_q] = k_blk x q (keys on
  sublanes), softmax reduces over sublanes, and p.v uses the lhs-transposed
  form dot(v[blk_k, D], pT[blk_k, blk_q]) -> [D, blk_q]: the accumulator
  never touches 128-padded output lanes.  Measured 1.41 ms vs 2.20 ms for
  the padded v1 kernel on the res-64 self-attention ([4,8,4096,40], bf16).
- The kernel emits outT [B*H, D, Sq]; one cheap XLA transpose restores
  [B, H, Sq, D].  Dropping the d-padding also removes the HBM pad/slice
  copies v1 paid outside the kernel.

v3 rations the VPU work that was serializing with the MXU (measured at
[4,32,4096,40] bf16, the controlled-call hot shape): matmuls in the input
dtype instead of fp32 (6.48 -> 5.89 ms), sm_scale folded into q and
key-masking emitted only for unaligned Sk (-> 5.60), the softmax
denominator riding the PV matmul as a ones-column of v and p cast to the
matmul dtype at the exp (-> 5.39), blocks 2048x512 (-> 5.28), base-2
softmax (-> 5.15).

v4 "bounded" (current production path, ``flash_attention_bounded``) drops
the running max entirely — see ``_flash_bounded_kernel`` — landing at
4.38 ms.  The ablation (scripts/flash_ablate.py) shows the bare
dot->cast->dot loop costs 4.34 ms at this shape, i.e. the earlier ~3.7 ms
"charged-FLOP roof" estimate was optimistic: the per-block f32->bf16 cast
of the [blk_k, blk_q] probability tile and the fori_loop overhead are
part of the floor, and exp2/shift are fully MXU-overlapped (free).
Larger k-blocks (1024/2048) exceed the 16M scoped-VMEM limit with the
block-0 prologue resident; 2048x512 is the optimum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # softmax in base 2: exp(x) == exp2(x*log2(e));
# folding log2(e) into the q scale turns every exp into a raw exp2 and drops
# one VPU multiply pass over the [blk_k, blk_q] score tile (measured
# 5.28 -> 5.15 ms at [4,32,4096,40], scripts/flash_v4_variants.py)


def _flash_kernel(q_ref, k_ref, v_ref, ot_ref, *, sm_scale: float, sk: int,
                  blk_k: int):
    """One (batch*head, q-block) program: online softmax over all K blocks.

    q_ref [blk_q, D]; k_ref/v_ref [Sk_pad, D]; ot_ref [D, blk_q].
    Running max/denominator live as [1, blk_q] rows; the accumulator as
    [D, blk_q] — no 128-lane padding anywhere.

    MXU passes run in the INPUT dtype (bf16 in the UNet path) with float32
    accumulation; softmax math (max, exp, rescale) stays float32.  The
    kernel is VPU-bound at the hot shapes (the MXU work is ~3.7 ms of a
    6.3 ms call at [4,32,4096,40]), so elementwise passes over the
    [blk_k, blk_q] score tile are rationed: sm_scale is folded into q
    (a [blk_q, D] tile, 25x fewer elements), and key-padding masks are
    emitted only when Sk is not block-aligned (never, for the self-attn
    shapes routed here — cross-attention takes the XLA path).
    """
    q = q_ref[...] * jnp.asarray(sm_scale * LOG2E, q_ref.dtype)  # [blk_q, D]
    blk_q, d = q.shape
    num_k_blocks = k_ref.shape[0] // blk_k
    mm_dtype = q.dtype
    need_mask = k_ref.shape[0] != sk  # static: padded keys present?

    def body(ki, carry):
        acc_t, m_i = carry  # [D+1, blk_q] (row D = sum p), [1, blk_q]
        k_blk = k_ref[pl.ds(ki * blk_k, blk_k), :]
        v_blk = v_ref[pl.ds(ki * blk_k, blk_k), :]
        s_t = jax.lax.dot_general(
            k_blk, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [blk_k, blk_q] — keys on sublanes
        if need_mask:
            # mask padded keys (static sk); key index is the sublane dim
            row = (jax.lax.broadcasted_iota(jnp.int32, (blk_k, blk_q), 0)
                   + ki * blk_k)
            s_t = jnp.where(row < sk, s_t, NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s_t, axis=0, keepdims=True))
        # p in the matmul dtype; its row-sum rides the PV matmul as a
        # ones-column of v (acc row D), skipping a [blk_k, blk_q] VPU reduce.
        # Scores are in base-2 (log2e folded into q), so exp2 suffices.
        p_t = jnp.exp2(s_t - m_new).astype(mm_dtype)
        alpha = jnp.exp2(m_i - m_new)
        v_aug = jnp.concatenate(
            [v_blk, jnp.ones((blk_k, 1), v_blk.dtype)], axis=1)
        pv_t = jax.lax.dot_general(
            v_aug, p_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [D+1, blk_q]; row D is sum(p)
        return acc_t * alpha + pv_t, m_new

    acc0 = jnp.zeros((d + 1, blk_q), jnp.float32)
    m0 = jnp.full((1, blk_q), NEG_INF, jnp.float32)
    acc_t, m_i = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0))
    ot_ref[...] = (acc_t[:d] / acc_t[d:]).astype(ot_ref.dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# Both kernels keep K and V fully VMEM-resident per program (their index maps
# are constant in the q-block coordinate, so Mosaic streams them once, no
# double-buffering).  That residency is structural: 2 * Sk * D * itemsize
# bytes off the 16M scoped budget before any score tile exists.  Shapes whose
# residency exceeds half the budget can't leave room for the working tiles at
# any block size — the caller must take the XLA path.  (Seen: bf16 d=512
# S=4096 VAE mid-block = 8.4M resident compiles with 1024x1024 blocks; the
# f32 version would be 16.8M resident — unfittable.)
FLASH_KV_BUDGET_BYTES = 8 * 1024 * 1024


def flash_kv_fits(sk: int, d: int, itemsize: int) -> bool:
    """Whether a [*, Sk, D] K/V pair of this dtype fits the kernels' VMEM
    residency budget.  Routing predicate for ``fused_attention``.

    The kernels pad Sk up to a blk_k multiple, so residency is charged on
    the worst-case padded length (blk_k <= 1024) — an unaligned sk just
    under the budget cannot sneak past the check and OOM after padding."""
    sk_padded = -(-sk // 1024) * 1024
    return 2 * sk_padded * d * itemsize <= FLASH_KV_BUDGET_BYTES


_DEFAULT_BLK_K = 512


def _shrink_blocks(d: int, itemsize: int, blk_q: int, blk_k: int):
    """Block sizes that fit the 16M scoped-VMEM limit for this (d, dtype).

    The defaults (2048x512) are tuned for the bf16 SD head dims.  The score
    and probability tiles cost blk_k * blk_q * (4 + itemsize) bytes each
    live pair, so f32 inputs need half the q-block (measured: f32 d=40
    S=4096 at 2048x512 = 18.41M scoped > 16M; 1024x512 fits).  Large head
    dims additionally grow the K/V residency and the [D+1, blk_q] f32
    accumulator — the proven fallback there is 1024x1024 (bf16), halved
    again for f32.  The d>128 k-block widening is an efficiency RAISE and
    applies only to the untouched default: explicitly-passed small blocks
    (interpret-mode oracles, tests) are never enlarged, only capped.
    """
    if d > 128:
        blk_q = min(blk_q, 1024)
        blk_k = 1024 if blk_k == _DEFAULT_BLK_K else min(blk_k, 1024)
    if itemsize >= 4:
        blk_q = min(blk_q, 1024 if d <= 128 else 512)
    return blk_q, blk_k


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "interpret"))
def flash_attention(q, k, v, *, blk_q: int = 2048, blk_k: int = 512,
                    interpret: bool = False):
    """Softmax attention computing ``softmax(q k^T / sqrt(D)) v``.

    Accumulation (softmax statistics, output accumulator) is float32, but the
    QK^T and PV matmuls run in the INPUT dtype with the scale folded into q
    (the v3 VPU-rationing design) — bf16 inputs therefore drift from a pure
    f32 oracle by bf16 rounding of q·scale and of the probability matmuls
    (~1e-2 relative; see test_flash_attention_bf16_tolerance).  f32 inputs
    match the oracle to f32 tolerance.

    q: [B, H, Sq, D]; k, v: [B, H, Sk, D].  Returns [B, H, Sq, D] in q.dtype.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sm_scale = 1.0 / (d**0.5)
    blk_q, blk_k = _shrink_blocks(d, q.dtype.itemsize, blk_q, blk_k)
    blk_q = min(blk_q, max(128, sq))
    blk_k = min(blk_k, max(128, sk))

    qp = _pad_to(q, 2, blk_q)
    kp = _pad_to(k, 2, blk_k)
    vp = _pad_to(v, 2, blk_k)
    sqp, skp = qp.shape[2], kp.shape[2]

    qf = qp.reshape(b * h, sqp, d)
    kf = kp.reshape(b * h, skp, d)
    vf = vp.reshape(b * h, skp, d)

    grid = (b * h, sqp // blk_q)
    out_t = pl.pallas_call(
        functools.partial(_flash_kernel, sm_scale=sm_scale, sk=sk, blk_k=blk_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, blk_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((None, skp, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, skp, d), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, d, blk_q), lambda bh, i: (bh, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, sqp), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)

    out = jnp.swapaxes(out_t.reshape(b, h, d, sqp), 2, 3)
    return out[:, :, :sq, :] if sqp != sq else out


def _flash_bounded_kernel(q_ref, k_ref, v_ref, ot_ref, *, sm_scale: float,
                          sk: int, blk_k: int):
    """Max-free online softmax ("bounded" v4 candidate).

    The v3 kernel's gap to the charged-FLOP roof is VPU softmax work
    serializing with the MXU: per k-block it max-reduces the [blk_k, blk_q]
    score tile AND rescales the [D+1, blk_q] accumulator, and the running-max
    carry makes every iteration depend on the previous one's VPU output.

    This variant replaces the running max with a PRECOMPUTED safe shift per
    query column, so the loop body is dot -> exp2 -> dot with NO max reduce,
    NO rescale, and no cross-iteration VPU dependency (acc is a pure sum) —
    Mosaic can overlap block i+1's QK matmul with block i's exp2.

    The shift (in base-2 log units, i.e. already scaled by sm_scale*log2e
    like the scores) anchors on a SAMPLE of the row: block 0's scores are
    computed once in the prologue (and their PV contribution reused — no
    recompute), their per-query max m0 is the anchor, and the in-loop
    exponent is saturated:

        shift_j = m0_j + 16
        p       = exp2(min(s - shift, 100))

    Measured on v5e at [4,32,4096,40] bf16 (scripts/flash_ablate.py): the
    dot->cast->dot loop floor is 4.34 ms and exp2/shift are FREE (fully
    overlapped with the MXU), so the only affordable prologue is this one
    [blk_k, blk_q] max — the earlier variance-margin prologue (k cast +
    [D,D] second moment) cost ~0.7 ms and is gone.

    Guarantees:
    * NO OVERFLOW / NaN, unconditionally: p <= 2^100, denominator
      <= Sk * 2^100 < 2^113, finite for ANY input.
    * NO all-underflow, unconditionally: m0 <= s_max gives
      shift - s_max <= 16, so p_max >= 2^-16; the denominator floor is a
      belt-and-braces NaN guard that cannot engage.
    * The saturation DISTORTS only keys scoring more than 116 log2-units
      above block 0's per-query maximum — i.e. only when the first blk_k
      keys are unrepresentative of the row by 116/std sigmas (SD score
      rows measure std ~ 1-6 log2 units).  Below that the result is exact
      (softmax shift invariance) up to f32 underflow of terms more than
      ~110 log2-units below the max — invisible next to the f32 sum's
      2^-24 mantissa.
    """
    q = q_ref[...] * jnp.asarray(sm_scale * LOG2E, q_ref.dtype)  # [blk_q, D]
    blk_q, d = q.shape
    num_k_blocks = k_ref.shape[0] // blk_k
    mm_dtype = q.dtype
    need_mask = k_ref.shape[0] != sk

    def scores(ki):
        k_blk = k_ref[pl.ds(ki * blk_k, blk_k), :]
        s_t = jax.lax.dot_general(
            k_blk, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [blk_k, blk_q]
        if need_mask:
            row = (jax.lax.broadcasted_iota(jnp.int32, (blk_k, blk_q), 0)
                   + ki * blk_k)
            s_t = jnp.where(row < sk, s_t, NEG_INF)
        return s_t

    def pv(ki, p_t):
        v_blk = v_ref[pl.ds(ki * blk_k, blk_k), :]
        v_aug = jnp.concatenate(
            [v_blk, jnp.ones((blk_k, 1), v_blk.dtype)], axis=1)
        return jax.lax.dot_general(
            v_aug, p_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [D+1, blk_q]

    # prologue: block 0 anchors the shift and already contributes to acc
    s0 = scores(0)
    shift = jnp.max(s0, axis=0, keepdims=True) + 16.0          # [1, blk_q]
    acc0 = pv(0, jnp.exp2(s0 - shift).astype(mm_dtype))

    def body(ki, acc_t):
        p_t = jnp.exp2(jnp.minimum(scores(ki) - shift, 100.0)).astype(mm_dtype)
        return acc_t + pv(ki, p_t)

    acc_t = jax.lax.fori_loop(1, num_k_blocks, body, acc0)
    denom = jnp.maximum(acc_t[d:], 1.2e-38)  # NaN guard; see docstring
    ot_ref[...] = (acc_t[:d] / denom).astype(ot_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "interpret"))
def flash_attention_bounded(q, k, v, *, blk_q: int = 2048, blk_k: int = 512,
                            interpret: bool = False):
    """Max-free flash attention (see ``_flash_bounded_kernel``).  Same
    contract as :func:`flash_attention`."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sm_scale = 1.0 / (d**0.5)
    blk_q, blk_k = _shrink_blocks(d, q.dtype.itemsize, blk_q, blk_k)
    blk_q = min(blk_q, max(128, sq))
    blk_k = min(blk_k, max(128, sk))
    qp = _pad_to(q, 2, blk_q)
    kp = _pad_to(k, 2, blk_k)
    vp = _pad_to(v, 2, blk_k)
    sqp, skp = qp.shape[2], kp.shape[2]
    qf = qp.reshape(b * h, sqp, d)
    kf = kp.reshape(b * h, skp, d)
    vf = vp.reshape(b * h, skp, d)
    grid = (b * h, sqp // blk_q)
    out_t = pl.pallas_call(
        functools.partial(_flash_bounded_kernel, sm_scale=sm_scale, sk=sk,
                          blk_k=blk_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, blk_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((None, skp, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, skp, d), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, d, blk_q), lambda bh, i: (bh, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, sqp), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    out = jnp.swapaxes(out_t.reshape(b, h, d, sqp), 2, 3)
    return out[:, :, :sq, :] if sqp != sq else out


def _flash_packed_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                         heads: int, sk: int, blk_k: int):
    """One (batch, q-block) program over PACKED heads.

    q_ref/o_ref [blk_q, H*D]; k_ref/v_ref [Sk_pad, H*D].  Heads are sliced
    from the packed lane dimension in-kernel (static, possibly unaligned
    offsets — Mosaic shifts in VMEM), so the XLA graph never materializes
    [B, H, S, D] head-split copies and the custom-call boundary keeps the
    conv-native [B, S, C] layout on both sides.
    """
    hd = q_ref.shape[-1]
    d = hd // heads
    blk_q = q_ref.shape[0]
    num_k_blocks = k_ref.shape[0] // blk_k
    need_mask = k_ref.shape[0] != sk

    for h in range(heads):
        q = q_ref[:, h * d:(h + 1) * d] * jnp.asarray(sm_scale * LOG2E, q_ref.dtype)
        mm_dtype = q.dtype

        def body(ki, carry, _q=q, _h=h):
            acc_t, m_i = carry  # [D+1, blk_q] (row D = sum p), [1, blk_q]
            k_blk = k_ref[pl.ds(ki * blk_k, blk_k), _h * d:(_h + 1) * d]
            v_blk = v_ref[pl.ds(ki * blk_k, blk_k), _h * d:(_h + 1) * d]
            s_t = jax.lax.dot_general(
                k_blk, _q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [blk_k, blk_q]
            if need_mask:
                row = (jax.lax.broadcasted_iota(jnp.int32, (blk_k, blk_q), 0)
                       + ki * blk_k)
                s_t = jnp.where(row < sk, s_t, NEG_INF)
            m_new = jnp.maximum(m_i, jnp.max(s_t, axis=0, keepdims=True))
            p_t = jnp.exp2(s_t - m_new).astype(mm_dtype)
            alpha = jnp.exp2(m_i - m_new)
            v_aug = jnp.concatenate(
                [v_blk, jnp.ones((blk_k, 1), v_blk.dtype)], axis=1)
            pv_t = jax.lax.dot_general(
                v_aug, p_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [D+1, blk_q]
            return acc_t * alpha + pv_t, m_new

        acc0 = jnp.zeros((d + 1, blk_q), jnp.float32)
        m0 = jnp.full((1, blk_q), NEG_INF, jnp.float32)
        acc_t, _ = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0))
        o_ref[:, h * d:(h + 1) * d] = (
            acc_t[:d] / acc_t[d:]).T.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "blk_q", "blk_k",
                                             "interpret"))
def flash_attention_packed(q, k, v, *, heads: int, blk_q: int = 1024,
                           blk_k: int = 512, interpret: bool = False):
    """Flash attention on packed-head layouts.

    q: [B, Sq, H*D]; k, v: [B, Sk, H*D] — the projection outputs as-is.
    Returns [B, Sq, H*D] in q.dtype.  Numerics identical to
    ``flash_attention`` on the head-split views.
    """
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // heads
    sm_scale = 1.0 / (d**0.5)

    # Same guards as the head-split kernels: the packed program keeps the
    # full [Sk, H*D] K/V pair VMEM-resident, and the score tiles obey the
    # same (d, dtype) budget rules.
    if not flash_kv_fits(sk, hd, q.dtype.itemsize):
        raise ValueError(
            f"flash_attention_packed: K/V residency 2*{sk}*{hd}*"
            f"{q.dtype.itemsize}B exceeds the scoped-VMEM budget; use the "
            f"head-split flash_attention or the XLA path"
        )
    blk_q, blk_k = _shrink_blocks(d, q.dtype.itemsize, blk_q, blk_k)
    blk_q = min(blk_q, max(128, sq))
    blk_k = min(blk_k, max(128, sk))
    qp = _pad_to(q, 1, blk_q)
    kp = _pad_to(k, 1, blk_k)
    vp = _pad_to(v, 1, blk_k)
    sqp, skp = qp.shape[1], kp.shape[1]

    grid = (b, sqp // blk_q)
    out = pl.pallas_call(
        functools.partial(_flash_packed_kernel, sm_scale=sm_scale,
                          heads=heads, sk=sk, blk_k=blk_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, blk_q, hd), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((None, skp, hd), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((None, skp, hd), lambda bi, i: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, blk_q, hd), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sqp, hd), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq, :] if sqp != sq else out


def reference_attention(q, k, v):
    """XLA einsum-softmax-einsum attention (fp32 softmax), used for small
    sequence lengths and as the oracle in tests."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s / (d**0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(q.dtype)


# ------------------------------------------------------------ differentiable #
# The flash kernels are forward-only Pallas programs; reverse-mode AD through
# them fails ("Linearization failed").  Several editing modes differentiate
# THROUGH the UNet — NMG's per-step L1 guidance
# (``text-guided/inversion/p2p_baselines.py:255-264``), null-text's per-step
# Adam on the uncond embedding (:195-215), and the EF style gradient at x_t
# (``text-guided-n-style/inversion/ef.py:93-124``) — so the routed kernel
# must carry a VJP.  This wrapper keeps the Pallas kernel on the forward pass
# and recomputes the backward through the XLA reference attention (exact
# softmax gradient; the bf16-vs-f32 forward rounding difference between the
# two paths is below the editing tolerances, pinned by
# test_flash_diff_grads_match_oracle).  A fused Pallas backward is the
# planned upgrade; this makes the differentiated modes CORRECT on TPU first.


def _flash_bounded_lse_kernel(q_ref, k_ref, v_ref, ot_ref, lse_ref, *,
                              sm_scale: float, sk: int, blk_k: int):
    """``_flash_bounded_kernel`` + a second output: the per-query base-2
    log-sum-exp (shift + log2(denom)), which the backward kernels use to
    rebuild probabilities exactly (p = exp2(s2 - lse2))."""
    q = q_ref[...] * jnp.asarray(sm_scale * LOG2E, q_ref.dtype)
    blk_q, d = q.shape
    num_k_blocks = k_ref.shape[0] // blk_k
    mm_dtype = q.dtype
    need_mask = k_ref.shape[0] != sk

    def scores(ki):
        k_blk = k_ref[pl.ds(ki * blk_k, blk_k), :]
        s_t = jax.lax.dot_general(
            k_blk, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if need_mask:
            row = (jax.lax.broadcasted_iota(jnp.int32, (blk_k, blk_q), 0)
                   + ki * blk_k)
            s_t = jnp.where(row < sk, s_t, NEG_INF)
        return s_t

    def pv(ki, p_t):
        v_blk = v_ref[pl.ds(ki * blk_k, blk_k), :]
        v_aug = jnp.concatenate(
            [v_blk, jnp.ones((blk_k, 1), v_blk.dtype)], axis=1)
        return jax.lax.dot_general(
            v_aug, p_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    s0 = scores(0)
    shift = jnp.max(s0, axis=0, keepdims=True) + 16.0
    acc0 = pv(0, jnp.exp2(s0 - shift).astype(mm_dtype))

    def body(ki, acc_t):
        p_t = jnp.exp2(jnp.minimum(scores(ki) - shift, 100.0)).astype(mm_dtype)
        return acc_t + pv(ki, p_t)

    acc_t = jax.lax.fori_loop(1, num_k_blocks, body, acc0)
    denom = jnp.maximum(acc_t[d:], 1.2e-38)
    ot_ref[...] = (acc_t[:d] / denom).astype(ot_ref.dtype)
    lse_ref[...] = shift + jnp.log2(denom)


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "interpret"))
def _flash_bounded_fwd_lse(q, k, v, *, blk_q: int = 2048, blk_k: int = 512,
                           interpret: bool = False):
    """Forward-for-VJP: ``flash_attention_bounded`` numerics + the base-2
    LSE rows.  Returns (out [B,H,Sq,D], lse2 [B*H, 1, Sq] float32)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sm_scale = 1.0 / (d**0.5)
    blk_q, blk_k = _shrink_blocks(d, q.dtype.itemsize, blk_q, blk_k)
    blk_q = min(blk_q, max(128, sq))
    blk_k = min(blk_k, max(128, sk))
    qp = _pad_to(q, 2, blk_q)
    kp = _pad_to(k, 2, blk_k)
    vp = _pad_to(v, 2, blk_k)
    sqp, skp = qp.shape[2], kp.shape[2]
    qf = qp.reshape(b * h, sqp, d)
    kf = kp.reshape(b * h, skp, d)
    vf = vp.reshape(b * h, skp, d)
    grid = (b * h, sqp // blk_q)
    out_t, lse = pl.pallas_call(
        functools.partial(_flash_bounded_lse_kernel, sm_scale=sm_scale,
                          sk=sk, blk_k=blk_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, blk_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((None, skp, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, skp, d), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, d, blk_q), lambda bh, i: (bh, 0, i)),
            pl.BlockSpec((None, 1, blk_q), lambda bh, i: (bh, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, d, sqp), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, sqp), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    out = jnp.swapaxes(out_t.reshape(b, h, d, sqp), 2, 3)
    out = out[:, :, :sq, :] if sqp != sq else out
    return out, lse[:, :, :sq]


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, sm_scale: float, sk: int, blk_k: int):
    """One (bh, q-block) program: dq = (p * (dO V^T - delta)) @ K * scale.

    K and V stay VMEM-resident (same residency pattern as the forward);
    p is rebuilt from the saved LSE, so the loop body is three matmuls
    (scores, dp, accumulation) with no softmax reductions."""
    qs = q_ref[...] * jnp.asarray(sm_scale * LOG2E, q_ref.dtype)
    do = do_ref[...]
    lse = lse_ref[...]          # [1, blk_q] f32
    delta = delta_ref[...]      # [1, blk_q] f32
    blk_q, d = qs.shape
    num_k_blocks = k_ref.shape[0] // blk_k
    mm_dtype = qs.dtype
    need_mask = k_ref.shape[0] != sk

    def body(ki, acc):
        k_blk = k_ref[pl.ds(ki * blk_k, blk_k), :]
        v_blk = v_ref[pl.ds(ki * blk_k, blk_k), :]
        s_t = jax.lax.dot_general(
            k_blk, qs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_k, blk_q]
        if need_mask:
            row = (jax.lax.broadcasted_iota(jnp.int32, (blk_k, blk_q), 0)
                   + ki * blk_k)
            s_t = jnp.where(row < sk, s_t, NEG_INF)
        p_t = jnp.exp2(s_t - lse)                        # exact softmax rows
        dp_t = jax.lax.dot_general(
            v_blk, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_k, blk_q]
        ds_t = (p_t * (dp_t - delta)).astype(mm_dtype)
        return acc + jax.lax.dot_general(
            ds_t, k_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_q, D]

    acc = jax.lax.fori_loop(0, num_k_blocks, body,
                            jnp.zeros((blk_q, d), jnp.float32))
    dq_ref[...] = (acc * sm_scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, sm_scale: float, sq: int,
                          blk_q: int):
    """One (bh, k-block) program: dv = p^T dO; dk = (p*(dp-delta)) @ Q*scale.

    Q and dO stay VMEM-resident (the k-block analog of the forward's K/V
    residency); the scale folds into the k-block so Q stays raw for the dk
    accumulation."""
    ks = k_ref[...] * jnp.asarray(sm_scale * LOG2E, k_ref.dtype)
    v_blk = v_ref[...]
    blk_k, d = ks.shape
    num_q_blocks = q_ref.shape[0] // blk_q
    mm_dtype = ks.dtype
    need_mask = q_ref.shape[0] != sq

    def body(qi, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[pl.ds(qi * blk_q, blk_q), :]       # raw
        do_blk = do_ref[pl.ds(qi * blk_q, blk_q), :]
        lse = lse_ref[:, pl.ds(qi * blk_q, blk_q)]       # [1, blk_q]
        delta = delta_ref[:, pl.ds(qi * blk_q, blk_q)]
        s_t = jax.lax.dot_general(
            ks, q_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_k, blk_q]
        if need_mask:
            col = (jax.lax.broadcasted_iota(jnp.int32, (blk_k, blk_q), 1)
                   + qi * blk_q)
            s_t = jnp.where(col < sq, s_t, NEG_INF)      # padded queries: p=0
        p_t = jnp.exp2(s_t - lse)
        p_mm = p_t.astype(mm_dtype)
        dv_acc = dv_acc + jax.lax.dot_general(
            p_mm, do_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_k, D]
        dp_t = jax.lax.dot_general(
            v_blk, do_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_k, blk_q]
        ds_t = (p_t * (dp_t - delta)).astype(mm_dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds_t, q_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_k, D]
        return dk_acc, dv_acc

    zero = jnp.zeros((blk_k, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_q_blocks, body, (zero, zero))
    dk_ref[...] = (dk_acc * sm_scale).astype(dk_ref.dtype)
    dv_ref[...] = dv_acc.astype(dv_ref.dtype)


# Backward tile sizing: the bwd loop keeps THREE f32 [blk_k, blk_q] tiles
# live (scores, p, dp) vs the forward's two, so the q-block halves.
_BWD_BLK_Q = 512
_BWD_BLK_K = 512


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_bwd_pallas(q, k, v, out, lse, do, *, interpret: bool = False):
    """Pallas flash backward: (dq, dk, dv) from the saved forward LSE."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sm_scale = 1.0 / (d**0.5)
    blk_q = min(_BWD_BLK_Q if d <= 128 else 256, max(128, sq))
    blk_k = min(_BWD_BLK_K if d <= 128 else 256, max(128, sk))

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).reshape(b * h, 1, sq)
    qp = _pad_to(q, 2, blk_q)
    dop = _pad_to(do, 2, blk_q)
    kp = _pad_to(k, 2, blk_k)
    vp = _pad_to(v, 2, blk_k)
    sqp, skp = qp.shape[2], kp.shape[2]
    qf = qp.reshape(b * h, sqp, d)
    dof = dop.reshape(b * h, sqp, d)
    kf = kp.reshape(b * h, skp, d)
    vf = vp.reshape(b * h, skp, d)
    lsep = _pad_to(lse, 2, blk_q)
    deltap = _pad_to(delta, 2, blk_q)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, sm_scale=sm_scale, sk=sk,
                          blk_k=blk_k),
        grid=(b * h, sqp // blk_q),
        in_specs=[
            pl.BlockSpec((None, blk_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((None, skp, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, skp, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, blk_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((None, 1, blk_q), lambda bh, i: (bh, 0, i)),
            pl.BlockSpec((None, 1, blk_q), lambda bh, i: (bh, 0, i)),
        ],
        out_specs=pl.BlockSpec((None, blk_q, d), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sqp, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, dof, lsep, deltap)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, sm_scale=sm_scale, sq=sq,
                          blk_q=blk_q),
        grid=(b * h, skp // blk_k),
        in_specs=[
            pl.BlockSpec((None, sqp, d), lambda bh, j: (bh, 0, 0)),
            pl.BlockSpec((None, blk_k, d), lambda bh, j: (bh, j, 0)),
            pl.BlockSpec((None, blk_k, d), lambda bh, j: (bh, j, 0)),
            pl.BlockSpec((None, sqp, d), lambda bh, j: (bh, 0, 0)),
            pl.BlockSpec((None, 1, sqp), lambda bh, j: (bh, 0, 0)),
            pl.BlockSpec((None, 1, sqp), lambda bh, j: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, blk_k, d), lambda bh, j: (bh, j, 0)),
            pl.BlockSpec((None, blk_k, d), lambda bh, j: (bh, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, skp, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, skp, d), v.dtype),
        ],
        interpret=interpret,
    )(qf, kf, vf, dof, lsep, deltap)

    dq = dq.reshape(b, h, sqp, d)[:, :, :sq, :]
    dk = dk.reshape(b, h, skp, d)[:, :, :sk, :]
    dv = dv.reshape(b, h, skp, d)[:, :, :sk, :]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_diff(q, k, v, interpret=False):
    """``flash_attention_bounded`` with a defined VJP.

    Forward: the bounded Pallas kernel.  Backward: fused Pallas dq and
    dk/dv kernels rebuilding probabilities from the saved LSE (exact
    softmax gradient; the forward's 116-sigma saturation clamp is ignored,
    like every flash backward).  Through-UNet gradient modes ride this on
    TPU: NMG (``p2p_baselines.py:255-264``), null-text (:195-215), EF style
    (``text-guided-n-style/inversion/ef.py:93-124``).  Falls back to an
    XLA-recompute backward when Q/dO residency exceeds the kernels' scoped
    VMEM budget.  Same contract: q/k/v [B, H, S, D] -> [B, H, Sq, D]."""
    return flash_attention_bounded(q, k, v, interpret=interpret)


def _flash_diff_fwd(q, k, v, interpret):
    out, lse = _flash_bounded_fwd_lse(q, k, v, interpret=interpret)
    return out, (q, k, v, out, lse)


# Pallas-backward routing threshold (device-plane, [2,8,S,D] on v5e,
# scripts/flash_bwd_profile.py): at S=4096 the fused backward wins big
# (bf16 3.63 vs 9.80 ms XLA, f32 3.88 vs 13.45); at S=1024 XLA's fused
# recompute wins in bf16 (0.13 vs 0.28) and ties in f32 — the kernels'
# grid/copy overheads dominate at two k-blocks.
_BWD_MIN_SEQ = 2048


def _flash_diff_bwd(interpret, res, do):
    q, k, v, out, lse = res
    # dkv keeps Q and dO resident; dq keeps K and V resident.  Both must
    # fit the same scoped-VMEM residency budget as the forward.
    fits = (flash_kv_fits(q.shape[2], q.shape[3], q.dtype.itemsize)
            and flash_kv_fits(k.shape[2], k.shape[3], k.dtype.itemsize))
    big = min(q.shape[2], k.shape[2]) >= _BWD_MIN_SEQ
    if fits and (big or interpret):  # interpret: CPU tests drive the kernels
        return _flash_bwd_pallas(q, k, v, out, lse, do, interpret=interpret)
    _, vjp = jax.vjp(reference_attention, q, k, v)
    return vjp(do)


flash_attention_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)
