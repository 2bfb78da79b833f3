"""Kill the head-split/merge relayout copies around the flash kernel.

The full-edit device profile (bench.py HEDIT_BENCH_PROFILE) shows plain
`copy` ops at 672 ms of 7.8 s (8.6%), dominated by [B,rows,H,4096,40]
relayouts XLA materializes around the flash custom call: split_heads
(reshape+transpose) on the way in, and the kernel's transposed
[B*H, D, Sq] output being restored to [B, Sq, H*D] on the way out.
These copies run at ~30 GB/s (10 MB in 0.34 ms) because the 40-element
minor runs defeat the DMA: worth ~0.6 s of the 7.8 s edit.

A true NHD kernel (q/k/v as [B, S, H, D], grid over heads) is NOT
lowerable: blocking the second-minor H dim at 1 violates Mosaic's
(%8, %128)-or-full block rule, and full-H blocks lane-pad D=40 to 128 in
VMEM (3.2x), blowing the 16M scoped budget for full-S k/v refs.

Lowerable variants measured here, each as the FULL chain
    x [B, S, C] -> q/k/v projections -> attention -> out projection -> y
at the controlled-call hot shape B=16 (4 images x 4 rows), S=4096, H=8,
D=40, C=320, bf16 (device-plane totals, 5 calls):

  chainA  current production: split_heads -> flash_bounded(out [BH,D,S])
          -> swapaxes -> merge_heads -> out-proj matmul.
  chainC  OUTPUT-side fix only: same canonical [B,H,S,D] kernel input,
          but the kernel writes the packed TRANSPOSED form [B, H*D, Sq]
          (out block (None, 40, blk_q) at grid index (bh//H, bh%H, qi) —
          40 % 8 == 0 sublanes, blk_q % 128 == 0 lanes, both legal), and
          the out projection consumes it directly as
          dot_general([B, C, S], [C, E]) -> [B, S, E] with NO relayout.
  chainD  chainC + INPUT-side fix: projections emitted directly in head-
          split form via einsum('bsc,chd->bhsd', x, W[C,H,D]) so XLA's
          dot writes the layout the kernel wants (if its layout
          assignment obliges) instead of copy-transposing afterwards.
  chainE  chainC + input fix via kernel-side q/k/v in the S-MINOR form
          [B, H, D, S] (einsum('bsc,chd->bhds')): scores need qT/kT
          anyway (the kernel computes k_blk @ q^T), so feeding already-
          transposed tiles changes only which operand side the MXU sees.
"""
import functools
import tempfile

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hedit_tpu.utils.profiling import device_sync  # noqa: E402  axon-safe barrier
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from hedit_tpu.ops.flash_attention import (  # noqa: E402
    LOG2E, flash_attention_bounded)
from hedit_tpu.utils.xplane import top_ops  # noqa: E402


def _bounded_acc(q, k_ref, v_ref, *, blk_k):
    """Shared bounded-softmax accumulator on a [blk_q, D] q tile: returns
    [D+1, blk_q] f32 acc (row D = denominator).  Production math of
    _flash_bounded_kernel (no padding mask: S is block-aligned here)."""
    blk_q, d = q.shape
    nk = k_ref.shape[0] // blk_k
    mm = q.dtype

    def scores(ki):
        k_blk = k_ref[pl.ds(ki * blk_k, blk_k), :]
        return jax.lax.dot_general(
            k_blk, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def pv(ki, p_t):
        v_blk = v_ref[pl.ds(ki * blk_k, blk_k), :]
        v_aug = jnp.concatenate(
            [v_blk, jnp.ones((blk_k, 1), v_blk.dtype)], axis=1)
        return jax.lax.dot_general(
            v_aug, p_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    s0 = scores(0)
    shift = jnp.max(s0, axis=0, keepdims=True) + 16.0
    acc0 = pv(0, jnp.exp2(s0 - shift).astype(mm))

    def body(ki, acc_t):
        p_t = jnp.exp2(jnp.minimum(scores(ki) - shift, 100.0)).astype(mm)
        return acc_t + pv(ki, p_t)

    return jax.lax.fori_loop(1, nk, body, acc0), d


def _packed_t_kernel(q_ref, k_ref, v_ref, ot_ref, *, sm_scale, blk_k):
    """q_ref [blk_q, D]; ot_ref [D, blk_q] chunk of the [B, H*D, Sq] out."""
    q = q_ref[...] * jnp.asarray(sm_scale * LOG2E, q_ref.dtype)
    acc_t, d = _bounded_acc(q, k_ref, v_ref, blk_k=blk_k)
    denom = jnp.maximum(acc_t[d:], 1.2e-38)
    ot_ref[...] = (acc_t[:d] / denom).astype(ot_ref.dtype)


def _packed_t_kernel_sminor(qt_ref, kt_ref, v_ref, ot_ref, *, sm_scale,
                            blk_k):
    """S-minor inputs: qt_ref [D, blk_q], kt_ref [D, Sk]; v stays [Sk, D]."""
    qt = qt_ref[...] * jnp.asarray(sm_scale * LOG2E, qt_ref.dtype)
    d, blk_q = qt.shape
    nk = kt_ref.shape[1] // blk_k
    mm = qt.dtype

    def scores(ki):
        kt_blk = kt_ref[:, pl.ds(ki * blk_k, blk_k)]  # [D, blk_k]
        return jax.lax.dot_general(
            kt_blk, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [blk_k, blk_q]

    def pv(ki, p_t):
        v_blk = v_ref[pl.ds(ki * blk_k, blk_k), :]
        v_aug = jnp.concatenate(
            [v_blk, jnp.ones((blk_k, 1), v_blk.dtype)], axis=1)
        return jax.lax.dot_general(
            v_aug, p_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    s0 = scores(0)
    shift = jnp.max(s0, axis=0, keepdims=True) + 16.0
    acc0 = pv(0, jnp.exp2(s0 - shift).astype(mm))

    def body(ki, acc_t):
        p_t = jnp.exp2(jnp.minimum(scores(ki) - shift, 100.0)).astype(mm)
        return acc_t + pv(ki, p_t)

    acc_t = jax.lax.fori_loop(1, nk, body, acc0)
    denom = jnp.maximum(acc_t[d:], 1.2e-38)
    ot_ref[...] = (acc_t[:d] / denom).astype(ot_ref.dtype)


def _packed_t_kernel_all_sminor(qt_ref, kt_ref, vt_ref, ot_ref, *, sm_scale,
                                blk_k):
    """All-S-minor inputs: qt [D, blk_q], kt/vt [D, Sk]; out [D, blk_q]."""
    qt = qt_ref[...] * jnp.asarray(sm_scale * LOG2E, qt_ref.dtype)
    d, blk_q = qt.shape
    nk = kt_ref.shape[1] // blk_k
    mm = qt.dtype

    def scores(ki):
        kt_blk = kt_ref[:, pl.ds(ki * blk_k, blk_k)]  # [D, blk_k]
        return jax.lax.dot_general(
            kt_blk, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [blk_k, blk_q]

    def pv(ki, p_t):
        vt_blk = vt_ref[:, pl.ds(ki * blk_k, blk_k)]  # [D, blk_k]
        v_aug = jnp.concatenate(
            [vt_blk, jnp.ones((1, vt_blk.shape[1]), vt_blk.dtype)], axis=0)
        return jax.lax.dot_general(
            v_aug, p_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [D+1, blk_q]

    s0 = scores(0)
    shift = jnp.max(s0, axis=0, keepdims=True) + 16.0
    acc0 = pv(0, jnp.exp2(s0 - shift).astype(mm))

    def body(ki, acc_t):
        p_t = jnp.exp2(jnp.minimum(scores(ki) - shift, 100.0)).astype(mm)
        return acc_t + pv(ki, p_t)

    acc_t = jax.lax.fori_loop(1, nk, body, acc0)
    denom = jnp.maximum(acc_t[d:], 1.2e-38)
    ot_ref[...] = (acc_t[:d] / denom).astype(ot_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k"))
def flash_packed_t_all_sminor(qt, kt, vt, *, blk_q=2048, blk_k=512):
    """qt/kt/vt [B, H, D, S] S-minor -> out [B, H*D, Sq]."""
    b, h, d, sq = qt.shape
    sk = kt.shape[3]
    qf = qt.reshape(b * h, d, sq)
    kf = kt.reshape(b * h, d, sk)
    vf = vt.reshape(b * h, d, sk)
    return pl.pallas_call(
        functools.partial(_packed_t_kernel_all_sminor, sm_scale=1.0 / d**0.5,
                          blk_k=blk_k),
        grid=(b * h, sq // blk_q),
        in_specs=[
            pl.BlockSpec((None, d, blk_q), lambda bh, i: (bh, 0, i)),
            pl.BlockSpec((None, d, sk), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, d, sk), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, d, blk_q), lambda bh, i: (bh // h, bh % h, i)),
        out_shape=jax.ShapeDtypeStruct((b, h * d, sq), qt.dtype),
    )(qf, kf, vf)


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k"))
def flash_packed_t(q, k, v, *, blk_q=2048, blk_k=512):
    """q/k/v [B, H, S, D] canonical -> out [B, H*D, Sq] packed transposed."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, sk, d)
    vf = v.reshape(b * h, sk, d)
    return pl.pallas_call(
        functools.partial(_packed_t_kernel, sm_scale=1.0 / d**0.5,
                          blk_k=blk_k),
        grid=(b * h, sq // blk_q),
        in_specs=[
            pl.BlockSpec((None, blk_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((None, sk, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, sk, d), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, d, blk_q), lambda bh, i: (bh // h, bh % h, i)),
        out_shape=jax.ShapeDtypeStruct((b, h * d, sq), q.dtype),
    )(qf, kf, vf)


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k"))
def flash_packed_t_sminor(qt, kt, v, *, blk_q=2048, blk_k=512):
    """qt/kt [B, H, D, S] S-minor; v [B, H, S, D] -> out [B, H*D, Sq]."""
    b, h, d, sq = qt.shape
    sk = kt.shape[3]
    qf = qt.reshape(b * h, d, sq)
    kf = kt.reshape(b * h, d, sk)
    vf = v.reshape(b * h, sk, d)
    return pl.pallas_call(
        functools.partial(_packed_t_kernel_sminor, sm_scale=1.0 / d**0.5,
                          blk_k=blk_k),
        grid=(b * h, sq // blk_q),
        in_specs=[
            pl.BlockSpec((None, d, blk_q), lambda bh, i: (bh, 0, i)),
            pl.BlockSpec((None, d, sk), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, sk, d), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, d, blk_q), lambda bh, i: (bh // h, bh % h, i)),
        out_shape=jax.ShapeDtypeStruct((b, h * d, sq), qt.dtype),
    )(qf, kf, vf)


def measure(name, fn, args):
    out = fn(*args)
    device_sync(out)
    logdir = tempfile.mkdtemp()
    with jax.profiler.trace(logdir):
        o = None
        for _ in range(5):
            o = fn(*args)
        device_sync(o)
    total, rows = top_ops(logdir, n=8)
    print(f"{name}: device total {total / 1e9 / 5:.3f} ms/call")
    for nm, ms, cnt in rows:
        print(f"   {ms / 5:7.3f} ms  x{cnt}  {nm[:90]}")


def main():
    rng = np.random.RandomState(0)
    B, S, H, D, C = 16, 4096, 8, 40, 320
    x = jnp.asarray(rng.randn(B, S, C) * 0.2, jnp.bfloat16)
    wq, wk, wv, wo = (jnp.asarray(rng.randn(C, C) * 0.05, jnp.bfloat16)
                      for _ in range(4))

    def split(t):
        return t.reshape(B, S, H, D).transpose(0, 2, 1, 3)

    @jax.jit
    def chainA(x, wq, wk, wv, wo):
        q, k, v = x @ wq, x @ wk, x @ wv
        o = flash_attention_bounded(split(q), split(k), split(v))
        o = o.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        return o @ wo

    def outproj_t(ot, wo):
        # [B, C, S] x [C, E] -> [B, S, E]
        return jax.lax.dot_general(ot, wo, (((1,), (0,)), ((), ())))

    @jax.jit
    def chainC(x, wq, wk, wv, wo):
        q, k, v = x @ wq, x @ wk, x @ wv
        ot = flash_packed_t(split(q), split(k), split(v))
        return outproj_t(ot, wo)

    @jax.jit
    def chainD(x, wq, wk, wv, wo):
        qh = jnp.einsum("bsc,chd->bhsd", x, wq.reshape(C, H, D))
        kh = jnp.einsum("bsc,chd->bhsd", x, wk.reshape(C, H, D))
        vh = jnp.einsum("bsc,chd->bhsd", x, wv.reshape(C, H, D))
        return outproj_t(flash_packed_t(qh, kh, vh), wo)

    @jax.jit
    def chainE(x, wq, wk, wv, wo):
        qt = jnp.einsum("bsc,chd->bhds", x, wq.reshape(C, H, D))
        kt = jnp.einsum("bsc,chd->bhds", x, wk.reshape(C, H, D))
        vh = jnp.einsum("bsc,chd->bhsd", x, wv.reshape(C, H, D))
        return outproj_t(flash_packed_t_sminor(qt, kt, vh), wo)

    @jax.jit
    def chainF(x, wq, wk, wv, wo):
        qt = jnp.einsum("bsc,chd->bhds", x, wq.reshape(C, H, D))
        kt = jnp.einsum("bsc,chd->bhds", x, wk.reshape(C, H, D))
        vt = jnp.einsum("bsc,chd->bhds", x, wv.reshape(C, H, D))
        return outproj_t(flash_packed_t_all_sminor(qt, kt, vt), wo)

    args = (x, wq, wk, wv, wo)
    ra = chainA(*args)
    for nm, fn in [("chainC", chainC), ("chainD", chainD),
                   ("chainE", chainE), ("chainF", chainF)]:
        r = fn(*args)
        err = jnp.max(jnp.abs(r.astype(jnp.float32) - ra.astype(jnp.float32)))
        print(f"{nm} max|diff| vs chainA: {float(err):.4f}")

    measure("chainA (split/merge copies)", chainA, args)
    measure("chainC (packed-T out + dnums out-proj)", chainC, args)
    measure("chainD (einsum-split projections + C)", chainD, args)
    measure("chainE (S-minor q/k einsum projections + C)", chainE, args)
    measure("chainF (all-S-minor projections + C)", chainF, args)


if __name__ == "__main__":
    main()
