"""Flash v4 candidates at the controlled-call hot shape [4,32,4096,40] bf16.

The v3 kernel sits at 5.28 ms vs a ~3.7 ms charged-FLOP roof; the gap is
VPU softmax work serializing with the MXU.  Variants:
  base : v3 as shipped (ops/flash_attention.py)
  exp2 : fold sm_scale*log2(e) into q, use exp2 — saves one VPU mul pass
  pipe : software-pipelined k-loop — compute the NEXT block's scores (MXU)
         before the CURRENT block's softmax/PV, giving Mosaic a window to
         overlap MXU and VPU across iterations
  both : exp2 + pipe
"""
import functools
import tempfile

import jax
from hedit_tpu.utils.profiling import device_sync  # axon-safe barrier
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from hedit_tpu.ops.flash_attention import flash_attention, reference_attention  # noqa: E402
from hedit_tpu.utils.xplane import top_ops  # noqa: E402

NEG_INF = -1e30
LOG2E = 1.4426950408889634


def kern_exp2(q_ref, k_ref, v_ref, ot_ref, *, sm_scale, blk_k, pipe):
    q = q_ref[...] * jnp.asarray(sm_scale * LOG2E, q_ref.dtype)
    blk_q, d = q.shape
    nk = k_ref.shape[0] // blk_k
    mm = q.dtype

    def scores(ki):
        k_blk = k_ref[pl.ds(ki * blk_k, blk_k), :]
        return jax.lax.dot_general(
            k_blk, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def softmax_pv(s_t, ki, acc_t, m_i):
        v_blk = v_ref[pl.ds(ki * blk_k, blk_k), :]
        m_new = jnp.maximum(m_i, jnp.max(s_t, axis=0, keepdims=True))
        p_t = jnp.exp2(s_t - m_new).astype(mm)
        alpha = jnp.exp2(m_i - m_new)
        v_aug = jnp.concatenate([v_blk, jnp.ones((blk_k, 1), v_blk.dtype)],
                                axis=1)
        pv_t = jax.lax.dot_general(
            v_aug, p_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_t * alpha + pv_t, m_new

    acc0 = jnp.zeros((d + 1, blk_q), jnp.float32)
    m0 = jnp.full((1, blk_q), NEG_INF, jnp.float32)
    if pipe:
        # prologue: fetch block 0 scores; steady state overlaps dot(ki) with
        # softmax/pv(ki-1); epilogue drains the last block
        s0 = scores(0)

        def body2(ki, carry):
            acc_t, m_i, s_prev = carry
            s_next = scores(ki)
            acc_t, m_i = softmax_pv(s_prev, ki - 1, acc_t, m_i)
            return acc_t, m_i, s_next

        acc_t, m_i, s_last = jax.lax.fori_loop(1, nk, body2, (acc0, m0, s0))
        acc_t, m_i = softmax_pv(s_last, nk - 1, acc_t, m_i)
    else:
        def body(ki, carry):
            acc_t, m_i = carry
            return softmax_pv(scores(ki), ki, acc_t, m_i)

        acc_t, m_i = jax.lax.fori_loop(0, nk, body, (acc0, m0))
    ot_ref[...] = (acc_t[:d] / acc_t[d:]).astype(ot_ref.dtype)


def run_variant(name, q, k, v, *, blk_q=2048, blk_k=512, pipe=False):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, sk, d)
    vf = v.reshape(b * h, sk, d)
    f = jax.jit(lambda qf, kf, vf: pl.pallas_call(
        functools.partial(kern_exp2, sm_scale=1.0 / d**0.5, blk_k=blk_k,
                          pipe=pipe),
        grid=(b * h, sq // blk_q),
        in_specs=[
            pl.BlockSpec((None, blk_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((None, sk, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, sk, d), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, d, blk_q), lambda bh, i: (bh, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, d, sq), q.dtype),
    )(qf, kf, vf))
    out = f(qf, kf, vf)
    device_sync(out)
    # correctness on head 0
    want = reference_attention(
        q[:1, :1].astype(jnp.float32), k[:1, :1].astype(jnp.float32),
        v[:1, :1].astype(jnp.float32))
    got = out.reshape(b, h, d, sq)[0, 0].T[None, None].astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got - want)))
    logdir = tempfile.mkdtemp()
    with jax.profiler.trace(logdir):
        for _ in range(5):
            out = f(qf, kf, vf)
        device_sync(out)
    total, rows = top_ops(logdir, n=2)
    ms = [m for nm, m, c in rows if "kern_exp2" in nm or "fusion" not in nm]
    print(f"{name}: {ms[0] / 5:.3f} ms/call  (err {err:.2e})")


def main():
    rng = np.random.RandomState(0)
    B, H, S, D = 4, 32, 4096, 40
    q = jnp.asarray(rng.randn(B, H, S, D), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, D), dtype=jnp.bfloat16)

    # baseline: shipped v3 kernel
    fb = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    out = fb(q, k, v); device_sync(out)
    logdir = tempfile.mkdtemp()
    with jax.profiler.trace(logdir):
        for _ in range(5):
            out = fb(q, k, v)
        device_sync(out)
    total, rows = top_ops(logdir, n=2)
    ms = [m for nm, m, c in rows if "flash" in nm]
    print(f"base(v3): {ms[0] / 5:.3f} ms/call")

    run_variant("exp2      ", q, k, v, pipe=False)
    run_variant("exp2+pipe ", q, k, v, pipe=True)


if __name__ == "__main__":
    main()
