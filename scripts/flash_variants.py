"""A/B kernel variants for the flash attention rework (res-64 shapes).

v1 baseline (d padded to 128, standard p@v, acc [m,d]): 2.20 ms measured.
Variants isolate which change caused the v2 regression (33 ms):
  a: no d-pad, standard p@v (output lanes d=40), acc [m,d]
  b: no d-pad, mixed-dnums p@v -> accT [d,m], transposed output
  c: no d-pad, fully transposed: sT/softmax-over-sublanes/tlhs pv
  d: like a, but p and v in bf16 for the pv matmul
"""
import functools
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from hedit_tpu.utils.xplane import top_ops  # noqa: E402

NEG_INF = -1e30
B, H, S, D = 4, 8, 4096, 40
BLK_Q, BLK_K = 256, 512


def kern_a(q_ref, k_ref, v_ref, o_ref, *, sm_scale, pv_bf16=False):
    q = q_ref[...].astype(jnp.float32) * sm_scale
    blk_q, d = q.shape
    nk = k_ref.shape[0] // BLK_K

    def body(ki, carry):
        acc, m_i, l_i = carry
        k_blk = k_ref[pl.ds(ki * BLK_K, BLK_K), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if pv_bf16:
            v_blk = v_ref[pl.ds(ki * BLK_K, BLK_K), :]
            pv = jnp.dot(p.astype(jnp.bfloat16), v_blk,
                         preferred_element_type=jnp.float32)
        else:
            v_blk = v_ref[pl.ds(ki * BLK_K, BLK_K), :].astype(jnp.float32)
            pv = jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc * alpha + pv, m_new, l_new

    acc0 = jnp.zeros((blk_q, d), jnp.float32)
    m0 = jnp.full((blk_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    o_ref[...] = (acc / l_i).astype(o_ref.dtype)


def kern_b(q_ref, k_ref, v_ref, ot_ref, *, sm_scale):
    q = q_ref[...].astype(jnp.float32) * sm_scale
    blk_q, d = q.shape
    nk = k_ref.shape[0] // BLK_K

    def body(ki, carry):
        acc_t, m_i, l_i = carry
        k_blk = k_ref[pl.ds(ki * BLK_K, BLK_K), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(ki * BLK_K, BLK_K), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv_t = jax.lax.dot_general(v_blk, p, (((0,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return acc_t * alpha.reshape(1, blk_q) + pv_t, m_new, l_new

    acc0 = jnp.zeros((d, blk_q), jnp.float32)
    m0 = jnp.full((blk_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc_t, m_i, l_i = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    ot_ref[...] = (acc_t / l_i.reshape(1, blk_q)).astype(ot_ref.dtype)


def kern_c(q_ref, k_ref, v_ref, ot_ref, *, sm_scale):
    q = q_ref[...].astype(jnp.float32) * sm_scale
    blk_q, d = q.shape
    nk = k_ref.shape[0] // BLK_K

    def body(ki, carry):
        acc_t, m_i, l_i = carry  # m/l as [1, blk_q]
        k_blk = k_ref[pl.ds(ki * BLK_K, BLK_K), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(ki * BLK_K, BLK_K), :].astype(jnp.float32)
        s_t = jax.lax.dot_general(k_blk, q, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # [bk, bq]
        m_new = jnp.maximum(m_i, jnp.max(s_t, axis=0, keepdims=True))
        p_t = jnp.exp(s_t - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p_t, axis=0, keepdims=True)
        pv_t = jax.lax.dot_general(v_blk, p_t, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)  # [d, bq]
        return acc_t * alpha + pv_t, m_new, l_new

    acc0 = jnp.zeros((d, blk_q), jnp.float32)
    m0 = jnp.full((1, blk_q), NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, blk_q), jnp.float32)
    acc_t, m_i, l_i = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    ot_ref[...] = (acc_t / l_i).astype(ot_ref.dtype)


def run(name, kernel, transposed_out):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B * H, S, D), jnp.bfloat16)
    k = jax.random.normal(key, (B * H, S, D), jnp.bfloat16)
    v = jax.random.normal(key, (B * H, S, D), jnp.bfloat16)
    out_spec = (pl.BlockSpec((None, D, BLK_Q), lambda bh, i: (bh, 0, i))
                if transposed_out else
                pl.BlockSpec((None, BLK_Q, D), lambda bh, i: (bh, i, 0)))
    out_shape = ((B * H, D, S) if transposed_out else (B * H, S, D))
    fn = jax.jit(lambda q, k, v: pl.pallas_call(
        kernel,
        grid=(B * H, S // BLK_Q),
        in_specs=[
            pl.BlockSpec((None, BLK_Q, D), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((None, S, D), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((None, S, D), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, q.dtype),
    )(q, k, v))
    try:
        jax.device_get(fn(q, k, v))
    except Exception as e:
        print(f"{name:<10} FAILED: {str(e)[:140]}")
        return
    logdir = tempfile.mkdtemp(prefix=f"fv_{name}_")
    with jax.profiler.trace(logdir):
        jax.device_get(fn(q, k, v))
    total_ps, rows = top_ops(logdir, n=1)
    print(f"{name:<10} {rows[0][1]:8.3f} ms   ({rows[0][0][:50]})")


sm = 1.0 / D**0.5
run("a_nopad", functools.partial(kern_a, sm_scale=sm), False)
run("b_mixed", functools.partial(kern_b, sm_scale=sm), True)
run("c_trans", functools.partial(kern_c, sm_scale=sm), True)
run("d_bf16pv", functools.partial(kern_a, sm_scale=sm, pv_bf16=True), False)
