"""Ablate the flash kernel at [4,32,4096,40] bf16 to locate the true floor.

bounded (max-free) measured 5.05 ms vs v3's 5.15 — removing the running-max
carry bought ~2%, so the gap to the ~3.7 ms charged-FLOP estimate is NOT the
max/rescale serialization.  Ablations:
  dots   : p = cast(s) — QK dot + cast + PV dot only (no exp, no shift, no
           stats prologue).  This is the loop's MXU+cast floor; if it sits
           near 5 ms the charged-FLOP roof estimate was optimistic and the
           kernel is already at the hardware.
  exp    : p = exp2(s) (no shift subtract, no prologue) — adds the exp pass.
  noprolog: full bounded math minus the stats prologue (constant shift).
Each prints device ms/call.
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

from hedit_tpu.utils.xplane import top_ops  # noqa: E402


def make_kernel(mode):
    def kern(q_ref, k_ref, v_ref, ot_ref, *, blk_k):
        q = q_ref[...]
        blk_q, d = q.shape
        nk = k_ref.shape[0] // blk_k
        mm = q.dtype

        def body(ki, acc_t):
            k_blk = k_ref[pl.ds(ki * blk_k, blk_k), :]
            v_blk = v_ref[pl.ds(ki * blk_k, blk_k), :]
            s_t = jax.lax.dot_general(
                k_blk, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if mode == "dots":
                p_t = s_t.astype(mm)
            elif mode == "exp":
                p_t = jnp.exp2(s_t).astype(mm)
            else:  # noprolog
                p_t = jnp.exp2(jnp.minimum(s_t - 12.34, 100.0)).astype(mm)
            v_aug = jnp.concatenate(
                [v_blk, jnp.ones((blk_k, 1), v_blk.dtype)], axis=1)
            pv_t = jax.lax.dot_general(
                v_aug, p_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc_t + pv_t

        acc0 = jnp.zeros((d + 1, blk_q), jnp.float32)
        acc_t = jax.lax.fori_loop(0, nk, body, acc0)
        ot_ref[...] = (acc_t[:d] / jnp.maximum(acc_t[d:], 1e-30)).astype(ot_ref.dtype)

    return kern


def run(mode, q, k, v, blk_q=2048, blk_k=512):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, sk, d)
    vf = v.reshape(b * h, sk, d)
    f = jax.jit(lambda qf, kf, vf: pl.pallas_call(
        functools.partial(make_kernel(mode), blk_k=blk_k),
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
    logdir = tempfile.mkdtemp()
    with jax.profiler.trace(logdir):
        for _ in range(5):
            out = f(qf, kf, vf)
        device_sync(out)
    total, rows = top_ops(logdir, n=3)
    ms = [m for nm, m, c in rows if "wrapped" in nm or "custom" in nm or "pallas" in nm.lower() or "<lambda>" in nm or "fori" in nm or True][0]
    print(f"{mode} {blk_q}x{blk_k}: {ms / 5:.3f} ms/call")


def main():
    rng = np.random.RandomState(0)
    B, H, S, D = 4, 32, 4096, 40
    # scale down so raw exp2(s) in the 'exp' ablation stays finite
    q = jnp.asarray(rng.randn(B, H, S, D) * 0.05, dtype=jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D) * 0.05, dtype=jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, D), dtype=jnp.bfloat16)
    run("dots", q, k, v)
    run("exp", q, k, v)
    run("noprolog", q, k, v)
    run("dots", q, k, v, blk_q=1024, blk_k=1024)


if __name__ == "__main__":
    main()
