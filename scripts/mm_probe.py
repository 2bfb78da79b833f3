"""MXU cost model probe: what does the hardware charge for small
contraction (k=40 vs 128) and small output lanes (n=40 vs 128)?

Decides the flash-attention head-dim-packing design (PERF_NOTES lever 1):
the res-64 attention runs d=40 padded to 128 lanes; if the MXU charges
~k cycles rather than ceil(k/128) passes, an unpadded or d-major
formulation recovers up to 3.2x on the qk^T and pv matmuls.

Each case is a pallas kernel that loops the matmul R times inside the
kernel (fori_loop, accumulating, so Mosaic can't DCE it) on VMEM-resident
operands — isolating raw MXU cost from HBM traffic.  Device times are read
back from the profiler xplane (hedit_tpu.utils.xplane).
"""

from __future__ import annotations

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

REPS = 64
M, N = 512, 2048  # flash block shapes at res 64 (N halved: f32 acc VMEM)


def _loop_kernel(a_ref, b_ref, o_ref, *, dnums, reps):
    def body(i, acc):
        # nudge the lhs by i so each iteration is a distinct matmul
        a = a_ref[...] + jnp.bfloat16(i)
        return acc + jax.lax.dot_general(
            a, b_ref[...], dimension_numbers=dnums,
            preferred_element_type=jnp.float32)
    o_ref[...] = jax.lax.fori_loop(0, reps, body,
                                   jnp.zeros(o_ref.shape, jnp.float32))


def run_case(name, a_shape, b_shape, o_shape, dnums):
    kern = functools.partial(_loop_kernel, dnums=dnums, reps=REPS)
    a = jnp.ones(a_shape, jnp.bfloat16)
    b = jnp.ones(b_shape, jnp.bfloat16)
    fn = jax.jit(lambda a, b: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(o_shape, jnp.float32))(a, b))
    out = fn(a, b)  # compile + warm
    jax.device_get(out)
    logdir = tempfile.mkdtemp(prefix=f"mm_{name}_")
    with jax.profiler.trace(logdir):
        o = fn(a, b)
        jax.device_get(o)
    total_ps, rows = top_ops(logdir, n=5)
    # the pallas custom-call is the dominant op in this trace
    top = rows[0] if rows else ("<none>", 0.0, 0)
    per_mm_us = top[1] * 1e3 / REPS
    print(f"{name:<28} {per_mm_us:9.2f} us/matmul   (top op {top[0][:40]}"
          f" {top[1]:.3f} ms total)")
    return per_mm_us


def main():
    print(f"backend={jax.devices()[0].platform} reps={REPS} M={M} N={N}")
    nn = (((1,), (0,)), ((), ()))        # normal a[m,k]@b[k,n]
    tl = (((0,), (0,)), ((), ()))        # lhs transposed: a[k,m], b[k,n]
    tr = (((1,), (1,)), ((), ()))        # rhs transposed: a[m,k], b[n,k]

    r = {}
    # qk^T-like: contraction = d
    r["qk_pad   k=128"] = run_case("qk_pad", (M, 128), (128, N), (M, N), nn)
    r["qk_raw   k=40"] = run_case("qk_raw", (M, 40), (40, N), (M, N), nn)
    r["qk_tlhs  k=40 sublane"] = run_case("qk_tlhs", (40, M), (40, N), (M, N), tl)
    r["qk_tlhs  k=48 sublane"] = run_case("qk_tlhs48", (48, M), (48, N), (M, N), tl)
    tm = (((0,), (1,)), ((), ()))        # lhs dim0 x rhs dim1 (mixed)
    r["qk_trhs  k[n,d] natural"] = run_case("qk_trhs", (M, 40), (N, 40), (M, N), tr)
    # pv-like: contraction = seq_k, output lanes = d
    r["pv_pad   n=128"] = run_case("pv_pad", (M, N), (N, 128), (M, 128), nn)
    r["pv_raw   n=40"] = run_case("pv_raw", (M, N), (N, 40), (M, 40), nn)
    r["pv_trhs  out[d,m]"] = run_case("pv_trhs", (40, N), (M, N), (40, M), tr)
    r["pv_mixed v[n,d] natural"] = run_case("pv_mixed", (N, 40), (M, N), (40, M), tm)
    print()
    base_qk, base_pv = r["qk_pad   k=128"], r["pv_pad   n=128"]
    for k, v in r.items():
        base = base_qk if k.startswith("qk") else base_pv
        print(f"{k:<24} {v:8.2f} us  ({base / v:4.2f}x vs padded)")


if __name__ == "__main__":
    main()
