"""A/B of the LAST untried radix-glue shape (verdict round-3 item 6):
absorb the inverse DST's back-half output flips into the generated
GEMM kernels by emitting reversed-j outputs.

Production inverse (helmholtz._idst1_mm_packed) assembles each level
as [uf + v, um, flip(uf - v)].  The reversed-j variant removes every
jnp.flip by a PAIR recursion that returns both output orders:

    res     = [uf + v, um, ufR - vR]
    flipres = [uf - v, um, ufR + vR]

where ufR = K2R^T yo with K2R the BUILD-TIME row-reversed odd kernel
(the flip becomes the GEMM's output order) and (v, vR) come from the
recursion; at the base level vR is a row-reversed sine GEMM.  The
arithmetic consequence is structural: every level must produce BOTH
orders, so every K2/K1 GEMM runs twice -- flips are traded for a
doubling of the transform GEMM flops.

Measured on the v5e at 4799 interior f32 (3-mode batch, inner=32;
the pair output matches production BIT-EXACTLY, rel err 0.0):

    inv 2-D:  production (flips) 33.3 ms    reversed-j pair 55.1 ms

REJECTED, and the solve-glue line of attack is now CLOSED
(BENCHMARKS.md round-4): the per-level flips cost ~2.7 ms per
direction (the 5.4 ms reverse bucket across fwd+inv) while the pair
recursion adds ~22 ms of GEMM work -- an order of magnitude more.
Together with the round-3 take-permutation reject, both de-flip
shapes lose; the solve stays at ~85 ms/step (~85% of the 6-pass bf16
MXU roofline on its GEMMs).

Run: python tools/bench_revj_ab.py [--n 4799] [--inner 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import qgcm_tpu.solver.helmholtz as hh

PREC = jax.lax.Precision.HIGHEST


# ---- reversed-j pair-recursion inverse, self-contained ---------------

def _odd_kernel2_rev(m, dtype):
    """K2 with BUILD-TIME reversed output rows: j = m-1..1."""
    j = jnp.asarray(np.arange(m - 1, 0, -1), dtype)
    t = jax.lax.iota(dtype, m)
    return 2.0 * jnp.sin(jnp.asarray(np.pi / (2 * m), dtype)
                         * j[:, None] * (2.0 * t[None, :] + 1.0))


def _sine_matrix_rev(n, dtype):
    # _mm contracts x with K's FIRST axis; the output indexes the
    # SECOND, so reversed output order = reversed columns
    K = hh._sine_matrix(n, dtype)
    return K[:, ::-1]


def rj_inv_pair(y, axis, prec):
    """-> (idst(y), flip(idst(y))) with zero jnp.flips anywhere."""
    n = y.shape[axis]
    dt = y.dtype
    m = (n + 1) // 2
    if n % 2 == 0 or m < hh._MM_SPLIT_MIN:
        return (hh._mm(y, hh._sine_matrix(n, dt), axis, prec),
                hh._mm(y, _sine_matrix_rev(n, dt), axis, prec))
    sl = lambda a, lo, hi: jax.lax.slice_in_dim(a, lo, hi, axis=axis)
    yo = sl(y, 0, m)
    uf = hh._mm_t(yo, hh._odd_kernel2(m, dt), axis, prec)
    ufR = hh._mm_t(yo, _odd_kernel2_rev(m, dt), axis, prec)
    um = jnp.sum(yo * hh._mid_signs(m, dt, axis, y.ndim), axis=axis,
                 keepdims=True)
    v, vR = rj_inv_pair(sl(y, m, n), axis, prec)
    res = jnp.concatenate([uf + v, um, ufR - vR], axis=axis)
    rev = jnp.concatenate([uf - v, um, ufR + vR], axis=axis)
    return res, rev


def rj_inv(y, axis, prec):
    return rj_inv_pair(y, axis, prec)[0]


# ---- harness (same as bench_flipfree_ab) ------------------------------

def sync(x):
    jax.block_until_ready(x)
    return float(jnp.ravel(x)[0])


def timed(fn, x, reps, inner):
    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c) * 1e-7, None
        out, _ = lax.scan(body, x, None, length=inner)
        return out

    with jax.enable_x64(False):
        sync(loop(x))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(loop(x))
            ts.append((time.perf_counter() - t0) / inner)
    return min(ts) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4799)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--inner", type=int, default=32)
    ap.add_argument("--check", action="store_true",
                    help="verify rj_inv == production inverse first")
    a = ap.parse_args()
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((3, a.n, a.n)), jnp.float32)
    if a.check:
        with jax.enable_x64(False):
            y = jnp.asarray(np.random.default_rng(1)
                            .standard_normal((3, 512, a.n)), jnp.float32)
            r0 = hh._idst1_mm_packed(y, -1, PREC)
            r1 = rj_inv(y, -1, PREC)
            err = float(jnp.abs(r0 - r1).max() / jnp.abs(r0).max())
            print(f"rj_inv vs production rel err: {err:.2e}")
            assert err < 1e-5
    rows = [
        ("inv2d production (flips) ", lambda c: hh._idst1_mm_packed(
            hh._idst1_mm_packed(c, -1, PREC), -2, PREC)),
        ("inv2d reversed-j pair    ", lambda c: rj_inv(
            rj_inv(c, -1, PREC), -2, PREC)),
    ]
    for name, fn in rows:
        print(f"{name}: {timed(fn, x, a.reps, a.inner):8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
