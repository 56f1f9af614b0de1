"""A/B of the radix-split DST glue: per-level jnp.flip butterflies
(production, helmholtz._dst1_mm_packed) vs a flip-free variant that
pre-permutes the grid axis once with jnp.take (_mirror_perm) and folds
the front-order permutation into the generated GEMM kernels.

Measured on the v5e at 4799 interior f32 (3-mode batch, inner=32):

    fwd 2-D:  flip 32.7 ms   take 33.6 ms
    inv 2-D:  flip 33.2 ms   take 36.6 ms

REJECTED: although a standalone constant-index take (4.5 ms/pass)
beats a standalone flip (5.6 ms/pass) at this width, the per-level
flips FUSE into the butterfly add/sub producers while the takes
cannot, so the flip-free chain pays 1 unfused gather pass per
direction per axis and loses 1-3 ms per transform direction.  Kept as
a runnable record (BENCHMARKS.md round-3 rejects).

Run: python tools/bench_flipfree_ab.py [--n 4799] [--inner 32]
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


# ---- flip-free (Q-permuted) variant, self-contained ----------------

def _mirror_perm(n):
    m = (n + 1) // 2
    if n % 2 == 0 or m < hh._MM_SPLIT_MIN:
        return np.arange(n)
    sub = _mirror_perm(m - 1)
    return np.concatenate([sub, [m - 1], (n - 1) - sub])


def _mirror_perm_inv(n):
    q = _mirror_perm(n)
    inv = np.empty_like(q)
    inv[q] = np.arange(n)
    return inv


def _odd_kernel2q(m, dtype):
    j = jnp.asarray(_mirror_perm(m - 1) + 1, dtype)
    t = jax.lax.iota(dtype, m)
    return 2.0 * jnp.sin(jnp.asarray(np.pi / (2 * m), dtype)
                         * j[:, None] * (2.0 * t[None, :] + 1.0))


def _take(x, idx, axis):
    if (idx == np.arange(idx.size)).all():
        return x
    return jnp.take(x, jnp.asarray(idx, jnp.int32), axis=axis)


def q_fwd_levels(xq, axis, prec):
    n = xq.shape[axis]
    dt = xq.dtype
    m = (n + 1) // 2
    if n % 2 == 0 or m < hh._MM_SPLIT_MIN:
        return hh._mm(xq, hh._sine_matrix(n, dt), axis, prec)
    sl = lambda a, lo, hi: jax.lax.slice_in_dim(a, lo, hi, axis=axis)
    xf, xb = sl(xq, 0, m - 1), sl(xq, m, n)
    odd = (hh._mm(xf + xb, _odd_kernel2q(m, dt), axis, prec)
           + sl(xq, m - 1, m) * hh._mid_signs(m, dt, axis, xq.ndim))
    return jnp.concatenate([odd, q_fwd_levels(xf - xb, axis, prec)],
                           axis=axis)


def q_fwd(x, axis, prec):
    return q_fwd_levels(_take(x, _mirror_perm(x.shape[axis]), axis),
                        axis, prec)


def q_inv_levels(y, axis, prec):
    n = y.shape[axis]
    dt = y.dtype
    m = (n + 1) // 2
    if n % 2 == 0 or m < hh._MM_SPLIT_MIN:
        return hh._mm(y, hh._sine_matrix(n, dt), axis, prec)
    sl = lambda a, lo, hi: jax.lax.slice_in_dim(a, lo, hi, axis=axis)
    yo = sl(y, 0, m)
    uf = hh._mm_t(yo, _odd_kernel2q(m, dt), axis, prec)
    um = jnp.sum(yo * hh._mid_signs(m, dt, axis, y.ndim), axis=axis,
                 keepdims=True)
    v = q_inv_levels(sl(y, m, n), axis, prec)
    return jnp.concatenate([uf + v, um, uf - v], axis=axis)


def q_inv(y, axis, prec):
    return _take(q_inv_levels(y, axis, prec),
                 _mirror_perm_inv(y.shape[axis]), axis)


# ---- harness --------------------------------------------------------

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
    a = ap.parse_args()
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((3, a.n, a.n)), jnp.float32)
    rows = [
        ("fwd2d flip", lambda c: hh._dst1_mm_packed(
            hh._dst1_mm_packed(c, -1, PREC), -2, PREC)),
        ("fwd2d take", lambda c: q_fwd(q_fwd(c, -1, PREC), -2, PREC)),
        ("inv2d flip", lambda c: hh._idst1_mm_packed(
            hh._idst1_mm_packed(c, -1, PREC), -2, PREC)),
        ("inv2d take", lambda c: q_inv(q_inv(c, -1, PREC), -2, PREC)),
    ]
    for name, fn in rows:
        print(f"{name}: {timed(fn, x, a.reps, a.inner):8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
