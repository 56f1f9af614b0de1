"""Spectral-solve roofline harness (VERDICT round-1 item 3).

Measures, on the real TPU chip, the Helmholtz-inversion transform
variants at the NAtl.1km scale (4801^2 x 3, f32) where round 1 found
the step solve-bound (0.44e9 updates/s vs 0.93e9 at 961^2):

  dst-fft      current production path (odd-extension rfft per axis)
  dst-fft-T    same, but FFT always along the LAST axis with explicit
               transposes (is XLA's non-contiguous FFT the problem?)
  rfft2        single 2-D rfft over the doubly-odd extension
  matmul-*     DST as a dense sine-matrix matmul on the MXU at
               precision DEFAULT (bf16) / HIGH (3-pass) / HIGHEST
               (6-pass), y-axis only and both axes
  hybrid       matmul-DST along y (contiguous-batch friendly) + odd
               extension rfft along x

plus HBM roofline context: bytes touched per solve and the implied
speed-of-light time at 819 GB/s (v5e).

Repetitions run INSIDE one jit via lax.scan (the tunnel adds ~30 ms
per dispatch) and timing materialises a value fetch (bench.py sync
convention). Accuracy of each variant is reported against a float64
CPU reference on a small grid plus self-consistency (roundtrip) at
full size.

Run: python tools/bench_solve.py [--n 4801] [--reps 8] [--small]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

HBM_BW = 819e9          # v5e HBM bandwidth, bytes/s
NM = 3                  # modes


def sync(x):
    jax.block_until_ready(x)
    return float(jnp.ravel(x)[0])


def timed(fn, x, ops, reps, inner):
    """Median wall time of fn applied `inner` times inside one jit.
    `ops` (sine matrix / denominator) ride as jit ARGUMENTS: a closure
    constant would be embedded in the program and serialized over the
    remote-compile tunnel (92 MB sine matrix at NAtl scale)."""

    @jax.jit
    def loop(x, *ops):
        def body(c, _):
            return fn(c, *ops), None
        out, _ = lax.scan(body, x, None, length=inner)
        return out

    with jax.enable_x64(False):
        out = loop(x, *ops)
        sync(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(loop(x, *ops))
            ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts))


# ----------------------------------------------------------------------
# Transform variants. All map (nm, N, N) interior -> itself (forward
# 2-D DST, divide by a denom, inverse 2-D DST), i.e. one full solve.
# ----------------------------------------------------------------------

def dst1(x, axis=-1):
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    zero = jnp.zeros(x.shape[:-1] + (1,), dtype=x.dtype)
    z = jnp.concatenate([zero, x, zero, -x[..., ::-1]], axis=-1)
    X = -jnp.fft.rfft(z, axis=-1).imag[..., 1:n + 1].astype(x.dtype)
    return jnp.moveaxis(X, -1, axis)


def make_denom(n, dtype):
    lam = 2.0 * (np.cos(np.pi * np.arange(1, n + 1) / (n + 1)) - 1.0)
    rdm2 = np.array([0.0, 1.0, 4.0])
    d = (lam[None, None, :] + lam[None, :, None] - rdm2[:, None, None])
    return jnp.asarray(1.0 / d, dtype)


def v_dst_fft(x, denom):
    norm = 1.0 / (2.0 * (x.shape[-1] + 1)) ** 2
    s = dst1(dst1(x, -1), -2) * denom
    return dst1(dst1(s, -1), -2) * norm


def v_dst_fft_T(x, denom):
    norm = 1.0 / (2.0 * (x.shape[-1] + 1)) ** 2

    def dst_last(f):
        return dst1(f, -1)

    def fwd(f):
        f = dst_last(f)
        f = jnp.swapaxes(f, -1, -2)
        f = dst_last(f)
        return jnp.swapaxes(f, -1, -2)

    return fwd(fwd(x) * denom) * norm


def v_rfft2(x, denom):
    """2-D DST via one 2-D real FFT of the doubly-odd extension."""
    n = x.shape[-1]
    m = 2 * (n + 1)
    norm = 1.0 / (2.0 * (n + 1)) ** 2

    def dst2d(f):
        z = jnp.zeros(f.shape[:-2] + (m, m), f.dtype)
        z = z.at[..., 1:n + 1, 1:n + 1].set(f)
        z = z.at[..., 1:n + 1, n + 2:].set(-f[..., :, ::-1])
        z = z.at[..., n + 2:, 1:n + 1].set(-f[..., ::-1, :])
        z = z.at[..., n + 2:, n + 2:].set(f[..., ::-1, ::-1])
        F = jnp.fft.rfft2(z)
        return -F[..., 1:n + 1, 1:n + 1].real.astype(f.dtype)

    return dst2d(dst2d(x) * denom) * norm


def sine_matrix(n, dtype):
    j = np.arange(1, n + 1)
    S = 2.0 * np.sin(np.pi * np.outer(j, j) / (n + 1))
    return jnp.asarray(S, dtype)


def v_matmul(prec, x, denom, S):
    n = x.shape[-1]
    norm = 1.0 / (2.0 * (n + 1)) ** 2

    def dst2d(f):
        f = jnp.einsum("kj,mji->mki", S, f, precision=prec)
        return jnp.einsum("li,mki->mkl", S, f, precision=prec)

    return dst2d(dst2d(x) * denom) * norm


def v_hybrid(prec, x, denom, S):
    """matmul-DST along y + odd extension rfft along x."""
    n = x.shape[-1]
    norm = 1.0 / (2.0 * (n + 1)) ** 2

    def dst2d(f):
        f = jnp.einsum("kj,mji->mki", S, f, precision=prec)
        return dst1(f, -1)

    return dst2d(dst2d(x) * denom) * norm


def build_variants(n, dtype):
    """Returns name -> (fn, needs_S). fn(x, denom[, S])."""
    P = lax.Precision
    return {
        "dst-fft": (v_dst_fft, False),
        "dst-fft-T": (v_dst_fft_T, False),
        "rfft2": (v_rfft2, False),
        "matmul-default": (functools.partial(v_matmul, P.DEFAULT), True),
        "matmul-high": (functools.partial(v_matmul, P.HIGH), True),
        "matmul-highest": (functools.partial(v_matmul, P.HIGHEST), True),
        "hybrid-high": (functools.partial(v_hybrid, P.HIGH), True),
        "hybrid-highest": (functools.partial(v_hybrid, P.HIGHEST), True),
    }


def accuracy(n=257):
    """Relative error of each variant vs a float64 NumPy dense solve."""
    rng = np.random.default_rng(0)
    x64 = rng.standard_normal((NM, n, n))
    lam = 2.0 * (np.cos(np.pi * np.arange(1, n + 1) / (n + 1)) - 1.0)
    rdm2 = np.array([0.0, 1.0, 4.0])
    d = 1.0 / (lam[None, None, :] + lam[None, :, None]
               - rdm2[:, None, None])
    Sn = 2.0 * np.sin(np.pi * np.outer(np.arange(1, n + 1),
                                       np.arange(1, n + 1)) / (n + 1))
    ref = Sn @ ((Sn @ x64 @ Sn) * d) @ Sn / (2.0 * (n + 1)) ** 2

    out = {}
    x32 = jnp.asarray(x64, jnp.float32)
    denom = make_denom(n, jnp.float32)
    S = sine_matrix(n, jnp.float32)
    with jax.enable_x64(False):
        for name, (fn, needs_S) in build_variants(n, jnp.float32).items():
            ops = (denom, S) if needs_S else (denom,)
            got = np.asarray(jax.jit(fn)(x32, *ops), np.float64)
            out[name] = float(np.abs(got - ref).max()
                              / np.abs(ref).max())
    return out


def sweep(sizes, reps, inner):
    """FFT vs matmul crossover: time the two production candidates
    across grid sizes."""
    print("\n== crossover sweep: dst-fft vs matmul-highest/high ==")
    for n in sizes:
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((NM, n, n)), jnp.float32)
        denom = make_denom(n, jnp.float32)
        S = sine_matrix(n, jnp.float32)
        row = [f"  n={n:5d}"]
        for name, fn, ops in (
                ("dst-fft", v_dst_fft, (denom,)),
                ("mm-highest",
                 functools.partial(v_matmul, lax.Precision.HIGHEST),
                 (denom, S)),
                ("mm-high",
                 functools.partial(v_matmul, lax.Precision.HIGH),
                 (denom, S))):
            dt = timed(fn, x, ops, reps, inner)
            row.append(f"{name} {dt*1e3:8.2f} ms")
        print("   ".join(row))


def fft_roofline(reps, inner):
    """Raw XLA rfft throughput at assorted lengths (the library
    speed-of-light context for BENCHMARKS.md)."""
    print("\n== raw rfft: (14397, L) f32, effective GB/s of the "
          "input ==")
    for L in (4800, 8192, 9600, 9604, 16384):
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((14397, L)),
            jnp.float32)

        def f(c):
            return jnp.fft.irfft(jnp.fft.rfft(c, axis=-1),
                                 n=L, axis=-1)

        dt = timed(lambda c: f(c), x, (), reps, inner) / 2  # per xform
        gbs = x.size * 4 / dt / 1e9
        print(f"  L={L:6d}  {dt*1e3:8.2f} ms/transform  "
              f"{gbs:7.1f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4799,
                    help="interior size (4799 = NAtl 4801 p-grid)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--inner", type=int, default=4)
    ap.add_argument("--acc-only", action="store_true")
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--fft-roofline", action="store_true",
                    dest="fft_roofline")
    args = ap.parse_args()

    if args.sweep:
        sweep((959, 1439, 1919, 2879, 3839, 4799), args.reps,
              args.inner)
        return
    if args.fft_roofline:
        fft_roofline(args.reps, args.inner)
        return

    print("== accuracy vs f64 dense solve (257^2) ==")
    for name, err in accuracy().items():
        print(f"  {name:16s} rel err {err:.2e}")
    if args.acc_only:
        return

    n = args.n
    nbytes = NM * n * n * 4
    print(f"\n== solve timing: ({NM},{n},{n}) f32 on "
          f"{jax.devices()[0].device_kind}; {nbytes/1e9:.2f} GB/field, "
          f"HBM floor (2 passes r+w) "
          f"{4*nbytes/HBM_BW*1e3:.1f} ms ==")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((NM, n, n)), jnp.float32)
    denom = make_denom(n, jnp.float32)
    S = sine_matrix(n, jnp.float32)
    rows = {}
    for name, (fn, needs_S) in build_variants(n, jnp.float32).items():
        ops = (denom, S) if needs_S else (denom,)
        try:
            dt = timed(fn, x, ops, args.reps, args.inner)
        except Exception as e:
            print(f"  {name:16s} FAILED: {str(e)[:120]}")
            continue
        rows[name] = dt
        print(f"  {name:16s} {dt*1e3:8.2f} ms/solve")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
