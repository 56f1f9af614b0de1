"""Re-measure the FFT-vs-matmul crossover and the radix-split depth
with the PRODUCTION packed scale-folded kernels (helmholtz.BoxHelmholtz
transform='matmul'), which are faster than the plain sine-matrix
variant the original tools/bench_solve.py --sweep used to pick
MATMUL_DST_MIN=1200 and _MM_SPLIT_MIN=1024.

Run: python tools/bench_packed_sweep.py [--sizes 959,1439,1919]
     [--splits 256,512,1024] [--reps 5] [--inner 4]
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

NM = 3


def sync(x):
    jax.block_until_ready(x)
    return float(jnp.ravel(x)[0])


def timed(solver, x, reps, inner):
    @jax.jit
    def loop(x):
        def body(c, _):
            return solver.solve(c), None
        out, _ = lax.scan(body, x, None, length=inner)
        return out

    with jax.enable_x64(False):
        out = loop(x)
        sync(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(loop(x))
            ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="959,1439,1919")
    ap.add_argument("--splits", default="256,512,1024")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--inner", type=int, default=4)
    args = ap.parse_args()

    from qgcm_tpu.solver import helmholtz as hh

    rdm2 = np.array([0.0, 2.4e-10, 1.1e-9])
    sizes = [int(s) for s in args.sizes.split(",")]
    splits = [int(s) for s in args.splits.split(",")]

    for n in sizes:                      # n = interior points per axis
        nxp = n + 2
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((NM, nxp, nxp)), jnp.float32)
        row = [f"n={n:5d}"]
        fft_solver = hh.make_box_helmholtz(
            nxp, nxp, 5e3, 5e3, rdm2, dtype=jnp.float32, transform="fft")
        dt = timed(fft_solver, x, args.reps, args.inner)
        row.append(f"fft {dt*1e3:7.2f}")
        # restore the module global afterwards: a solver built later in
        # this process must see the split depth its _split_perm assumed
        orig_split = hh._MM_SPLIT_MIN
        try:
            for sm in splits:
                hh._MM_SPLIT_MIN = sm
                solver = hh.make_box_helmholtz(
                    nxp, nxp, 5e3, 5e3, rdm2, dtype=jnp.float32,
                    transform="matmul")
                dt = timed(solver, x, args.reps, args.inner)
                row.append(f"mm[{sm}] {dt*1e3:7.2f}")
        finally:
            hh._MM_SPLIT_MIN = orig_split
        print("   ".join(row), flush=True)


if __name__ == "__main__":
    main()
