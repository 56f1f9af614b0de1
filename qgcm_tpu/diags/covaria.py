"""Covariance statistics -> covar.nc (reference src/covaria_diag.F).

The reference streams spatially-subsampled fields (block-subsampled
pressure layer 1 and mixed-layer temperature; tsampl/psampl
covaria_diag.F:359-494) through an incremental mean/SSP update (dssp,
AS12/AS41 algorithm, :496-600) and writes the packed covariance at the
end of the run.

TPU-native form: accumulate the count, the sum vector and the raw
second-moment matrix S = sum x x^T -- the outer products are a single
(nv x 1)(1 x nv) matmul per snapshot on the MXU -- and form
cov = (S - s s^T/n)/(n-1) at output time. Mathematically identical to
the reference's streaming update."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class CovAccum(NamedTuple):
    n: jnp.ndarray       # scalar count
    x0: jnp.ndarray      # (nv,) shift vector (first snapshot) --
                         # accumulating deviations avoids the
                         # catastrophic cancellation of raw moments
    s: jnp.ndarray       # (nv,) running sum of (x - x0)
    ssp: jnp.ndarray     # (nv, nv) running sum of outer products


def _subsample(field: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Block subsampling by stride (tsampl/psampl take every nscv-th
    point starting from the first)."""
    return field[..., ::stride, ::stride].reshape(-1)


def zero_cov(nv: int, dtype=jnp.float64) -> CovAccum:
    return CovAccum(n=jnp.zeros((), dtype),
                    x0=jnp.zeros((nv,), dtype),
                    s=jnp.zeros((nv,), dtype),
                    ssp=jnp.zeros((nv, nv), dtype))


def cov_size(ny: int, nx: int, stride: int) -> int:
    return len(range(0, ny, stride)) * len(range(0, nx, stride))


def accumulate_cov(acc: CovAccum, field: jnp.ndarray,
                   stride: int) -> CovAccum:
    x = _subsample(field, stride).astype(acc.s.dtype)
    x0 = jnp.where(acc.n == 0, x, acc.x0)
    d = x - x0
    return CovAccum(n=acc.n + 1.0, x0=x0, s=acc.s + d,
                    ssp=acc.ssp + jnp.outer(d, d))


def finalize_cov(acc: CovAccum):
    """-> (mean, covariance) as NumPy arrays (shift-invariant)."""
    n = float(acc.n)
    s = np.asarray(acc.s, np.float64)
    ssp = np.asarray(acc.ssp, np.float64)
    mean = np.asarray(acc.x0, np.float64) + s / max(n, 1.0)
    if n < 2:
        return mean, np.zeros_like(ssp)
    cov = (ssp - np.outer(s, s) / n) / (n - 1.0)
    return mean, cov


def write_covar(path: str, entries: dict):
    """entries: name -> (CovAccum, stride). Writes avg<name> and
    cov<name> in the covar.nc layout."""
    from ..io.ncdf import make_writer as NcWriter
    w = NcWriter(path)
    for name, acc in entries.items():
        mean, cov = finalize_cov(acc)
        nv = mean.shape[0]
        w.dim(f"nv{name}", nv)
        w.var(f"avg{name}", "d", (f"nv{name}",), data=mean)
        w.var(f"cov{name}", "f", (f"nv{name}", f"nv{name}"), data=cov)
    w.close()
