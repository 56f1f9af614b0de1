"""Modified-Helmholtz solvers for the PV inversion.

The reference (src/ocisubs.F:415-618, src/atisubs.F:301-400) solves
  del^2(p) - rdm2 * p = rhs          (5-point FD Laplacian)
with p = 0 on zonal boundaries (and meridional boundaries in the box
case; periodic-x in the channel case) by an x-transform (DST-I for the
box, real FFT for the channel) followed by a *sequential* Thomas solve
along y for every wavenumber.

TPU-native redesign: the y-direction tridiagonal has CONSTANT
coefficients (off-diagonal 1/dy^2, diagonal depending only on the x
wavenumber), so it is itself diagonalised by a DST-I in y. We therefore
do a full 2-D transform solve:

    p = T^-1 [ T(rhs) / (lam_x + lam_y - rdm2) ]

with lam_x(k) = 2/dx^2 (cos(k pi/nx) - 1)        (box, DST-I)
            or  2/dx^2 (cos(2 pi k/nx) - 1)       (channel, RFFT)
and  lam_y(l) = 2/dy^2 (cos(l pi/ny) - 1)         (DST-I, Dirichlet).

This is the SAME discrete solution (exact arithmetic) as the reference's
transform+tridiagonal method, but is entirely batched transforms --
no sequential y recurrence, which would serialise ~1000 tiny steps on
TPU. Transforms batch over modes and solve both fluids' inversions in
one fused jit region.

A Thomas-algorithm variant (`thomas_solve`) is retained for
cross-validation in the test suite.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def dst1(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Unnormalised type-I discrete sine transform along `axis`.

    X_k = 2 * sum_{j=1..N} x_j sin(pi j k / (N+1)),  k = 1..N
    (FFTPACK `dsint` convention, so dst1(dst1(x)) == 2*(N+1)*x.)

    Implemented via an odd extension of length 2(N+1) and a real FFT --
    XLA lowers this to its batched FFT, which is efficient on TPU.
    """
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    zero = jnp.zeros(x.shape[:-1] + (1,), dtype=x.dtype)
    z = jnp.concatenate([zero, x, zero, -x[..., ::-1]], axis=-1)
    X = -jnp.fft.rfft(z, axis=-1).imag[..., 1 : n + 1].astype(x.dtype)
    return jnp.moveaxis(X, -1, axis)


def dst1_np(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """NumPy twin of `dst1` for host-side (init-time) solves -- model
    initialisation must never compile f64 FFTs for the TPU backend."""
    x = np.moveaxis(np.asarray(x, dtype=np.float64), axis, -1)
    n = x.shape[-1]
    z = np.zeros(x.shape[:-1] + (2 * (n + 1),), dtype=np.float64)
    z[..., 1:n + 1] = x
    z[..., n + 2:] = -x[..., ::-1]
    X = -np.fft.rfft(z, axis=-1).imag[..., 1:n + 1]
    return np.moveaxis(X, -1, axis)


def thomas_solve(diag: jnp.ndarray, offdiag: float, rhs: jnp.ndarray):
    """Sequential tridiagonal solve along axis -2 (y), vectorised over the
    trailing axis. diag: (..., nx) per-column constant diagonal;
    rhs: (..., ny, nx). Used only for validating the spectral solver."""

    def fwd(carry, r):
        betinv, u_prev = carry
        gam = offdiag * betinv
        betinv_new = 1.0 / (diag - offdiag * gam)
        u = (r - offdiag * u_prev) * betinv_new
        return (betinv_new, u), (gam, u)

    betinv0 = 1.0 / diag
    u0 = rhs[..., 0, :] * betinv0
    (_, _), (gams, us) = jax.lax.scan(
        fwd, (betinv0, u0), jnp.moveaxis(rhs[..., 1:, :], -2, 0))
    us = jnp.concatenate([u0[None], us], axis=0)
    gams = jnp.concatenate([jnp.zeros_like(u0)[None], gams], axis=0)

    def bwd(u_next, inp):
        g_next, u = inp
        u_new = u - g_next * u_next
        return u_new, u_new

    _, xs = jax.lax.scan(
        bwd, us[-1], (gams[1:][::-1], us[:-1][::-1]))
    sol = jnp.concatenate([xs[::-1], us[-1][None]], axis=0)
    return jnp.moveaxis(sol, 0, -2)


@dataclass(frozen=True)
class BoxHelmholtz:
    """Solver for the finite-box domain (Dirichlet on all boundaries).

    Grid: p-array of shape (nyp, nxp); interior unknowns are
    (nyp-2) x (nxp-2) = (ny-1) x (nx-1) where nx=nxp-1 cells.
    """

    nxp: int
    nyp: int
    lamx: jnp.ndarray        # (nxp-2,) x-eigenvalues
    lamy: jnp.ndarray        # (nyp-2,)
    rdm2: jnp.ndarray        # (nm,)
    gx: jnp.ndarray          # (nxp-2,) DST of the ones vector
    gy: jnp.ndarray          # (nyp-2,)
    norm: float              # combined inverse-transform normalisation
    denom_inv_np: np.ndarray = None   # float64 host copy (init-time solves)

    # The spectral denominators are recomputed on the fly from the O(N)
    # eigenvalue vectors: a (nm, ny, nx) closure constant would be
    # embedded in the compiled program (hundreds of MB at NAtl.1km
    # scale, which also overflows remote-compile payload limits).
    def _denom(self):
        return (self.lamx[None, None, :] + self.lamy[None, :, None]
                - self.rdm2[:, None, None])

    def forward(self, rhs: jnp.ndarray) -> jnp.ndarray:
        """Interior 2-D DST of a p-grid field."""
        return dst1(dst1(rhs[..., 1:-1, 1:-1], axis=-1), axis=-2)

    def inverse(self, spec: jnp.ndarray) -> jnp.ndarray:
        sol = dst1(dst1(spec, axis=-1), axis=-2) * self.norm
        return jnp.pad(sol, [(0, 0)] * (spec.ndim - 2) + [(1, 1), (1, 1)])

    def solve_spec(self, rhs: jnp.ndarray) -> jnp.ndarray:
        """Forward transform + denominator division (no inverse)."""
        return self.forward(rhs) / self._denom()

    def solve(self, rhs: jnp.ndarray) -> jnp.ndarray:
        """rhs: (nm, nyp, nxp); returns solution with zero boundaries."""
        return self.inverse(self.solve_spec(rhs))

    def solve_np(self, rhs: np.ndarray) -> np.ndarray:
        """Host-side float64 solve (model initialisation only)."""
        rhs = np.asarray(rhs, dtype=np.float64)
        interior = rhs[..., 1:-1, 1:-1]
        spec = dst1_np(dst1_np(interior, axis=-1), axis=-2)
        spec = spec * self.denom_inv_np
        sol = dst1_np(dst1_np(spec, axis=-1), axis=-2) * self.norm
        return np.pad(sol, [(0, 0)] * (rhs.ndim - 2) + [(1, 1), (1, 1)])


@dataclass(frozen=True)
class CyclicHelmholtz:
    """Solver for the zonally periodic channel (Dirichlet N/S).

    Grid: p-array of shape (nyp, nxp) where column nxp-1 duplicates
    column 0 (cyclic). The transform works on the nx = nxp-1 distinct
    columns; the output repeats column 0 at the east edge.
    """

    nxp: int
    nyp: int
    lamx: jnp.ndarray        # (nx//2+1,) rfft eigenvalues
    lamy: jnp.ndarray        # (nyp-2,)
    rdm2: jnp.ndarray        # (nm,)
    norm: float
    denom_inv_np: np.ndarray = None   # float64 host copy (init-time solves)

    def _denom(self):
        return (self.lamx[None, None, :] + self.lamy[None, :, None]
                - self.rdm2[:, None, None])

    def solve(self, rhs: jnp.ndarray) -> jnp.ndarray:
        # The x-RFFT and y-DST commute; doing the DST on the REAL field
        # before/after the complex x-transform needs 2 real sine
        # transforms instead of 4 on split real/imag parts (measured
        # ~3x on the 4608x576 southern-ocean channel).
        nx = self.nxp - 1
        interior = rhs[..., 1:-1, :nx]
        sy = dst1(interior, axis=-2)
        spec = jnp.fft.rfft(sy, axis=-1)
        spec = spec / self._denom()
        sy = jnp.fft.irfft(spec, n=nx, axis=-1).astype(rhs.dtype)
        sol = dst1(sy, axis=-2) * self.norm
        sol = jnp.concatenate([sol, sol[..., :1]], axis=-1)
        return jnp.pad(sol, [(0, 0)] * (rhs.ndim - 2) + [(1, 1), (0, 0)])

    def solve_np(self, rhs: np.ndarray) -> np.ndarray:
        """Host-side float64 solve (model initialisation only)."""
        rhs = np.asarray(rhs, dtype=np.float64)
        nx = self.nxp - 1
        interior = rhs[..., 1:-1, :nx]
        spec = np.fft.rfft(interior, axis=-1)
        spec = dst1_np(spec.real, axis=-2) + 1j * dst1_np(spec.imag, axis=-2)
        spec = spec * self.denom_inv_np
        spec = dst1_np(spec.real, axis=-2) + 1j * dst1_np(spec.imag, axis=-2)
        sol = np.fft.irfft(spec, n=nx, axis=-1) * self.norm
        sol = np.concatenate([sol, sol[..., :1]], axis=-1)
        return np.pad(sol, [(0, 0)] * (rhs.ndim - 2) + [(1, 1), (0, 0)])


def make_box_helmholtz(nxp: int, nyp: int, dx: float, dy: float,
                       rdm2: np.ndarray, dtype=jnp.float64) -> BoxHelmholtz:
    """rdm2: (nm,) vector of 1/Rd^2 values (0 for barotropic)."""
    nx, ny = nxp - 1, nyp - 1
    k = np.arange(1, nx)                       # x wavenumbers (DST-I)
    l = np.arange(1, ny)                       # y wavenumbers (DST-I)
    lamx = 2.0 / dx**2 * (np.cos(np.pi * k / nx) - 1.0)
    lamy = 2.0 / dy**2 * (np.cos(np.pi * l / ny) - 1.0)
    denom = (lamx[None, None, :] + lamy[None, :, None]
             - np.asarray(rdm2)[:, None, None])
    norm = 1.0 / (2.0 * nx) / (2.0 * ny)
    # DST-I of the ones vector: g[k] = 2 sum_j sin(pi j k/(N+1))
    gx = dst1_np(np.ones((1, nx - 1)))[0]
    gy = dst1_np(np.ones((1, ny - 1)))[0]
    return BoxHelmholtz(nxp=nxp, nyp=nyp,
                        lamx=np.asarray(lamx, dtype=dtype),
                        lamy=np.asarray(lamy, dtype=dtype),
                        rdm2=np.asarray(rdm2, dtype=dtype),
                        gx=np.asarray(gx, dtype=dtype),
                        gy=np.asarray(gy, dtype=dtype),
                        norm=norm, denom_inv_np=1.0 / denom)


def make_cyclic_helmholtz(nxp: int, nyp: int, dx: float, dy: float,
                          rdm2: np.ndarray,
                          dtype=jnp.float64) -> CyclicHelmholtz:
    nx, ny = nxp - 1, nyp - 1
    k = np.arange(nx // 2 + 1)                 # rfft wavenumbers
    l = np.arange(1, ny)
    lamx = 2.0 / dx**2 * (np.cos(2.0 * np.pi * k / nx) - 1.0)
    lamy = 2.0 / dy**2 * (np.cos(np.pi * l / ny) - 1.0)
    denom = (lamx[None, None, :] + lamy[None, :, None]
             - np.asarray(rdm2)[:, None, None])
    norm = 1.0 / (2.0 * ny)                    # rfft/irfft self-normalising
    return CyclicHelmholtz(nxp=nxp, nyp=nyp,
                           lamx=np.asarray(lamx, dtype=dtype),
                           lamy=np.asarray(lamy, dtype=dtype),
                           rdm2=np.asarray(rdm2, dtype=dtype),
                           norm=norm, denom_inv_np=1.0 / denom)
