"""Finite-difference stencils on the C-grid p-array.

Array convention throughout the package: fields are [..., y, x]
(x last = TPU lane dimension). A p-grid field has shape (..., nyp, nxp).
In the cyclic (channel) case column x=nxp-1 duplicates column x=0.

These are pure jnp ops; XLA fuses the shifted-slice arithmetic into a
single VPU pass. A Pallas fused variant of the hot combination
(Jacobian + del4/del6) lives in qgcm_tpu/ops/pallas_kernels.py.

Reference semantics:
  del2_bc     -- src/qgosubs.F:94-127 (mixed BCs via bcfac, or cyclic-x)
  jacobian9   -- Arakawa 9-point energy/enstrophy-conserving J(q,p),
                 src/qgosubs.F:374-389 (interior), :354-368 (cyclic west)
"""

from __future__ import annotations

import jax.numpy as jnp


def _wshift(f: jnp.ndarray) -> jnp.ndarray:
    """x-west neighbour for a cyclic p-array (column -1 duplicates 0):
    west of column 0 is column nx-2 (= nxp-2)."""
    return jnp.concatenate([f[..., -2:-1], f[..., :-1]], axis=-1)


def _eshift(f: jnp.ndarray) -> jnp.ndarray:
    """x-east neighbour for a cyclic p-array: east of column nxp-1
    (duplicate of 0) is column 1."""
    return jnp.concatenate([f[..., 1:], f[..., 1:2]], axis=-1)


def interior_5pt(f: jnp.ndarray, dxm2: float) -> jnp.ndarray:
    """5-point Laplacian on the interior; returns (..., ny-2, nx-2)."""
    return dxm2 * (f[..., :-2, 1:-1] + f[..., 2:, 1:-1]
                   + f[..., 1:-1, :-2] + f[..., 1:-1, 2:]
                   - 4.0 * f[..., 1:-1, 1:-1])


def del2_bc(p: jnp.ndarray, bcfac: float, dxm2: float,
            cyclic: bool) -> jnp.ndarray:
    """Laplacian of a p-field with mixed boundary conditions.

    On solid boundaries the tangential second derivative vanishes
    (p constant along the wall) and the normal second derivative is the
    mixed condition bcfac*(p_inner - p_wall) (src/qgosubs.F:96-126).
    Box: all four walls solid. Cyclic: W/E periodic, N/S solid.
    Output has the same shape as p.
    """
    out = jnp.zeros_like(p)
    if cyclic:
        # rows 1..ny-2, all columns, with x-wraparound
        pw, pe = _wshift(p), _eshift(p)
        lap = dxm2 * (p[..., :-2, :] + p[..., 2:, :]
                      + pw[..., 1:-1, :] + pe[..., 1:-1, :]
                      - 4.0 * p[..., 1:-1, :])
        out = out.at[..., 1:-1, :].set(lap)
    else:
        lap = interior_5pt(p, dxm2)
        out = out.at[..., 1:-1, 1:-1].set(lap)
        # W/E mixed boundaries (rows 1..ny-2)
        out = out.at[..., 1:-1, 0].set(
            bcfac * (p[..., 1:-1, 1] - p[..., 1:-1, 0]))
        out = out.at[..., 1:-1, -1].set(
            bcfac * (p[..., 1:-1, -2] - p[..., 1:-1, -1]))
    # N/S mixed boundaries (all columns, incl. corners)
    out = out.at[..., 0, :].set(bcfac * (p[..., 1, :] - p[..., 0, :]))
    out = out.at[..., -1, :].set(bcfac * (p[..., -2, :] - p[..., -1, :]))
    return out


def jacobian9(q: jnp.ndarray, p: jnp.ndarray, cyclic: bool) -> jnp.ndarray:
    """Arakawa 9-point Jacobian sum J(q,p)*(12 dx dy) (unscaled; multiply
    by adfac = 1/(12 dx dy f0) for the PV tendency contribution).

    Interior formula src/qgosubs.F:378-388. Zonal boundary rows are left
    zero (updated later from the boundary PV relations). In the box case
    the W/E columns are zero; in the cyclic case they use wraparound.
    Output has the same shape as q/p.
    """
    if cyclic:
        qw, qe = _wshift(q), _eshift(q)
        pw, pe = _wshift(p), _eshift(p)

        def mid(f):
            return f[..., 1:-1, :]

        def nn(f):
            return f[..., 2:, :]

        def ss(f):
            return f[..., :-2, :]

        jac = (
            (mid(qe) - mid(qw)) * (nn(p) - ss(p))
            + (ss(q) - nn(q)) * (mid(pe) - mid(pw))
            + mid(qe) * (nn(pe) - ss(pe))
            - mid(qw) * (nn(pw) - ss(pw))
            - nn(q) * (nn(pe) - nn(pw))
            + ss(q) * (ss(pe) - ss(pw))
            + nn(p) * (nn(qe) - nn(qw))
            - ss(p) * (ss(qe) - ss(qw))
            - mid(pe) * (nn(qe) - ss(qe))
            + mid(pw) * (nn(qw) - ss(qw))
        )
        out = jnp.zeros_like(q)
        out = out.at[..., 1:-1, :].set(jac)
        return out

    # box: interior only
    def c(f):
        return f[..., 1:-1, 1:-1]

    def e(f):
        return f[..., 1:-1, 2:]

    def w(f):
        return f[..., 1:-1, :-2]

    def n(f):
        return f[..., 2:, 1:-1]

    def s(f):
        return f[..., :-2, 1:-1]

    def ne(f):
        return f[..., 2:, 2:]

    def nw(f):
        return f[..., 2:, :-2]

    def se(f):
        return f[..., :-2, 2:]

    def sw(f):
        return f[..., :-2, :-2]

    jac = (
        (e(q) - w(q)) * (n(p) - s(p))
        + (s(q) - n(q)) * (e(p) - w(p))
        + e(q) * (ne(p) - se(p))
        - w(q) * (nw(p) - sw(p))
        - n(q) * (ne(p) - nw(p))
        + s(q) * (se(p) - sw(p))
        + n(p) * (ne(q) - nw(q))
        - s(p) * (se(q) - sw(q))
        - e(p) * (ne(q) - se(q))
        + w(p) * (nw(q) - sw(q))
    )
    out = jnp.zeros_like(q)
    out = out.at[..., 1:-1, 1:-1].set(jac)
    return out
