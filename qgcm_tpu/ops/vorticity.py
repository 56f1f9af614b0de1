"""Potential vorticity from dynamic pressure (equation 7.15).

Replaces reference src/vorsubs.F. Fields are (nl, nyp, nxp).

  q = (1/f0) del^2 p + beta*y - f0 * (A @ p) [ + ddyn in layer kbot ]

qcomp fills the interior (plus periodic meridional boundaries in the
cyclic case, folding in the reference's separate `merqcy`); ocqbdy /
atqzbd fill the solid boundaries where the tangential derivative
vanishes and the normal derivative obeys the mixed condition.
"""

from __future__ import annotations

import jax.numpy as jnp

from .stencils import _wshift, _eshift, interior_5pt


def _apply_amat(amat: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(A @ p) over the layer axis: amat (nl,nl), p (nl, ny, nx)."""
    return jnp.einsum("kl,lyx->kyx", amat, p, precision="highest")


def qcomp(p: jnp.ndarray, amat: jnp.ndarray, yprel: jnp.ndarray,
          dxm2: float, fnot: float, beta: float,
          ddyn: jnp.ndarray, kbot: int, cyclic: bool) -> jnp.ndarray:
    """PV at internal points (src/vorsubs.F:49-138; merqcy :142-239 is
    the cyclic-x case, handled here by wraparound). Zonal boundary rows
    (and box meridional columns) are left zero for ocqbdy/atqzbd."""
    betay = (beta * yprel)[None, :, None]
    ap = _apply_amat(amat, p)
    q = jnp.zeros_like(p)
    if cyclic:
        pw, pe = _wshift(p), _eshift(p)
        lap = dxm2 * (p[:, :-2, :] + p[:, 2:, :]
                      + pw[:, 1:-1, :] + pe[:, 1:-1, :]
                      - 4.0 * p[:, 1:-1, :])
        q = q.at[:, 1:-1, :].set(
            lap / fnot + betay[:, 1:-1, :] - fnot * ap[:, 1:-1, :])
        q = q.at[kbot, 1:-1, :].add(ddyn[1:-1, :])
    else:
        lap = interior_5pt(p, dxm2)
        q = q.at[:, 1:-1, 1:-1].set(
            lap / fnot + betay[:, 1:-1, :] - fnot * ap[:, 1:-1, 1:-1])
        q = q.at[kbot, 1:-1, 1:-1].add(ddyn[1:-1, 1:-1])
    return q


def _mixed_bc_q(q, p, ap, bcfac_f, betay, ddyn, kbot, fnot):
    """Fill zonal boundary rows with the mixed-BC PV relation."""
    q = q.at[:, 0, :].set(
        bcfac_f * (p[:, 1, :] - p[:, 0, :]) - fnot * ap[:, 0, :]
        + betay[0])
    q = q.at[:, -1, :].set(
        bcfac_f * (p[:, -2, :] - p[:, -1, :]) - fnot * ap[:, -1, :]
        + betay[-1])
    q = q.at[kbot, 0, :].add(ddyn[0, :])
    q = q.at[kbot, -1, :].add(ddyn[-1, :])
    return q


def ocqbdy(q: jnp.ndarray, p: jnp.ndarray, amat: jnp.ndarray,
           yprel: jnp.ndarray, dxm2: float, fnot: float, beta: float,
           bcco: float, ddyn: jnp.ndarray, cyclic: bool) -> jnp.ndarray:
    """Oceanic solid-boundary PV (src/vorsubs.F:245-388). Topography
    lives in the BOTTOM layer (kbot = nlo-1). Fills zonal boundaries,
    and meridional boundaries too in the box case."""
    bcfac_f = bcco * dxm2 / (0.5 * bcco + 1.0) / fnot
    betay = beta * yprel
    ap = _apply_amat(amat, p)
    q = _mixed_bc_q(q, p, ap, bcfac_f, betay, ddyn, -1, fnot)
    if not cyclic:
        # meridional boundaries, rows 1..ny-2 (corners already done)
        bw = (bcfac_f * (p[:, 1:-1, 1] - p[:, 1:-1, 0])
              - fnot * ap[:, 1:-1, 0] + betay[None, 1:-1])
        be = (bcfac_f * (p[:, 1:-1, -2] - p[:, 1:-1, -1])
              - fnot * ap[:, 1:-1, -1] + betay[None, 1:-1])
        q = q.at[:, 1:-1, 0].set(bw)
        q = q.at[:, 1:-1, -1].set(be)
        q = q.at[-1, 1:-1, 0].add(ddyn[1:-1, 0])
        q = q.at[-1, 1:-1, -1].add(ddyn[1:-1, -1])
    return q


def atqzbd(q: jnp.ndarray, p: jnp.ndarray, amat: jnp.ndarray,
           yprel: jnp.ndarray, dxm2: float, fnot: float, beta: float,
           bcco: float, ddyn: jnp.ndarray) -> jnp.ndarray:
    """Atmospheric zonal-boundary PV (src/vorsubs.F:396-480).
    Topography lives in the BOTTOM layer, which for the atmosphere is
    layer index 0.

    Note: the reference has an apparent typo at src/vorsubs.F:470
    (uses pa(i,2,nla) where every analogous line uses the boundary row);
    we implement the consistent formula."""
    bcfac_f = bcco * dxm2 / (0.5 * bcco + 1.0) / fnot
    betay = beta * yprel
    ap = _apply_amat(amat, p)
    return _mixed_bc_q(q, p, ap, bcfac_f, betay, ddyn, 0, fnot)


def merqcy(q: jnp.ndarray, p: jnp.ndarray, amat: jnp.ndarray,
           yprel: jnp.ndarray, dxm2: float, fnot: float, beta: float,
           ddyn: jnp.ndarray, kbot: int) -> jnp.ndarray:
    """Periodic meridional-boundary PV (src/vorsubs.F:142-239).
    Provided for API parity; qcomp(cyclic=True) already computes these
    columns via wraparound."""
    betay = (beta * yprel)[None, 1:-1]
    ap = _apply_amat(amat, p[:, :, [0, 1, -2]])
    lap = dxm2 * (p[:, :-2, 0] + p[:, 2:, 0] + p[:, 1:-1, -2]
                  + p[:, 1:-1, 1] - 4.0 * p[:, 1:-1, 0])
    qw = lap / fnot + betay - fnot * ap[:, 1:-1, 0]
    qw = qw.at[kbot].add(ddyn[1:-1, 0])
    q = q.at[:, 1:-1, 0].set(qw)
    q = q.at[:, 1:-1, -1].set(qw)
    return q
