"""Solution validity scan (reference src/valsubs.F valids).

Range-checks the prognostic and forcing fields against the reference's
hard limits (valsubs.F:77-81) and checks full perturbed layer
thicknesses against thkmin with a bad-point-percentage criterion
(valsubs.F:93-98). Designed to run on-device and return one scalar
ok-flag plus the extrema; the host decides whether to dump and abort
(fail-fast with post-mortem artifacts, q-gcm.F:1278-1322).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

# Hard limits (valsubs.F:77-81)
TAUEXT = 10.0     # |tau| (m^2 s^-2)
WTAEXT = 1.0      # |wekta| (m/s)
WTOEXT = 1.0e-3   # |wekto| (m/s)
ASTEXT = 90.0     # |ast| (K)
PATEXT = 1.0e7    # |pa| (m^2 s^-2)
QATEXT = 0.05     # |qa| (s^-1)
SSTEXT = 75.0     # |sst| (K)
POCEXT = 1.0e4    # |po| (m^2 s^-2)
QOCEXT = 0.05     # |qo| (s^-1)
THKMIN = 100.0    # min acceptable ocean layer thickness (m)
CRITPC = 20.0     # max acceptable % of too-thin points


class ValidityReport(NamedTuple):
    ok: jnp.ndarray          # scalar bool
    pomax: jnp.ndarray
    qomax: jnp.ndarray
    sstmax: jnp.ndarray
    wektomax: jnp.ndarray
    pamax: jnp.ndarray
    qamax: jnp.ndarray
    astmax: jnp.ndarray
    wektamax: jnp.ndarray
    taumax: jnp.ndarray
    thinpc: jnp.ndarray      # % of thin ocean points (worst interface)


def _absmax(x) -> jnp.ndarray:
    return jnp.max(jnp.abs(x))


def valids(model, ocean=None, atmos=None, oc_forcing=None,
           at_forcing=None) -> ValidityReport:
    cfg = model.cfg
    z = jnp.zeros(())
    ok = jnp.array(True)

    pomax = qomax = sstmax = wektomax = thinpc = z
    pamax = qamax = astmax = wektamax = taumax = z

    def finite_and(ok, x, lim):
        m = _absmax(x)
        return ok & jnp.isfinite(m) & (m < lim), m

    if ocean is not None:
        ok, pomax = finite_and(ok, ocean.po, POCEXT)
        ok, qomax = finite_and(ok, ocean.qo, QOCEXT)
        ok, sstmax = finite_and(ok, ocean.sst, SSTEXT)
        if oc_forcing is not None:
            ok, wektomax = finite_and(ok, oc_forcing.wekto, WTOEXT)
        # full layer thickness check (valsubs.F:93-98):
        # h_k = hoc(k) + eta(k-1) - eta(k), eta = (p(k+1)-p(k))/gp(k),
        # bottom layer also loses the topography height.
        gp = jnp.asarray(cfg.ocean.gpoc, dtype=ocean.po.dtype)
        hoc = jnp.asarray(cfg.ocean.hoc, dtype=ocean.po.dtype)
        eta = (ocean.po[1:] - ocean.po[:-1]) / gp[:, None, None]
        etup = jnp.concatenate([jnp.zeros_like(eta[:1]), eta], axis=0)
        etdn = jnp.concatenate([eta, jnp.zeros_like(eta[:1])], axis=0)
        thick = hoc[:, None, None] + etup - etdn
        thick = thick.at[-1].add(
            -jnp.asarray(model.topo.dtopoc, dtype=thick.dtype))
        frac_thin = 100.0 * jnp.mean(
            jnp.where(thick < THKMIN, 1.0, 0.0), axis=(1, 2))
        thinpc = jnp.max(frac_thin)
        ok = ok & (thinpc <= CRITPC)

    if atmos is not None:
        ok, pamax = finite_and(ok, atmos.pa, PATEXT)
        ok, qamax = finite_and(ok, atmos.qa, QATEXT)
        ok, astmax = finite_and(ok, atmos.ast, ASTEXT)
        if at_forcing is not None:
            ok, wektamax = finite_and(ok, at_forcing.wekta, WTAEXT)
            ok, taumax = finite_and(
                ok, jnp.maximum(_absmax(at_forcing.tauxa),
                                _absmax(at_forcing.tauya)), TAUEXT)

    return ValidityReport(ok=ok, pomax=pomax, qomax=qomax, sstmax=sstmax,
                          wektomax=wektomax, pamax=pamax, qamax=qamax,
                          astmax=astmax, wektamax=wektamax,
                          taumax=taumax, thinpc=thinpc)
