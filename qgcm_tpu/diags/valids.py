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

import jax
import jax.numpy as jnp
import numpy as np

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
        thick = _ocean_thickness(cfg, ocean.po,
                                 jnp.asarray(model.topo.dtopoc))
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


# ----------------------------------------------------------------------
# Post-mortem neighbourhood dumps (scan2D/scan3D, valsubs.F:631-744)
# ----------------------------------------------------------------------

_JWID, _IWID = 4, 3     # rows j+-4, cols i+-3 around the extremum


def _locate(x, take_min=False):
    """(value, layer, j, i, patch) of the extremum of x: |max| by
    default, plain minimum for the thickness scan. One argmax + one
    clamped dynamic_slice -- a single cheap jitted reduction, run only
    on the failure path. The patch window is shifted (not shrunk) at
    domain edges."""
    field = x if x.ndim == 3 else x[None]
    score = -field if take_min else jnp.abs(field)
    flat = jnp.argmax(score)
    k, j, i = jnp.unravel_index(flat, field.shape)
    ny, nx = field.shape[-2:]
    pj = 2 * _JWID + 1 if ny >= 2 * _JWID + 1 else ny
    pi = 2 * _IWID + 1 if nx >= 2 * _IWID + 1 else nx
    j0 = jnp.clip(j - _JWID, 0, ny - pj)
    i0 = jnp.clip(i - _IWID, 0, nx - pi)
    layer = jax.lax.dynamic_index_in_dim(field, k, keepdims=False)
    patch = jax.lax.dynamic_slice(layer, (j0, i0), (pj, pi))
    return field[k, j, i], k, j, i, j0, i0, patch


def _ocean_thickness(cfg, po, dtopoc):
    """Full perturbed layer thicknesses (valsubs.F:93-98 logic)."""
    gp = jnp.asarray(cfg.ocean.gpoc, dtype=po.dtype)
    hoc = jnp.asarray(cfg.ocean.hoc, dtype=po.dtype)
    eta = (po[1:] - po[:-1]) / gp[:, None, None]
    etup = jnp.concatenate([jnp.zeros_like(eta[:1]), eta], axis=0)
    etdn = jnp.concatenate([eta, jnp.zeros_like(eta[:1])], axis=0)
    thick = hoc[:, None, None] + etup - etdn
    return thick.at[-1].add(-dtopoc.astype(thick.dtype))


def _format_dump(name: str, loc) -> str:
    """Format one extremum like scan2D/3D: location line, column-index
    header, then patch rows printed north-to-south."""
    val, k, j, i, j0, i0, patch = (np.asarray(v) for v in loc)
    nl = [f"  {name} = {float(val):.6e} located at k, j, i = "
          f"{int(k)} {int(j)} {int(i)}"]
    cols = "".join(f"{int(i0) + c:13d}" for c in range(patch.shape[1]))
    nl.append("   " + cols)
    for r in range(patch.shape[0] - 1, -1, -1):
        row = "".join(f"{patch[r, c]:13.5e}"
                      for c in range(patch.shape[1]))
        nl.append(f"{int(j0) + r:7d}" + row)
    return "\n".join(nl)


def post_mortem(model, ocean=None, atmos=None, oc_forcing=None,
                at_forcing=None) -> str:
    """Locate the extremum of every checked field and its 9x7
    neighbourhood (the reference's scan2D/scan3D dumps on a validity
    failure, valsubs.F:101-628) as one formatted report. All
    reductions run in a single jitted dispatch."""

    @jax.jit
    def gather(ocean, atmos, oc_forcing, at_forcing, dtopoc):
        out = {}
        if ocean is not None:
            out["po"] = _locate(ocean.po)
            out["qo"] = _locate(ocean.qo)
            out["sst"] = _locate(ocean.sst)
            thick = _ocean_thickness(model.cfg, ocean.po, dtopoc)
            out["h_min"] = _locate(thick, take_min=True)
            if oc_forcing is not None:
                out["wekto"] = _locate(oc_forcing.wekto)
        if atmos is not None:
            out["pa"] = _locate(atmos.pa)
            out["qa"] = _locate(atmos.qa)
            out["ast"] = _locate(atmos.ast)
            if at_forcing is not None:
                out["wekta"] = _locate(at_forcing.wekta)
                out["taux"] = _locate(at_forcing.tauxa)
                out["tauy"] = _locate(at_forcing.tauya)
        return out

    dtop = (jnp.asarray(model.topo.dtopoc)
            if ocean is not None else None)
    locs = gather(ocean, atmos, oc_forcing, at_forcing, dtop)
    parts = ["validity post-mortem (field extrema and neighbourhoods):"]
    for name, loc in locs.items():
        parts.append(_format_dump(name, loc))
    return "\n".join(parts)
