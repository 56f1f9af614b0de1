"""Courant number / velocity extrema diagnostics.

Reference: `cfltry` (src/q-gcm.F:2121-2440) and `couroc`/`courat`
(src/monitor_diag.F:1215-1555). Geostrophic velocities are face values
u = -p_y/(f0 dx), v = p_x/(f0 dx); the mixed layer adds the Ekman
velocity tau/(f0 h_m). The Courant number is |u|max * dt / dx summed
over components.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CflReport(NamedTuple):
    cnqgoc: jnp.ndarray   # max QG-layer Courant number, ocean
    cnmloc: jnp.ndarray   # max mixed-layer Courant number, ocean
    cnqgat: jnp.ndarray
    cnmlat: jnp.ndarray
    ugmaxoc: jnp.ndarray  # (nlo,) max |u_g| per ocean layer
    vgmaxoc: jnp.ndarray
    ugmaxat: jnp.ndarray  # (nla,)
    vgmaxat: jnp.ndarray
    # signed component extrema (monitor_data.F ummin/ummax/ugmin/ugmax)
    ugminoc_s: jnp.ndarray   # (nlo,)
    ugmaxoc_s: jnp.ndarray
    vgminoc_s: jnp.ndarray
    vgmaxoc_s: jnp.ndarray
    ugminat_s: jnp.ndarray   # (nla,)
    ugmaxat_s: jnp.ndarray
    vgminat_s: jnp.ndarray
    vgmaxat_s: jnp.ndarray
    umminoc: jnp.ndarray     # mixed-layer velocity extrema (scalars)
    ummaxoc: jnp.ndarray
    vmminoc: jnp.ndarray
    vmmaxoc: jnp.ndarray
    umminat: jnp.ndarray
    ummaxat: jnp.ndarray
    vmminat: jnp.ndarray
    vmmaxat: jnp.ndarray


def _uv_faces(p, rdxf0):
    u = -rdxf0 * (p[:, 1:, :] - p[:, :-1, :])
    v = rdxf0 * (p[:, :, 1:] - p[:, :, :-1])
    return u, v


def _minmax(f, axes):
    return jnp.min(f, axis=axes), jnp.max(f, axis=axes)


def cfl_numbers(model, ocean=None, atmos=None, oc_forcing=None,
                at_forcing=None) -> CflReport:
    cfg = model.cfg
    g = model.grids
    z = jnp.zeros(())
    zv = jnp.zeros((1,))
    cnqgoc = cnmloc = cnqgat = cnmlat = z
    ugoc = vgoc = ugat = vgat = zv
    ugminoc = ugmaxoc = vgminoc = vgmaxoc = zv
    ugminat = ugmaxat = vgminat = vgmaxat = zv
    umminoc = ummaxoc = vmminoc = vmmaxoc = z
    umminat = ummaxat = vmminat = vmmaxat = z

    if ocean is not None:
        rdxof0 = 1.0 / (g.dxo * cfg.fnot)
        uo, vo = _uv_faces(ocean.po, rdxof0)
        ugminoc, ugmaxoc = _minmax(uo, (1, 2))
        vgminoc, vgmaxoc = _minmax(vo, (1, 2))
        ugoc = jnp.maximum(ugmaxoc, -ugminoc)
        vgoc = jnp.maximum(vgmaxoc, -vgminoc)
        cnqgoc = (jnp.max(ugoc) + jnp.max(vgoc)) * cfg.dto / g.dxo
        if oc_forcing is not None:
            rhf0hm = 0.5 / (cfg.fnot * cfg.mixed.hmoc)
            ue = (uo[0] + rhf0hm * (oc_forcing.tauyo[1:, :]
                                    + oc_forcing.tauyo[:-1, :]))
            ve = (vo[0] - rhf0hm * (oc_forcing.tauxo[:, 1:]
                                    + oc_forcing.tauxo[:, :-1]))
            # no normal flow through solid walls: the Ekman component
            # is zeroed on wall faces (couroc, monitor_diag.F:1718-1731)
            if not cfg.cyclic_ocean:
                from ..ops.stencils import _col_mask
                we = _col_mask(ue, 0) | _col_mask(ue, -1)
                ue = jnp.where(we, 0.0, ue)
            from ..ops.stencils import _row_mask
            sn = _row_mask(ve, 0) | _row_mask(ve, -1)
            ve = jnp.where(sn, 0.0, ve)
            cnmloc = (jnp.max(jnp.abs(ue)) + jnp.max(jnp.abs(ve))) \
                * cfg.dto / g.dxo
            umminoc, ummaxoc = jnp.min(ue), jnp.max(ue)
            vmminoc, vmmaxoc = jnp.min(ve), jnp.max(ve)

    if atmos is not None:
        rdxaf0 = 1.0 / (g.dxa * cfg.fnot)
        ua, va = _uv_faces(atmos.pa, rdxaf0)
        ugminat, ugmaxat = _minmax(ua, (1, 2))
        vgminat, vgmaxat = _minmax(va, (1, 2))
        ugat = jnp.maximum(ugmaxat, -ugminat)
        vgat = jnp.maximum(vgmaxat, -vgminat)
        cnqgat = (jnp.max(ugat) + jnp.max(vgat)) * cfg.dta / g.dxa
        if at_forcing is not None:
            ue = ua[0] + at_forcing.uekat
            ve = va[0] + at_forcing.vekat
            from ..ops.stencils import _row_mask
            sn = _row_mask(ve, 0) | _row_mask(ve, -1)
            ve = jnp.where(sn, 0.0, ve)
            cnmlat = (jnp.max(jnp.abs(ue)) + jnp.max(jnp.abs(ve))) \
                * cfg.dta / g.dxa
            umminat, ummaxat = jnp.min(ue), jnp.max(ue)
            vmminat, vmmaxat = jnp.min(ve), jnp.max(ve)

    return CflReport(cnqgoc=cnqgoc, cnmloc=cnmloc, cnqgat=cnqgat,
                     cnmlat=cnmlat, ugmaxoc=ugoc, vgmaxoc=vgoc,
                     ugmaxat=ugat, vgmaxat=vgat,
                     ugminoc_s=ugminoc, ugmaxoc_s=ugmaxoc,
                     vgminoc_s=vgminoc, vgmaxoc_s=vgmaxoc,
                     ugminat_s=ugminat, ugmaxat_s=ugmaxat,
                     vgminat_s=vgminat, vgmaxat_s=vgmaxat,
                     umminoc=umminoc, ummaxoc=ummaxoc,
                     vmminoc=vmminoc, vmmaxoc=vmmaxoc,
                     umminat=umminat, ummaxat=ummaxat,
                     vmminat=vmminat, vmmaxat=vmmaxat)
