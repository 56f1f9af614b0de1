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


def _uv_face_max(p, rdxf0):
    """Max |u|, |v| of the geostrophic flow per layer (face values)."""
    u, v = _uv_faces(p, rdxf0)
    return (jnp.max(jnp.abs(u), axis=(1, 2)),
            jnp.max(jnp.abs(v), axis=(1, 2)))


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
        ugoc, vgoc = _uv_face_max(ocean.po, rdxof0)
        uo, vo = _uv_faces(ocean.po, rdxof0)
        ugminoc = jnp.min(uo, axis=(1, 2))
        ugmaxoc = jnp.max(uo, axis=(1, 2))
        vgminoc = jnp.min(vo, axis=(1, 2))
        vgmaxoc = jnp.max(vo, axis=(1, 2))
        cnqgoc = (jnp.max(ugoc) + jnp.max(vgoc)) * cfg.dto / g.dxo
        if oc_forcing is not None:
            rhf0hm = 0.5 / (cfg.fnot * cfg.mixed.hmoc)
            ue = (-rdxof0 * (ocean.po[0, 1:, :] - ocean.po[0, :-1, :])
                  + rhf0hm * (oc_forcing.tauyo[1:, :]
                              + oc_forcing.tauyo[:-1, :]))
            ve = (rdxof0 * (ocean.po[0, :, 1:] - ocean.po[0, :, :-1])
                  - rhf0hm * (oc_forcing.tauxo[:, 1:]
                              + oc_forcing.tauxo[:, :-1]))
            cnmloc = (jnp.max(jnp.abs(ue)) + jnp.max(jnp.abs(ve))) \
                * cfg.dto / g.dxo
            umminoc, ummaxoc = jnp.min(ue), jnp.max(ue)
            vmminoc, vmmaxoc = jnp.min(ve), jnp.max(ve)

    if atmos is not None:
        rdxaf0 = 1.0 / (g.dxa * cfg.fnot)
        ugat, vgat = _uv_face_max(atmos.pa, rdxaf0)
        ua, va = _uv_faces(atmos.pa, rdxaf0)
        ugminat = jnp.min(ua, axis=(1, 2))
        ugmaxat = jnp.max(ua, axis=(1, 2))
        vgminat = jnp.min(va, axis=(1, 2))
        vgmaxat = jnp.max(va, axis=(1, 2))
        cnqgat = (jnp.max(ugat) + jnp.max(vgat)) * cfg.dta / g.dxa
        if at_forcing is not None:
            ue = (-rdxaf0 * (atmos.pa[0, 1:, :] - atmos.pa[0, :-1, :])
                  + at_forcing.uekat)
            ve = (rdxaf0 * (atmos.pa[0, :, 1:] - atmos.pa[0, :, :-1])
                  + at_forcing.vekat)
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
