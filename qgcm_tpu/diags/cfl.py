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


def _uv_face_max(p, rdxf0):
    """Max |u|, |v| of the geostrophic flow per layer (face values)."""
    u = -rdxf0 * (p[:, 1:, :] - p[:, :-1, :])
    v = rdxf0 * (p[:, :, 1:] - p[:, :, :-1])
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

    if ocean is not None:
        rdxof0 = 1.0 / (g.dxo * cfg.fnot)
        ugoc, vgoc = _uv_face_max(ocean.po, rdxof0)
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

    if atmos is not None:
        rdxaf0 = 1.0 / (g.dxa * cfg.fnot)
        ugat, vgat = _uv_face_max(atmos.pa, rdxaf0)
        cnqgat = (jnp.max(ugat) + jnp.max(vgat)) * cfg.dta / g.dxa
        if at_forcing is not None:
            ue = (-rdxaf0 * (atmos.pa[0, 1:, :] - atmos.pa[0, :-1, :])
                  + at_forcing.uekat)
            ve = (rdxaf0 * (atmos.pa[0, :, 1:] - atmos.pa[0, :, :-1])
                  + at_forcing.vekat)
            cnmlat = (jnp.max(jnp.abs(ue)) + jnp.max(jnp.abs(ve))) \
                * cfg.dta / g.dxa

    return CflReport(cnqgoc=cnqgoc, cnmloc=cnmloc, cnqgat=cnqgat,
                     cnmlat=cnmlat, ugmaxoc=ugoc, vgmaxoc=vgoc,
                     ugmaxat=ugat, vgmaxat=vgat)
