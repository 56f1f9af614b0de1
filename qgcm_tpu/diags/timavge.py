"""Running time means -> avges.nc (reference src/timavge.F).

The reference accumulates sums every step inside the main loop
(tavatm/tavocn, q-gcm.F:1477-1482) and writes means at interval end
(tavout -> avges.nc, variable list timavge.F:911-1256). TPU-native
form: the accumulator is a pytree carried through the `lax.scan` time
loop, updated on-device each (sub)step; the host divides by the count
and writes at interval boundaries.

Also accumulates the eddy-flux products u*T and v*T on the ocean
T grid (uptpoc/vptpoc, timavge.F:500-560): means of the products,
from which u'T' = <uT> - <u><T> is formed in analysis.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class OceanAverages(NamedTuple):
    n: jnp.ndarray
    sst: jnp.ndarray
    wekto: jnp.ndarray
    fnetoc: jnp.ndarray
    tauxo: jnp.ndarray
    tauyo: jnp.ndarray
    wekpo: jnp.ndarray
    po: jnp.ndarray
    qo: jnp.ndarray
    uptpoc: jnp.ndarray   # <u1 * sst> at T points
    vptpoc: jnp.ndarray   # <v1 * sst> at T points


class AtmosAverages(NamedTuple):
    n: jnp.ndarray
    ast: jnp.ndarray
    hmixa: jnp.ndarray
    wekta: jnp.ndarray
    fnetat: jnp.ndarray
    tauxa: jnp.ndarray
    tauya: jnp.ndarray
    wekpa: jnp.ndarray
    pa: jnp.ndarray
    qa: jnp.ndarray


def zero_ocean_averages(cfg, dtype) -> OceanAverages:
    zt = jnp.zeros((cfg.nyto, cfg.nxto), dtype)
    zp = jnp.zeros((cfg.nypo, cfg.nxpo), dtype)
    zl = jnp.zeros((cfg.nlo, cfg.nypo, cfg.nxpo), dtype)
    return OceanAverages(n=jnp.zeros((), dtype), sst=zt, wekto=zt,
                         fnetoc=zt, tauxo=zp, tauyo=zp, wekpo=zp,
                         po=zl, qo=zl, uptpoc=zt, vptpoc=zt)


def zero_atmos_averages(cfg, dtype) -> AtmosAverages:
    zt = jnp.zeros((cfg.nyta, cfg.nxta), dtype)
    zp = jnp.zeros((cfg.nypa, cfg.nxpa), dtype)
    zl = jnp.zeros((cfg.nla, cfg.nypa, cfg.nxpa), dtype)
    return AtmosAverages(n=jnp.zeros((), dtype), ast=zt, hmixa=zt,
                         wekta=zt, fnetat=zt, tauxa=zp, tauya=zp,
                         wekpa=zp, pa=zl, qa=zl)


def accumulate_ocean(acc: OceanAverages, state, forcing, dxo, fnot
                     ) -> OceanAverages:
    # layer-1 geostrophic velocity at T points for eddy fluxes
    p1 = state.po[0]
    rdxf0 = 1.0 / (dxo * fnot)
    u1t = -0.5 * rdxf0 * ((p1[1:, :-1] + p1[1:, 1:])
                          - (p1[:-1, :-1] + p1[:-1, 1:]))
    v1t = 0.5 * rdxf0 * ((p1[:-1, 1:] + p1[1:, 1:])
                         - (p1[:-1, :-1] + p1[1:, :-1]))
    return OceanAverages(
        n=acc.n + 1.0,
        sst=acc.sst + state.sst,
        wekto=acc.wekto + forcing.wekto,
        fnetoc=acc.fnetoc + forcing.fnetoc,
        tauxo=acc.tauxo + forcing.tauxo,
        tauyo=acc.tauyo + forcing.tauyo,
        wekpo=acc.wekpo + forcing.wekpo,
        po=acc.po + state.po,
        qo=acc.qo + state.qo,
        uptpoc=acc.uptpoc + u1t * state.sst,
        vptpoc=acc.vptpoc + v1t * state.sst)


def accumulate_atmos(acc: AtmosAverages, state, forcing
                     ) -> AtmosAverages:
    return AtmosAverages(
        n=acc.n + 1.0,
        ast=acc.ast + state.ast,
        hmixa=acc.hmixa + state.hmixa,
        wekta=acc.wekta + forcing.wekta,
        fnetat=acc.fnetat + forcing.fnetat,
        tauxa=acc.tauxa + forcing.tauxa,
        tauya=acc.tauya + forcing.tauya,
        wekpa=acc.wekpa + forcing.wekpa,
        pa=acc.pa + state.pa,
        qa=acc.qa + state.qa)


def write_avges(path: str, model, oc_acc: Optional[OceanAverages],
                at_acc: Optional[AtmosAverages]):
    """Divide the accumulated sums by the counts and write avges.nc.
    The ocean variables double as a mean-forcing file for later
    ocean-only runs (q-gcm.F:791-808 reads fnetoc/tauxo/tauyo; the
    atmos-only mode reads sst)."""
    from ..io.ncdf import make_writer as NcWriter
    cfg = model.cfg
    w = NcWriter(path)
    if oc_acc is not None:
        n = max(float(oc_acc.n), 1.0)
        w.dim("xpo", cfg.nxpo); w.dim("ypo", cfg.nypo)
        w.dim("xto", cfg.nxto); w.dim("yto", cfg.nyto)
        w.dim("zo", cfg.nlo)
        for nm in ["sst", "wekto", "fnetoc", "uptpoc", "vptpoc"]:
            w.var(nm, "d", ("yto", "xto"),
                  data=np.asarray(getattr(oc_acc, nm)) / n)
        for nm in ["tauxo", "tauyo", "wekpo"]:
            w.var(nm, "d", ("ypo", "xpo"),
                  data=np.asarray(getattr(oc_acc, nm)) / n)
        for nm in ["po", "qo"]:
            w.var(nm, "d", ("zo", "ypo", "xpo"),
                  data=np.asarray(getattr(oc_acc, nm)) / n)
    if at_acc is not None:
        n = max(float(at_acc.n), 1.0)
        w.dim("xpa", cfg.nxpa); w.dim("ypa", cfg.nypa)
        w.dim("xta", cfg.nxta); w.dim("yta", cfg.nyta)
        w.dim("za", cfg.nla)
        for nm in ["ast", "hmixa", "wekta", "fnetat"]:
            w.var(nm, "d", ("yta", "xta"),
                  data=np.asarray(getattr(at_acc, nm)) / n)
        for nm in ["tauxa", "tauya", "wekpa"]:
            w.var(nm, "d", ("ypa", "xpa"),
                  data=np.asarray(getattr(at_acc, nm)) / n)
        for nm in ["pa", "qa"]:
            w.var(nm, "d", ("za", "ypa", "xpa"),
                  data=np.asarray(getattr(at_acc, nm)) / n)
    w.close()
