"""Monitoring diagnostics incl. the energy budget (monit.nc).

Replaces reference src/monitor_diag.F monnc_comp/monnc_init/monnc_out
(one fused pass computing ~60 scalar/profile diagnostics) and writes
them in the reference's monit.nc variable names so the analysis layer
(qgcm_k247.rb energy checks) keys on the same schema.

Formula sources (monitor_data.F:72-220 docs; monitor_diag.F code):
  kealoc  = 0.5 rho H(k) <u^2+v^2>          (u,v geostrophic faces)
  ddtke   = rho H(k) <u du/dt + v dv/dt>    (du/dt from p - pm)
  ddtpe   = rho gp(k) <eta d(eta)/dt>
  pken    = rho gp(1) <eta1 * entrainment>
  utau    = rho <u1 taux + v1 tauy>         (monitor_diag.F:590-617)
  btdg    = 0.5 rho delek |f0| <u_nlo^2 + v_nlo^2>   (lagged)
  ah2d/ah4d: -/+ rho Ah H(k) <u del2/del4 u + v ...> (lagged)
  olrtop  = Bup(nla)(hmlmat-hmat) + Cup(nla) davgat
            + Dup(nla) tmlmat + sum Aup(nla,i) etamat(i)
All <.> are area means with trapezoidal edge weights (genint,
monitor_diag.F:1155-1210).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .cfl import cfl_numbers


def _genint(f, xfac, yfac):
    """Weighted sum with end-row/column factors (genint)."""
    wx = jnp.ones(f.shape[-1], f.dtype).at[0].set(xfac).at[-1].set(xfac)
    wy = jnp.ones(f.shape[-2], f.dtype).at[0].set(yfac).at[-1].set(yfac)
    return jnp.sum(f * wy[:, None] * wx[None, :])


class FluidMonitor(NamedTuple):
    kea: jnp.ndarray      # (nl,) layer KE (J m^-2)
    ddtke: jnp.ndarray    # (nl,) d/dt KE (W m^-2)
    ddtpe: jnp.ndarray    # (nl-1,) d/dt PE per interface (W m^-2)
    pken: jnp.ndarray     # scalar: eta1*entrainment exchange (W m^-2)
    utau: jnp.ndarray     # scalar: wind work (W m^-2)
    ah2d: jnp.ndarray     # (nl,) del2 dissipation (W m^-2)
    ah4d: jnp.ndarray     # (nl,) del4 dissipation (W m^-2)
    etam: jnp.ndarray     # (nl-1,) mean eta (m)
    et2m: jnp.ndarray     # (nl-1,) mean eta^2 (m^2)
    pavg: jnp.ndarray     # (nl,)
    qavg: jnp.ndarray     # (nl,)
    wetm: jnp.ndarray     # mean Ekman w at T points (m/s)
    watm: jnp.ndarray     # mean |Ekman w| at T points
    wepm: jnp.ndarray     # mean Ekman w at p points
    wapm: jnp.ndarray     # mean |Ekman w| at p points
    entm: jnp.ndarray     # mean entrainment
    enam: jnp.ndarray     # mean |entrainment|
    tmlm: jnp.ndarray     # mean mixed layer temperature
    tmin: jnp.ndarray
    tmax: jnp.ndarray
    jetpos: jnp.ndarray   # (nl,) j row (1-based) of the max |zonal-
                          # mean u| -- jet/storm-track position
                          # (ocjpos/atstpos, monitor_diag.F:382,697)
    jetval: jnp.ndarray   # (nl,) that max zonal-mean speed (m/s)


def _fluid_monitor(p, pm, q, eta_sign, gp, h, rho, f0, dx, dt,
                   ah2, ah4, wekt, wekp, ent, tml, wp, norm,
                   tau=None, delek=0.0, cyclic=False):
    """Shared ocean/atmos monitoring. eta_sign: +1 if eta = (p(k+1)-
    p(k))/gp (ocean), -1 for the atmosphere convention."""
    rdxf0 = 1.0 / (dx * f0)
    nl = p.shape[0]

    # geostrophic faces, current and lagged
    u = -rdxf0 * (p[:, 1:, :] - p[:, :-1, :])          # (nl, nyt, nxp)
    v = rdxf0 * (p[:, :, 1:] - p[:, :, :-1])           # (nl, nyp, nxt)
    udot = -(rdxf0 / dt) * ((p - pm)[:, 1:, :] - (p - pm)[:, :-1, :])
    vdot = (rdxf0 / dt) * ((p - pm)[:, :, 1:] - (p - pm)[:, :, :-1])
    um = -rdxf0 * (pm[:, 1:, :] - pm[:, :-1, :])
    vm = rdxf0 * (pm[:, :, 1:] - pm[:, :, :-1])

    def gu(f):   # u-grid integral: x ends are p points
        return _genint(f, 0.5, 1.0)

    def gv(f):
        return _genint(f, 1.0, 0.5)

    uke = jnp.stack([gu(u[k] ** 2) for k in range(nl)])
    vke = jnp.stack([gv(v[k] ** 2) for k in range(nl)])
    ukedot = jnp.stack([gu(u[k] * udot[k]) for k in range(nl)])
    vkedot = jnp.stack([gv(v[k] * vdot[k]) for k in range(nl)])
    kea = 0.5 * rho * h * (uke + vke) * norm
    ddtke = rho * h * (ukedot + vkedot) * norm

    # del2/del4 dissipation on the lagged velocities (interior stencil)
    def lap(f):
        out = jnp.zeros_like(f)
        return out.at[..., 1:-1, 1:-1].set(
            (f[..., :-2, 1:-1] + f[..., 2:, 1:-1] + f[..., 1:-1, :-2]
             + f[..., 1:-1, 2:] - 4.0 * f[..., 1:-1, 1:-1]) / dx**2)

    d2um, d2vm = lap(um), lap(vm)
    d4um, d4vm = lap(d2um), lap(d2vm)
    u2d = jnp.stack([gu(um[k] * d2um[k]) for k in range(nl)])
    v2d = jnp.stack([gv(vm[k] * d2vm[k]) for k in range(nl)])
    u4d = jnp.stack([gu(um[k] * d4um[k]) for k in range(nl)])
    v4d = jnp.stack([gv(vm[k] * d4vm[k]) for k in range(nl)])
    ah2d = -rho * ah2 * h * (u2d + v2d) * norm
    ah4d = rho * ah4 * h * (u4d + v4d) * norm

    # interface displacement terms
    eta = eta_sign * (p[1:] - p[:-1]) / gp[:, None, None]
    etam_f = eta_sign * (pm[1:] - pm[:-1]) / gp[:, None, None]
    etadot = (eta - etam_f) / dt
    etam = jnp.stack([_genint(eta[k], 0.5, 0.5)
                      for k in range(nl - 1)]) * norm
    et2m = jnp.stack([_genint(eta[k] ** 2, 0.5, 0.5)
                      for k in range(nl - 1)]) * norm
    ddtpe = rho * gp * jnp.stack(
        [_genint(eta[k] * etadot[k], 0.5, 0.5)
         for k in range(nl - 1)]) * norm

    pavg = jnp.stack([_genint(p[k], 0.5, 0.5) for k in range(nl)]) * norm
    qavg = jnp.stack([_genint(q[k], 0.5, 0.5) for k in range(nl)]) * norm

    # entrainment exchange (interface 1 only)
    pken = (rho * gp[0] * _genint(eta[0] * ent, 0.5, 0.5) * norm
            if ent is not None else jnp.zeros(()))

    # wind work (monitor_diag.F:590-617)
    if tau is not None:
        taux, tauy = tau
        txav = 0.5 * (taux[1:, :] + taux[:-1, :])
        tyav = 0.5 * (tauy[:, 1:] + tauy[:, :-1])
        utau = rho * (gu(u[0] * txav) + gv(v[0] * tyav)) * norm
    else:
        utau = jnp.zeros(())

    # bottom Ekman drag (ocean only; lagged velocities)
    if delek:
        btdg = 0.5 * rho * delek * abs(f0) * (
            gu(um[-1] ** 2) + gv(vm[-1] ** 2)) * norm
    else:
        btdg = jnp.zeros(())

    # jet (storm-track) position: row of max |zonal-mean u|
    # (monitor_diag.F:357-390 atmos, :672-705 ocean). The zonal sum
    # runs over the nxt distinct u faces (the duplicated/zero end
    # column is dropped).
    ujet = jnp.abs(jnp.sum(u[:, :, :-1], axis=-1)) / (u.shape[-1] - 1)
    jetpos = jnp.argmax(ujet, axis=-1) + 1       # 1-based j
    jetval = jnp.max(ujet, axis=-1)

    mon = FluidMonitor(
        kea=kea, ddtke=ddtke, ddtpe=ddtpe, pken=pken, utau=utau,
        ah2d=ah2d, ah4d=ah4d, etam=etam, et2m=et2m, pavg=pavg,
        qavg=qavg,
        wetm=jnp.mean(wekt), watm=jnp.mean(jnp.abs(wekt)),
        wepm=_genint(wekp, 0.5, 0.5) * norm,
        wapm=_genint(jnp.abs(wekp), 0.5, 0.5) * norm,
        entm=(_genint(ent, 0.5, 0.5) * norm if ent is not None
              else jnp.zeros(())),
        enam=(_genint(jnp.abs(ent), 0.5, 0.5) * norm if ent is not None
              else jnp.zeros(())),
        tmlm=jnp.mean(tml), tmin=jnp.min(tml), tmax=jnp.max(tml),
        jetpos=jetpos, jetval=jetval)
    return mon, btdg


class MonitorRecord(NamedTuple):
    oc: Optional[FluidMonitor]
    at: Optional[FluidMonitor]
    btdgoc: jnp.ndarray
    osfmin: jnp.ndarray    # (nlo,) transport streamfunction min (Sv)
    osfmax: jnp.ndarray
    occirc: jnp.ndarray    # (nlo,) zonal transport (Sv, cyclic only)
    occtot: jnp.ndarray
    hfmloc: jnp.ndarray
    hcmlat: jnp.ndarray
    tmaooc: jnp.ndarray
    hmlmat: jnp.ndarray
    olrtop: jnp.ndarray
    ermaso: jnp.ndarray
    emfroc: jnp.ndarray
    ermasa: jnp.ndarray
    emfrat: jnp.ndarray
    cfraoc: jnp.ndarray   # fraction of convecting ocean ML points
    centoc: jnp.ndarray   # integrated convective entrainment
    cfraat: jnp.ndarray
    centat: jnp.ndarray
    slhfav: jnp.ndarray   # xforc heat-flux means (arlaav etc.)
    oradav: jnp.ndarray
    arocav: jnp.ndarray
    arlaav: jnp.ndarray
    bflux: dict           # sb/nb_hflux boundary fluxes (ttmads etc.)
    cfl: object


def compute_monitor(model, ocean=None, atmos=None, oc_forcing=None,
                    at_forcing=None, odiags=None, adiags=None,
                    xdiags=None):
    """Compute the monitoring record from current states. Entrainment
    fields are recomputed from the (lagged) states via the mixed-layer
    code, mirroring the values the next step will use."""
    cfg = model.cfg
    g = model.grids
    dtype = jnp.dtype(cfg.dtype)
    z = jnp.zeros((), dtype)
    zv = jnp.zeros((1,), dtype)
    mon_oc = mon_at = None
    btdg = hfml = hcml = tmaooc = olrtop = hmlmat = z
    osfmin = osfmax = occirc = zv
    occtot = z
    ermaso = emfroc = ermasa = emfrat = zv
    cfraoc = centoc = cfraat = centat = z
    slhfav = oradav = arocav = arlaav = z
    bflux = {n: z for n in ("ttmads", "vfmads", "ttmdfs", "ttmadn",
                            "vfmadn", "ttmdfn")}

    if ocean is not None and oc_forcing is not None:
        if cfg.no_oml:
            entoc = None
        else:
            from ..models.ocean import _oml
            _omlout = _oml(model, ocean, oc_forcing)
            entoc = _omlout[2]
            cfraoc, centoc = _omlout[6], _omlout[7]
        if cfg.sb_hflux or cfg.nb_hflux:
            from ..models.ocean import boundary_flux_diags
            bflux = boundary_flux_diags(model, ocean, oc_forcing)
        gp = jnp.asarray(cfg.ocean.gpoc, dtype)
        hoc = jnp.asarray(cfg.ocean.hoc, dtype)
        mon_oc, btdg = _fluid_monitor(
            ocean.po, ocean.pom, ocean.qo, +1.0, gp, hoc, cfg.rhooc,
            cfg.fnot, g.dxo, cfg.dto,
            jnp.asarray(cfg.ocean.ah2oc, dtype),
            jnp.asarray(cfg.ocean.ah4oc, dtype),
            oc_forcing.wekto, oc_forcing.wekpo, entoc, ocean.sst,
            model.wop, cfg.ocnorm,
            tau=(oc_forcing.tauxo, oc_forcing.tauyo),
            delek=cfg.ocean.delek, cyclic=cfg.cyclic_ocean)
        # transport streamfunction extrema / zonal transport
        pref = ocean.po[:, 0, 0][:, None, None]
        psi = (ocean.po - pref) / cfg.fnot
        osfmin = 1e-6 * hoc * jnp.min(psi, axis=(1, 2))
        osfmax = 1e-6 * hoc * jnp.max(psi, axis=(1, 2))
        occirc = 1e-6 * hoc * (ocean.po[:, 0, 0]
                               - ocean.po[:, -1, 0]) / cfg.fnot
        occtot = jnp.sum(occirc)
        hfml = cfg.rhooc * cfg.cpoc * jnp.mean(
            ocean.sst * oc_forcing.wekto)
        ermaso, emfroc = ((odiags.ermaso, odiags.emfroc)
                          if odiags is not None else (ermaso, emfroc))

    if atmos is not None and at_forcing is not None:
        from ..models.atmos import _aml
        _amlout = _aml(model, atmos, at_forcing)
        entat = _amlout[4]
        cfraat, centat = _amlout[8], _amlout[9]
        if xdiags is not None:
            # xforc heat-flux means, computed by the caller's xforc
            # pass ("computed in xforc, so no duplication",
            # monitor_data.F:110-113)
            slhfav, oradav = xdiags.slhfav, xdiags.oradav
            arocav, arlaav = xdiags.arocav, xdiags.arlaav
        gp = jnp.asarray(cfg.atmos.gpat, dtype)
        hat = jnp.asarray(cfg.atmos.hat, dtype)
        mon_at, _ = _fluid_monitor(
            atmos.pa, atmos.pam, atmos.qa, -1.0, gp, hat, cfg.rhoat,
            cfg.fnot, g.dxa, cfg.dta,
            jnp.zeros(cfg.nla, dtype),
            jnp.asarray(cfg.atmos.ah4at, dtype),
            at_forcing.wekta, at_forcing.wekpa, entat, atmos.ast,
            model.wap, cfg.atnorm,
            tau=(at_forcing.tauxa, at_forcing.tauya), cyclic=True)
        hcml = cfg.rhoat * cfg.cpat * jnp.mean(atmos.ast * atmos.hmixa)
        tmaooc = jnp.mean(
            atmos.ast[cfg.ny1 - 1:cfg.ny1 - 1 + cfg.nyaooc,
                      cfg.nx1 - 1:cfg.nx1 - 1 + cfg.nxaooc])
        hmlmat = jnp.mean(atmos.hmixa)
        rad = model.rad
        olrtop = (rad.Bup[-1] * (hmlmat - cfg.mixed.hmat)
                  + rad.Cup[-1] * model.topo.davgat
                  + rad.Dup[-1] * mon_at.tmlm
                  + jnp.sum(jnp.asarray(rad.Aup[-1, :], dtype)
                            * mon_at.etam))
        ermasa, emfrat = ((adiags.ermasa, adiags.emfrat)
                          if adiags is not None else (ermasa, emfrat))

    cfl = cfl_numbers(model, ocean, atmos, oc_forcing, at_forcing)
    return MonitorRecord(
        oc=mon_oc, at=mon_at, btdgoc=btdg, osfmin=osfmin,
        osfmax=osfmax, occirc=occirc, occtot=occtot, hfmloc=hfml,
        hcmlat=hcml, tmaooc=tmaooc, hmlmat=hmlmat, olrtop=olrtop,
        ermaso=ermaso, emfroc=emfroc, ermasa=ermasa, emfrat=emfrat,
        cfraoc=cfraoc, centoc=centoc, cfraat=cfraat, centat=centat,
        slhfav=slhfav, oradav=oradav, arocav=arocav, arlaav=arlaav,
        bflux=bflux, cfl=cfl)


# ----------------------------------------------------------------------
# monit.nc writer (reference variable names, monnc_init :1934-3008)
# ----------------------------------------------------------------------

_OC_VECNL = ["kealoc", "ddtkeoc", "ah2doc", "ah4doc", "pavgoc",
             "qavgoc", "osfmin", "osfmax", "occirc", "ugminoc",
             "ugmaxoc", "vgminoc", "vgmaxoc", "ocjval"]
_OC_VECNI = ["ddtpeoc", "etamoc", "et2moc", "ermaso", "emfroc"]
_OC_SCAL = ["pkenoc", "utauoc", "btdgoc", "occtot", "hfmloc", "wetmoc",
            "watmoc", "wepmoc", "wapmoc", "entmoc", "enamoc", "tmlmoc",
            "sstmin", "sstmax", "cnqgoc", "cnmloc", "cfraoc", "centoc",
            "umminoc", "ummaxoc", "vmminoc", "vmmaxoc",
            "ttmads", "vfmads", "ttmdfs", "ttmadn", "vfmadn", "ttmdfn"]
_AT_VECNL = ["kealat", "ddtkeat", "ah4dat", "pavgat", "qavgat",
             "ugminat", "ugmaxat", "vgminat", "vgmaxat", "atstval"]
_AT_VECNI = ["ddtpeat", "etamat", "et2mat", "ermasa", "emfrat"]
_AT_SCAL = ["pkenat", "utauat", "hcmlat", "tmaooc", "olrtop", "wetmat",
            "watmat", "wepmat", "wapmat", "entmat", "enamat", "tmlmat",
            "hmlmat", "astmin", "astmax", "cnqgat", "cnmlat", "cfraat",
            "centat", "slhfav", "oradav", "arocav", "arlaav",
            "umminat", "ummaxat", "vmminatat", "vmmaxat"]


class MonitorWriter:
    def __init__(self, path: str, model):
        from ..io.ncdf import make_writer as NcWriter
        cfg = model.cfg
        self.model = model
        self.rec = 0
        w = NcWriter(path)
        w.dim("time", None)
        w.var("time", "f", ("time",), units="years")
        has_oc = not cfg.atmos_only
        has_at = not cfg.ocean_only

        def middepths(h):
            """Mid-layer depths, km (monnc_init, monitor_diag.F:2966)."""
            z = np.cumsum(h) - 0.5 * np.asarray(h)
            return 1e-3 * z

        if has_oc:
            w.dim("zo", cfg.nlo); w.dim("zio", cfg.nlo - 1)
            w.var("zo", "f", ("zo",), units="km",
                  data=middepths(cfg.ocean.hoc))
            w.var("zom", "f", ("zio",), units="km",
                  data=1e-3 * np.cumsum(cfg.ocean.hoc[:-1]))
            for n in _OC_VECNL:
                w.var(n, "f", ("time", "zo"))
            w.var("ocjpos", "i", ("time", "zo"), units="gridsquare")
            for n in _OC_VECNI:
                w.var(n, "f", ("time", "zio"))
            for n in _OC_SCAL:
                w.var(n, "f", ("time",))
        if has_at:
            w.dim("za", cfg.nla); w.dim("zia", cfg.nla - 1)
            w.var("za", "f", ("za",), units="km",
                  data=middepths(cfg.atmos.hat))
            w.var("zam", "f", ("zia",), units="km",
                  data=1e-3 * np.cumsum(cfg.atmos.hat[:-1]))
            for n in _AT_VECNL:
                w.var(n, "f", ("time", "za"))
            w.var("atstpos", "i", ("time", "za"), units="gridsquare")
            for n in _AT_VECNI:
                w.var(n, "f", ("time", "zia"))
            for n in _AT_SCAL:
                w.var(n, "f", ("time",))
        self.w = w

    def append(self, rec: MonitorRecord, tyrs: float):
        w, r = self.w, self.rec
        w.append("time", r, tyrs)
        m = rec.oc
        if m is not None:
            vals = dict(
                kealoc=m.kea, ddtkeoc=m.ddtke, ah2doc=m.ah2d,
                ah4doc=m.ah4d, pavgoc=m.pavg, qavgoc=m.qavg,
                osfmin=rec.osfmin, osfmax=rec.osfmax,
                occirc=rec.occirc, ddtpeoc=m.ddtpe, etamoc=m.etam,
                et2moc=m.et2m, ermaso=rec.ermaso, emfroc=rec.emfroc,
                pkenoc=m.pken, utauoc=m.utau, btdgoc=rec.btdgoc,
                occtot=rec.occtot, hfmloc=rec.hfmloc, wetmoc=m.wetm,
                watmoc=m.watm, wepmoc=m.wepm, wapmoc=m.wapm,
                entmoc=m.entm, enamoc=m.enam, tmlmoc=m.tmlm,
                sstmin=m.tmin, sstmax=m.tmax,
                cnqgoc=rec.cfl.cnqgoc, cnmloc=rec.cfl.cnmloc,
                cfraoc=rec.cfraoc, centoc=rec.centoc,
                ugminoc=rec.cfl.ugminoc_s, ugmaxoc=rec.cfl.ugmaxoc_s,
                vgminoc=rec.cfl.vgminoc_s, vgmaxoc=rec.cfl.vgmaxoc_s,
                umminoc=rec.cfl.umminoc, ummaxoc=rec.cfl.ummaxoc,
                vmminoc=rec.cfl.vmminoc, vmmaxoc=rec.cfl.vmmaxoc,
                ocjpos=m.jetpos, ocjval=m.jetval,
                **rec.bflux)
            for n, v in vals.items():
                w.append(n, r, np.asarray(v))
        m = rec.at
        if m is not None:
            vals = dict(
                kealat=m.kea, ddtkeat=m.ddtke, ah4dat=m.ah4d,
                pavgat=m.pavg, qavgat=m.qavg, ddtpeat=m.ddtpe,
                etamat=m.etam, et2mat=m.et2m, ermasa=rec.ermasa,
                emfrat=rec.emfrat, pkenat=m.pken, utauat=m.utau,
                hcmlat=rec.hcmlat, tmaooc=rec.tmaooc,
                olrtop=rec.olrtop, wetmat=m.wetm, watmat=m.watm,
                wepmat=m.wepm, wapmat=m.wapm, entmat=m.entm,
                enamat=m.enam, tmlmat=m.tmlm,
                hmlmat=rec.hmlmat, astmin=m.tmin, astmax=m.tmax,
                cnqgat=rec.cfl.cnqgat, cnmlat=rec.cfl.cnmlat,
                cfraat=rec.cfraat, centat=rec.centat,
                slhfav=rec.slhfav, oradav=rec.oradav,
                arocav=rec.arocav, arlaav=rec.arlaav,
                ugminat=rec.cfl.ugminat_s, ugmaxat=rec.cfl.ugmaxat_s,
                vgminat=rec.cfl.vgminat_s, vgmaxat=rec.cfl.vgmaxat_s,
                umminat=rec.cfl.umminat, ummaxat=rec.cfl.ummaxat,
                vmminatat=rec.cfl.vmminat, vmmaxat=rec.cfl.vmmaxat,
                atstpos=m.jetpos, atstval=m.jetval)
            for n, v in vals.items():
                w.append(n, r, np.asarray(v))
        self.rec += 1

    def close(self):
        self.w.close()
