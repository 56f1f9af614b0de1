"""Checkpoint/restart in the reference's restart.nc schema.

Writes every prognostic field at BOTH leapfrog time levels in double
precision so restarts are exact (resave_nc, src/nc_subs.F:1331-1718;
reader restart_nc:1721-2050). Vorticity is NOT stored -- it is
recomputed from pressure on load, exactly as the reference does
(q-gcm.F:715-750). Coordinate variables are written in km, ocean
coordinates relative to the ocean box origin (nc_subs.F:1596-1656).
"""

from __future__ import annotations

import numpy as np

from .ncdf import make_writer as NcWriter, read_vars
from ..state import OceanState, AtmosState


def _layer_depths(h):
    h = np.asarray(h)
    tops = np.concatenate([[0.0], np.cumsum(h)[:-1]])
    return 1.0e-3 * (tops + 0.5 * h), 1.0e-3 * np.cumsum(h)[:-1]


def save_restart(path: str, model, ocean: OceanState, atmos: AtmosState,
                 tyrs: float):
    """Write restart.nc. Both states must be provided; in single-fluid
    modes pass the untouched init-time state for the inactive fluid
    (the reference likewise dumps the full state vector)."""
    cfg = model.cfg
    g = model.grids
    w = NcWriter(path)
    w.dim("time", 1)
    w.dim("xpo", cfg.nxpo); w.dim("ypo", cfg.nypo); w.dim("zo", cfg.nlo)
    w.dim("xto", cfg.nxto); w.dim("yto", cfg.nyto)
    w.dim("xpa", cfg.nxpa); w.dim("ypa", cfg.nypa); w.dim("za", cfg.nla)
    w.dim("xta", cfg.nxta); w.dim("yta", cfg.nyta)

    w.var("time", "d", ("time",), units="years", data=[tyrs])
    w.var("xpo", "d", ("xpo",), units="km",
          data=1.0e-3 * (g.xpo - g.xpo[0]))
    w.var("xto", "d", ("xto",), units="km",
          data=1.0e-3 * (g.xto - g.xpo[0]))
    w.var("ypo", "d", ("ypo",), units="km",
          data=1.0e-3 * (g.ypo - g.ypo[0]))
    w.var("yto", "d", ("yto",), units="km",
          data=1.0e-3 * (g.yto - g.ypo[0]))
    zo, _ = _layer_depths(cfg.ocean.hoc)
    w.var("zo", "d", ("zo",), units="km", data=zo)
    w.var("xpa", "d", ("xpa",), units="km", data=1.0e-3 * g.xpa)
    w.var("xta", "d", ("xta",), units="km", data=1.0e-3 * g.xta)
    w.var("ypa", "d", ("ypa",), units="km", data=1.0e-3 * g.ypa)
    w.var("yta", "d", ("yta",), units="km", data=1.0e-3 * g.yta)
    za, _ = _layer_depths(cfg.atmos.hat)
    w.var("za", "d", ("za",), units="km", data=za)

    w.var("sst", "d", ("yto", "xto"), units="K", data=ocean.sst)
    w.var("sstm", "d", ("yto", "xto"), units="K", data=ocean.sstm)
    w.var("po", "d", ("zo", "ypo", "xpo"), units="m^2/s^2",
          data=ocean.po)
    w.var("pom", "d", ("zo", "ypo", "xpo"), units="m^2/s^2",
          data=ocean.pom)
    w.var("ast", "d", ("yta", "xta"), units="K", data=atmos.ast)
    w.var("astm", "d", ("yta", "xta"), units="K", data=atmos.astm)
    w.var("hmixa", "d", ("yta", "xta"), units="m", data=atmos.hmixa)
    w.var("hmixam", "d", ("yta", "xta"), units="m", data=atmos.hmixam)
    w.var("pa", "d", ("za", "ypa", "xpa"), units="m^2/s^2",
          data=atmos.pa)
    w.var("pam", "d", ("za", "ypa", "xpa"), units="m^2/s^2",
          data=atmos.pam)
    w.close()


def load_restart(path: str, model):
    """Read restart.nc -> (OceanState, AtmosState, tini_years).
    PV and the constraint scalars are rederived from the pressures
    (q-gcm.F:711-750), which is what makes the checkpoint exact."""
    from ..models.ocean import init_ocean_state
    from ..models.atmos import init_atmos_state

    d = read_vars(path, ["time", "sst", "sstm", "po", "pom",
                         "ast", "astm", "hmixa", "hmixam", "pa", "pam"])
    ocean = init_ocean_state(model, po=d["po"], pom=d["pom"],
                             sst=d["sst"], sstm=d["sstm"])
    atmos = init_atmos_state(model, pa=d["pa"], pam=d["pam"],
                             ast=d["ast"], astm=d["astm"],
                             hmixa=d["hmixa"], hmixam=d["hmixam"])
    return ocean, atmos, float(np.ravel(d["time"])[0])
