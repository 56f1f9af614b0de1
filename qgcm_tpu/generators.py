"""Initial-condition and forcing factories.

Replaces the k247 fork's standalone Fortran tools:
  src/k247_make_restart_q-gcm.F90 -- analytic Gaussian-eddy (Early et
    al. 2011 JPO) initial condition (and eddy pairs);
  src/k247_make_forcing_q-gcm.F90 -- mean-forcing file for ocean-only
    runs (the k247 tool writes zero forcing for unforced eddy runs).

Also provides an analytic double-gyre windstress for forced
ocean-only benchmarks.
"""

from __future__ import annotations

import numpy as np

from .config import ModelConfig
from .grids import Grids

GRAV = 9.8


def eddy_pressure(cfg: ModelConfig, ssh_amp: float = 0.15,
                  l_efold: float = 80.0e3, po2_percent: float = 0.0,
                  cnt_dist: float = 0.0, pair_amp: float = 0.0):
    """Gaussian-eddy initial pressure (k247_make_restart_q-gcm.F90:
    220-262): ssh = A exp(-r^2/L^2) centred at the domain centre,
    po(1) = g*ssh, po(2) = (po2_percent/100)*po(1), deeper layers 0.
    Optionally an eddy pair offset by +-cnt_dist*l_efold in y.

    Returns po of shape (nlo, nypo, nxpo)."""
    dxo = cfg.ocean.dxo
    dyo = dxo
    nxpo, nypo, nlo = cfg.nxpo, cfg.nypo, cfg.nlo
    i_e, j_e = cfg.nxto // 2, cfg.nyto // 2
    # reference loop index i in -ini_ilen..ini_ilen maps to column i+i_e
    # (1-based) => 0-based column index c has i = c + 1 - i_e
    ii = np.arange(nxpo) + 1 - i_e
    jj = np.arange(nypo) + 1 - j_e
    j_dist = int((cnt_dist * l_efold) / dyo)

    def gauss(joff):
        r2 = ((dxo * ii[None, :]) ** 2
              + (dyo * (jj[:, None] - joff)) ** 2)
        return np.exp(-r2 / l_efold**2)

    ssh = ssh_amp * gauss(j_dist) + pair_amp * ssh_amp * gauss(-j_dist)
    po = np.zeros((nlo, nypo, nxpo))
    po[0] = GRAV * ssh
    if nlo > 1:
        po[1] = (po2_percent / 100.0) * po[0]
    return po


def zero_forcing(cfg: ModelConfig):
    """k247_make_forcing equivalent: zero mean forcing
    (tauxo, tauyo, fnetoc)."""
    return (np.zeros((cfg.nypo, cfg.nxpo)),
            np.zeros((cfg.nypo, cfg.nxpo)),
            np.zeros((cfg.nyto, cfg.nxto)))


def double_gyre_windstress(cfg: ModelConfig, grids: Grids,
                           tau0: float = 2.0e-5):
    """Classic double-gyre dynamic windstress for forced box-ocean
    runs: tau_x = -tau0 * cos(2 pi y / ylo), tau_y = 0.
    tau0 is a KINEMATIC (dynamic) stress in m^2 s^-2; the default
    2e-5 m^2 s^-2 corresponds to ~0.02 N m^-2 over 1000 kg m^-3 water,
    a gentle forcing comparable to the coupled model's own stress."""
    yrel = (grids.ypo - grids.ypo[0]) / grids.ylo
    taux = -tau0 * np.cos(2.0 * np.pi * yrel)
    tauxo = np.broadcast_to(taux[:, None], (cfg.nypo, cfg.nxpo)).copy()
    tauyo = np.zeros((cfg.nypo, cfg.nxpo))
    fnetoc = np.zeros((cfg.nyto, cfg.nxto))
    return tauxo, tauyo, fnetoc
