"""Model state pytrees.

Replaces the reference's mutable module arrays (src/ocstate_data.F,
src/atstate_data.F, src/intrfac_data.F, src/ochomog_data.F,
src/athomog_data.F) with immutable NamedTuple pytrees threaded through
the functional step. Leapfrog keeps two time levels of each prognostic
field (x and xm). Fields are [layer, y, x] / [y, x].
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class OceanState(NamedTuple):
    po: jnp.ndarray      # (nlo, nypo, nxpo) dynamic pressure
    pom: jnp.ndarray     # lagged pressure
    qo: jnp.ndarray      # (nlo, nypo, nxpo) potential vorticity
    qom: jnp.ndarray
    sst: jnp.ndarray     # (nyto, nxto) mixed layer temperature anomaly
    sstm: jnp.ndarray
    # mass constraint: area integrals of interface displacement
    # (src/ochomog_data.F dpioc/dpiocp)
    dpioc: jnp.ndarray   # (nlo-1,)
    dpiocp: jnp.ndarray
    # momentum constraints, cyclic ocean only (zeros otherwise):
    # leapfrog pairs of the S/N boundary constraint vectors
    ocncs: jnp.ndarray   # (nlo,)
    ocncn: jnp.ndarray
    ocncsp: jnp.ndarray
    ocncnp: jnp.ndarray


class AtmosState(NamedTuple):
    pa: jnp.ndarray      # (nla, nypa, nxpa)
    pam: jnp.ndarray
    qa: jnp.ndarray
    qam: jnp.ndarray
    ast: jnp.ndarray     # (nyta, nxta)
    astm: jnp.ndarray
    hmixa: jnp.ndarray   # (nyta, nxta) mixed layer thickness
    hmixam: jnp.ndarray
    dpiat: jnp.ndarray   # (nla-1,)
    dpiatp: jnp.ndarray
    atmcs: jnp.ndarray   # (nla,)
    atmcn: jnp.ndarray
    atmcsp: jnp.ndarray
    atmcnp: jnp.ndarray


class OceanForcing(NamedTuple):
    """Surface forcing of the ocean. Static in ocean_only runs
    (read from avges.nc / generated); recomputed by xforc when coupled."""
    tauxo: jnp.ndarray   # (nypo, nxpo) dynamic stress (m^2 s^-2)
    tauyo: jnp.ndarray
    fnetoc: jnp.ndarray  # (nyto, nxto) net diabatic forcing (W m^-2)
    wekto: jnp.ndarray   # (nyto, nxto) Ekman velocity at T points
    wekpo: jnp.ndarray   # (nypo, nxpo) Ekman velocity at p points
    txisoc: jnp.ndarray  # scalar: S-boundary taux line integral (cyclic)
    txinoc: jnp.ndarray  # scalar: N-boundary taux line integral (cyclic)


class AtmosForcing(NamedTuple):
    """Surface/diabatic forcing of the atmosphere (from xforc)."""
    tauxa: jnp.ndarray   # (nypa, nxpa)
    tauya: jnp.ndarray
    fnetat: jnp.ndarray  # (nyta, nxta)
    wekta: jnp.ndarray   # (nyta, nxta)
    wekpa: jnp.ndarray   # (nypa, nxpa)
    uekat: jnp.ndarray   # (nyta, nxpa) Ekman u at T-cell W/E faces
    vekat: jnp.ndarray   # (nypa, nxta) Ekman v at T-cell S/N faces
    txisat: jnp.ndarray  # scalar: S-boundary taux line integral
    txinat: jnp.ndarray  # scalar
