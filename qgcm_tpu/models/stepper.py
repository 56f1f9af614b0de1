"""Time-stepping drivers.

The reference main loop (src/q-gcm.F:1220-1491) interleaves physics,
cadenced diagnostics and I/O in one Fortran DO loop. Here the physics
is a pure `lax.scan` (compiled once, runs entirely on device); I/O and
diagnostics cadences are handled by the host driver slicing the run
into chunks (see qgcm_tpu/run.py).

Leapfrog computational-mode suppression (q-gcm.F:1325-1366): the
current time level is averaged with the lagged one, x <- (x+xm)/2,
after ocean substep n for (n-1) % 25 == 0 (and every 100 atmos steps
for the atmosphere). NOT a Robert-Asselin filter -- the lagged level
is left unchanged, exactly as the reference does.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..model import Model
from ..state import OceanState, OceanForcing
from .ocean import make_ocean_step

OCEAN_AVG_PERIOD = 25   # ocean substeps between time-level averagings
ATMOS_AVG_PERIOD = 100  # atmos steps between averagings


def average_ocean_levels(st: OceanState) -> OceanState:
    """x <- (x + xm)/2 for the current time level only
    (q-gcm.F:1328-1366 including the constraint variables)."""
    return st._replace(
        po=0.5 * (st.po + st.pom),
        qo=0.5 * (st.qo + st.qom),
        sst=0.5 * (st.sst + st.sstm),
        dpioc=0.5 * (st.dpioc + st.dpiocp),
        ocncs=0.5 * (st.ocncs + st.ocncsp),
        ocncn=0.5 * (st.ocncn + st.ocncnp),
    )


def make_ocean_only_runner(model: Model, jit: bool = True):
    """Returns run(state, forcing, n_steps, step0=0) -> (state, diags).

    `step0` is the 0-based index of the first ocean substep taken by
    this call, so chunked host loops keep the averaging cadence
    aligned (averaging fires after substeps with index % 25 == 0).
    """
    step = make_ocean_step(model)

    def run(state: OceanState, forcing: OceanForcing, n_steps: int,
            step0=0):
        def body(carry, _):
            st, n = carry
            st, _diags = step(st, forcing)
            st = jax.lax.cond(n % OCEAN_AVG_PERIOD == 0,
                              average_ocean_levels, lambda s: s, st)
            return (st, n + 1), None

        (state, _), _ = jax.lax.scan(
            body, (state, jnp.asarray(step0)), None, length=n_steps)
        return state

    if jit:
        run = jax.jit(run, static_argnames=("n_steps",))
    return run
