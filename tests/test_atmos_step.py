"""Atmospheric step: stability, inversion exactness, constraint closure.

Mirrors the reference's built-in correctness oracles (SURVEY.md section
4): the ermasa/emfrat continuity monitors (atisubs.F:231-252) and the
PV <-> pressure consistency that ocqbdy/atqzbd rely on.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qgcm_tpu.config import double_gyre_coupled, OceanConfig
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import init_ocean_state
from qgcm_tpu.models.atmos import init_atmos_state, make_atmos_step
from qgcm_tpu.models.stepper import make_coupled_runner
from qgcm_tpu.coupling import make_xforc
from qgcm_tpu.ops.vorticity import qcomp
from qgcm_tpu.ops.integrals import xintp


@pytest.fixture(scope="module")
def setup():
    cfg = double_gyre_coupled(nxta=24, nyta=12, nxaooc=8, nyaooc=8,
                              ndxr=4, dta=180.0,
                              ocean=OceanConfig(dxo=20.0e3))
    model = build_model(cfg)
    oc = init_ocean_state(model, init="rbal")
    at = init_atmos_state(model, init="rbal")
    run = make_coupled_runner(model)
    oc2, at2 = run(oc, at, 51)
    return model, oc2, at2


def test_coupled_run_finite(setup):
    model, oc, at = setup
    for name, v in [("po", oc.po), ("qo", oc.qo), ("sst", oc.sst),
                    ("pa", at.pa), ("qa", at.qa), ("ast", at.ast),
                    ("hmixa", at.hmixa)]:
        assert np.isfinite(np.asarray(v)).all(), f"{name} not finite"
    # mixed layer thickness fixer keeps hmixa above hmamin
    assert float(at.hmixa.min()) >= model.cfg.mixed.hmamin


def test_atmos_inversion_exact(setup):
    """After a step, qcomp(pa) must reproduce qa at interior points:
    the inversion (with homogeneous corrections) solves exactly the
    discrete operator that qcomp applies."""
    model, oc, at = setup
    cfg = model.cfg
    xforc = make_xforc(model)
    _, afor, _ = xforc(at.pam, oc.pom, oc.sstm, at.astm, at.hmixam)
    at3, diags = make_atmos_step(model)(at, afor)

    amat = jnp.asarray(model.modes_at.amat)
    ddyn = jnp.asarray(model.topo.ddynat)
    q2 = qcomp(at3.pa, amat, jnp.asarray(model.grids.yparel),
               1.0 / model.grids.dxa**2, cfg.fnot, cfg.beta, ddyn,
               0, True)
    err = float(jnp.abs(q2[:, 1:-1, :] - at3.qa[:, 1:-1, :]).max())
    assert err < 1e-12 * float(jnp.abs(at3.qa).max())


def test_atmos_mass_constraint_closes(setup):
    """emfrat: fractional continuity error (two independent estimates
    of d/dt of the interface displacement integral) must be tiny."""
    model, oc, at = setup
    xforc = make_xforc(model)
    _, afor, _ = xforc(at.pam, oc.pom, oc.sstm, at.astm, at.hmixam)
    _, diags = make_atmos_step(model)(at, afor)
    assert float(jnp.abs(diags.emfrat).max()) < 1e-6


def test_atmos_dpiat_consistent(setup):
    """dpiat carried in the state equals the recomputed area integral
    of interface displacement (constr convention p(k)-p(k+1))."""
    model, oc, at = setup
    g = model.grids
    dpi = xintp(at.pa[:-1] - at.pa[1:], model.wap) * g.dxa * g.dya
    scale = float(jnp.abs(dpi).max()) + 1.0
    assert np.allclose(np.asarray(dpi), np.asarray(at.dpiat),
                       atol=1e-8 * scale)


def test_atmos_cyclicity(setup):
    """East column duplicates west column for all p-grid fields."""
    model, oc, at = setup
    for f in (at.pa, at.qa):
        assert np.allclose(np.asarray(f[..., 0]), np.asarray(f[..., -1]),
                           rtol=0, atol=1e-10 * float(jnp.abs(f).max()))
