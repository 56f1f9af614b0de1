"""Southern-ocean-style configurations: coupled model over a
zonally-CYCLIC ocean channel (nxaooc == nxta, the ocean spans the full
atmospheric x-extent) -- exercises the cyclic branch of the coupling
window, the channel momentum constraints in both fluids, and the
nb_hflux southern-hemisphere setup."""

import numpy as np
import pytest

from qgcm_tpu.config import ModelConfig, OceanConfig
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import init_ocean_state
from qgcm_tpu.models.atmos import init_atmos_state
from qgcm_tpu.models.stepper import make_coupled_runner
from qgcm_tpu.coupling import make_xforc
from qgcm_tpu.diags import compute_monitor, valids


@pytest.fixture(scope="module")
def setup():
    # miniature southern_ocean_coupled: 55S, cyclic ocean channel
    cfg = ModelConfig(
        nxta=24, nyta=18, nxaooc=24, nyaooc=6, ndxr=4,
        fnot=-1.19467e-4, beta=1.31301e-11, dta=180.0,
        ocean=OceanConfig(dxo=20.0e3),
        cyclic_ocean=True, nb_hflux=True).validate()
    model = build_model(cfg)
    oc = init_ocean_state(model, init="rbal")
    at = init_atmos_state(model, init="rbal")
    oc2, at2 = make_coupled_runner(model)(oc, at, 120)
    return model, oc2, at2


def test_cyclic_coupled_stable(setup):
    model, oc, at = setup
    for f in (oc.po, oc.qo, oc.sst, at.pa, at.ast, at.hmixa):
        assert np.isfinite(np.asarray(f)).all()
    # cyclicity of ocean p-fields maintained through the coupling
    assert np.allclose(np.asarray(oc.po[..., 0]),
                       np.asarray(oc.po[..., -1]))


def test_cyclic_coupled_forcing_window(setup):
    """With nxaooc == nxta the ocean stress window is the full fine
    grid; tauxo must stay x-cyclic and nonzero once the atmosphere
    spins up."""
    model, oc, at = setup
    ofor, afor, _ = make_xforc(model)(at.pam, oc.pom, oc.sstm,
                                      at.astm, at.hmixam)
    tx = np.asarray(ofor.tauxo)
    assert np.abs(tx).max() > 0
    assert np.allclose(tx[:, 0], tx[:, -1])
    assert np.isfinite(float(ofor.txisoc)) and \
        np.isfinite(float(afor.txisat))


def test_cyclic_coupled_constraints_close(setup):
    """Both fluids' continuity-constraint monitors stay tiny in the
    fully cyclic coupled configuration."""
    model, oc, at = setup
    ofor, afor, _ = make_xforc(model)(at.pam, oc.pom, oc.sstm,
                                      at.astm, at.hmixam)
    from qgcm_tpu.models.ocean import make_ocean_step
    from qgcm_tpu.models.atmos import make_atmos_step
    _, od = make_ocean_step(model)(oc, ofor)
    _, ad = make_atmos_step(model)(at, afor)
    assert float(np.abs(np.asarray(od.emfroc)).max()) < 1e-3
    assert float(np.abs(np.asarray(ad.emfrat)).max()) < 1e-3
    rep = valids(model, oc, at, ofor, afor)
    assert bool(rep.ok)


def test_southern_hemisphere_signs(setup):
    """f0 < 0: monitoring still produces positive KE and the Ekman
    machinery stays finite (sign-sensitive paths: uvekfc, bdrfac,
    fsprim sign via fspco)."""
    model, oc, at = setup
    ofor, afor, _ = make_xforc(model)(at.pam, oc.pom, oc.sstm,
                                      at.astm, at.hmixam)
    rec = compute_monitor(model, oc, at, ofor, afor)
    assert (np.asarray(rec.oc.kea) >= 0).all()
    assert (np.asarray(rec.at.kea) >= 0).all()
    assert float(rec.btdgoc) >= 0
    assert model.rad.fspco < 0   # southern hemisphere perturbation
