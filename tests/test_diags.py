"""Diagnostics tests: validity scan, CFL, monitor energy budget."""

import numpy as np
import pytest
from scipy.io import netcdf_file

from qgcm_tpu.config import double_gyre_coupled, OceanConfig
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import init_ocean_state
from qgcm_tpu.models.atmos import init_atmos_state
from qgcm_tpu.models.stepper import make_coupled_runner
from qgcm_tpu.coupling import make_xforc
from qgcm_tpu.diags import compute_monitor, MonitorWriter, valids, \
    cfl_numbers


@pytest.fixture(scope="module")
def setup():
    cfg = double_gyre_coupled(nxta=24, nyta=12, nxaooc=8, nyaooc=8,
                              ndxr=4, dta=180.0,
                              ocean=OceanConfig(dxo=20.0e3))
    model = build_model(cfg)
    oc = init_ocean_state(model, init="rbal")
    at = init_atmos_state(model, init="rbal")
    oc, at = make_coupled_runner(model)(oc, at, 300)
    ofor, afor, _ = make_xforc(model)(at.pam, oc.pom, oc.sstm,
                                      at.astm, at.hmixam)
    return model, oc, at, ofor, afor


def test_valids_ok(setup):
    model, oc, at, ofor, afor = setup
    rep = valids(model, oc, at, ofor, afor)
    assert bool(rep.ok)
    assert float(rep.thinpc) == 0.0
    assert 0 < float(rep.pamax) < 1e7


def test_valids_catches_blowup(setup):
    model, oc, at, ofor, afor = setup
    bad = oc._replace(po=oc.po.at[0, 5, 5].set(1.0e12))
    assert not bool(valids(model, bad, at, ofor, afor).ok)
    nan = oc._replace(sst=oc.sst.at[3, 3].set(np.nan))
    assert not bool(valids(model, nan, at, ofor, afor).ok)


def test_cfl_sane(setup):
    model, oc, at, ofor, afor = setup
    cfl = cfl_numbers(model, oc, at, ofor, afor)
    assert 0 < float(cfl.cnqgat) < 1.0     # stable run => CFL < 1
    assert 0 <= float(cfl.cnqgoc) < 1.0
    assert cfl.ugmaxat.shape == (model.cfg.nla,)


def test_monitor_energy_magnitudes(setup):
    """Energy-budget sanity on a spun-up state: KE positive, del4
    dissipation non-negative, and the KE tendency is bounded by the
    sum of source/sink magnitudes (loose closure: the budget terms
    must be the dominant balance, not orders of magnitude off)."""
    model, oc, at, ofor, afor = setup
    rec = compute_monitor(model, oc, at, ofor, afor)
    assert (np.asarray(rec.oc.kea) >= 0).all()
    assert (np.asarray(rec.at.kea) >= 0).all()
    assert (np.asarray(rec.oc.ah4d) >= -1e-12).all()
    assert float(rec.btdgoc) >= 0.0
    ddt = float(np.abs(np.asarray(rec.at.ddtke)).sum())
    srcs = (abs(float(rec.at.utau)) + abs(float(rec.at.pken))
            + float(np.abs(np.asarray(rec.at.ah4d)).sum())
            + float(np.abs(np.asarray(rec.at.ddtpe)).sum()))
    assert ddt < 50.0 * (srcs + 1e-12)


def test_monitor_writer_schema(setup, tmp_path):
    model, oc, at, ofor, afor = setup
    rec = compute_monitor(model, oc, at, ofor, afor)
    w = MonitorWriter(str(tmp_path / "monit.nc"), model)
    w.append(rec, 0.01)
    w.append(rec, 0.02)
    w.close()
    with netcdf_file(str(tmp_path / "monit.nc"), "r", mmap=False) as f:
        for name in ["kealoc", "kealat", "ddtkeoc", "ddtpeat", "utauoc",
                     "btdgoc", "ah4doc", "ermaso", "emfrat", "cnqgoc",
                     "olrtop", "sstmin", "astmax", "occtot"]:
            assert name in f.variables, name
        assert f.variables["kealoc"].shape == (2, model.cfg.nlo)
        assert np.isfinite(f.variables["utauoc"][:]).all()


def test_covariance_matches_numpy(setup):
    """Streaming shift-compensated moments equal a direct NumPy
    covariance over the same snapshot sequence."""
    import numpy as np
    from qgcm_tpu.diags.covaria import (zero_cov, cov_size,
                                        accumulate_cov, finalize_cov)
    model, oc, at, ofor, afor = setup
    rng = np.random.default_rng(3)
    ny, nx, stride = 10, 14, 2
    nv = cov_size(ny, nx, stride)
    acc = zero_cov(nv)
    snaps = []
    for _ in range(7):
        f = 15.0 + rng.standard_normal((ny, nx))
        snaps.append(f[::stride, ::stride].reshape(-1))
        import jax.numpy as jnp
        acc = accumulate_cov(acc, jnp.asarray(f), stride)
    mean, cov = finalize_cov(acc)
    X = np.stack(snaps)
    np.testing.assert_allclose(mean, X.mean(0), rtol=1e-12)
    np.testing.assert_allclose(cov, np.cov(X.T, ddof=1), rtol=1e-9,
                               atol=1e-12)
