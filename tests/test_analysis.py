"""Analysis layer tests (the Ruby MiniTest suites' assertions:
SSH-max extraction, KE/PE computation, energy-sum writers --
qgcm_k247.rb:664-724 -- against a real run directory)."""

import os

import numpy as np
import pytest
from scipy.io import netcdf_file

from qgcm_tpu.config import ModelConfig, OceanConfig
from qgcm_tpu.params import RunParams, params_to_config
from qgcm_tpu.run import Driver
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import init_ocean_state
from qgcm_tpu.models.atmos import init_atmos_state
from qgcm_tpu.generators import eddy_pressure, zero_forcing
from qgcm_tpu.analysis import (QgcmData, unify_monit, average_more,
                               cut_eddy, hmax_series)


@pytest.fixture(scope="module")
def rundir(tmp_path_factory):
    """A real (small) eddy run with snapshots + averages."""
    tmp = tmp_path_factory.mktemp("run")
    base = ModelConfig(nxta=24, nyta=24, nxaooc=24, nyaooc=12, ndxr=2,
                       fnot=5.92e-5, beta=2.08e-11,
                       ocean_only=True, cyclic_ocean=True)
    p = RunParams(trun=1.0 / 365.0, dta=150.0, nstr=3, dxo=20.0e3,
                  delek=0.0, valday=0.25, odiday=0.25, adiday=0.0,
                  dgnday=0.125, prtday=0.0, resday=0.0, dtavoc=0.5,
                  dtavat=0.0, ah2oc=(0.0, 0.0), ah4oc=(0.0, 0.0),
                  tabsoc=(287.0, 282.0), hoc=(800.0, 3.2e20),
                  gpoc=(0.01,), name="zero")
    cfg = params_to_config(p, base)
    model = build_model(cfg)
    drv = Driver(model, p, str(tmp), mean_forcing=zero_forcing(cfg),
                 ocavg_days=0.25, verbose=False)
    # eddy initial state
    oc = init_ocean_state(model, po=eddy_pressure(cfg))
    at = init_atmos_state(model, init="rbal")
    from qgcm_tpu.io import save_restart
    save_restart(str(tmp / "r0.nc"), model, oc, at, 0.0)
    p.name = str(tmp / "r0.nc")
    res = drv.run()
    assert not res.aborted
    return str(tmp), cfg


def test_analyze_cli_end_to_end(rundir, capsys):
    """`qgcm analyze <outdata>` on a driver-produced run directory
    runs the energy check and writes both derived-product files --
    the Ruby analysis entry point's workflow (analyze_data.rb /
    qgcm_k247.rb:391-454) through this framework's CLI."""
    d, cfg = rundir
    for f in ("monit_energy.nc", "sshmax_etc.nc"):
        p = os.path.join(d, f)
        if os.path.exists(p):
            os.remove(p)
    from qgcm_tpu.cli import main
    assert main(["analyze", d]) == 0
    out = capsys.readouterr().out
    assert "te_fin_over_ini" in out
    assert "emfroc: worst fractional error" in out
    with netcdf_file(os.path.join(d, "monit_energy.nc"), "r",
                     mmap=False) as f:
        te = f.variables["te"][:].copy()
        assert np.isfinite(te).all() and len(te) >= 2
    with netcdf_file(os.path.join(d, "sshmax_etc.nc"), "r",
                     mmap=False) as f:
        assert np.isfinite(f.variables["hmax"][:]).all()


def test_sshmax_tracking(rundir):
    d, cfg = rundir
    qd = QgcmData(d)
    t, hmax, hi, hj = qd.sshmax()
    assert len(t) >= 2
    # eddy amplitude ~15 cm, decays only slowly
    assert 10.0 < hmax[0] < 20.0
    assert hmax[-1] > 0.5 * hmax[0]
    path = qd.write_sshmax()
    with netcdf_file(path, "r", mmap=False) as f:
        assert np.allclose(f.variables["hmax"][:], hmax, rtol=1e-6)


def test_ke_pe_fields(rundir):
    d, cfg = rundir
    qd = QgcmData(d)
    with netcdf_file(os.path.join(d, "ocpo.nc"), "r", mmap=False) as f:
        p = f.variables["p"][0].copy()    # (nlo, ny, nx)
    ke = qd.ke2d(p[0], 0)
    pe = qd.pe2d(p[0], p[1], 0)
    assert (ke >= 0).all() and (pe >= 0).all()
    assert ke.max() > 0


def test_energy_check_and_writer(rundir):
    d, cfg = rundir
    qd = QgcmData(d)
    chk = qd.energy_check(verbose=False)
    # unforced inviscid eddy: total energy conserved within a few %
    assert 0.9 < chk["te_fin_over_ini"] < 1.1
    assert chk["te_min_over_max"] > 0.9
    path = qd.write_energy()
    with netcdf_file(path, "r", mmap=False) as f:
        te = f.variables["te"][:]
        ke0 = f.variables["keocavg0"][:]
        assert np.isfinite(te).all() and (ke0 > 0).all()


def test_prep_tools(rundir, tmp_path):
    d, cfg = rundir
    # unify two copies of the same monit (second treated as later seg)
    path = unify_monit([d], str(tmp_path / "monit_k247.nc"))
    with netcdf_file(path, "r", mmap=False) as f:
        assert "kealoc" in f.variables
    # ocavg re-averaging + hmax + cuteddy
    avgdir = os.path.join(d, "avg")
    files = sorted(os.listdir(avgdir))
    assert len(files) >= 2
    out = average_more(avgdir, 2, str(tmp_path))
    assert len(out) == len([f for f in files
                            if f.startswith("ocavg_")]) // 2
    hmax, hi, hj = hmax_series(avgdir)
    assert (hmax > 0).all()
    with netcdf_file(os.path.join(avgdir, files[0]), "r",
                     mmap=False) as f:
        po = f.variables["po"][:].copy()
    cut, (j, i) = cut_eddy(po, 5)
    assert cut.shape[0] == po.shape[0]
    assert cut.shape[1] <= 11 and cut.shape[2] <= 11
    assert cut.max() == po[0].max()
