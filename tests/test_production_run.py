"""Regression oracle on the committed 5-year production run.

The reference's de-facto regression test is the Ruby energy check
applied to a REAL run directory (chk_monit_energy_*,
/root/reference/qgcm_k247.rb:391-454, asserted against the "dx4km2y"
run at qgcm_k247.rb:664-724).  Here the same checks run on the
committed monit.nc + input_parameters.m of
examples/double_gyre_coupled_5yr (the canonical coupled double-gyre
at full reference size, 960^2x3 ocean / 384x96x3 atmos, 5 model
years from radiative balance).  Numbers documented in
docs/production_run.md; regenerate with
`qgcm run examples/double_gyre_coupled_5yr` and update BOTH in the
same commit if physics changes legitimately.
"""

import os

import numpy as np
import pytest
from scipy.io import netcdf_file

RUNDIR = os.path.join(os.path.dirname(__file__), "..", "examples",
                      "double_gyre_coupled_5yr", "outdata")


@pytest.fixture(scope="module")
def qd():
    if not os.path.exists(os.path.join(RUNDIR, "monit.nc")):
        pytest.skip("production monit.nc not present")
    from qgcm_tpu.analysis import QgcmData
    return QgcmData(RUNDIR)


def test_production_monit_schema(qd):
    """Full monitoring parity on a real run: 96/96 variables, the
    expected record count and span (trun=5 y, dgnday=2 d)."""
    with netcdf_file(os.path.join(RUNDIR, "monit.nc"), "r",
                     mmap=False) as f:
        assert len(f.variables) == 96
        t = f.variables["time"][:].copy()
    assert len(t) == 912
    assert abs(float(t[-1]) - 4.9973) < 1e-3
    assert abs(float(t[1] - t[0]) - 2.0 / 365.0) < 1e-6


def test_production_energy_check(qd):
    """Ruby chk_monit_energy semantics: the spin-up reaches an
    equilibrated eddying state with all reservoirs energised and no
    blow-up or decay."""
    e = qd.energy_series()
    t, te = e["time"], e["te"]
    assert np.isfinite(te).all() and (te > 0).all()
    # spin-up from rest: ~0.5 J/m^2 -> ~2.1e5 J/m^2
    assert te[0] < 10.0
    assert 1.0e5 < te[-1] < 1.0e6
    # final year is statistically steady (vacillation, not a trend)
    ly = t >= t[-1] - 1.0
    assert ly.sum() > 100
    spread = (te[ly].max() - te[ly].min()) / te[ly].mean()
    assert spread < 0.6
    # all three ocean layers energised; PE dominates (wind-driven gyre)
    ke, pe = e["keocavg"], e["peocavg"]
    assert (ke[-1] > 1.0e3).all()
    assert pe[-1].sum() > ke[-1].sum()
    # golden values (docs/production_run.md): loose 30% envelope --
    # a different but healthy realisation stays inside; constraint
    # leakage / dissipation bugs do not
    np.testing.assert_allclose(ke[-1], [6295.0, 5108.0, 14619.0],
                               rtol=0.30)
    assert 1.3e5 < float(te[-1]) < 3.0e5


def test_production_constraints_and_cfl(qd):
    """The always-on invariant monitors over the full 5 years:
    mass/momentum constraint closure at rounding level, CFL < 0.5
    (cfltry semantics), SST inside the valids hard limits
    (valsubs.F:77-81)."""
    with netcdf_file(os.path.join(RUNDIR, "monit.nc"), "r",
                     mmap=False) as f:
        g = {n: f.variables[n][:].copy() for n in
             ("emfroc", "emfrat", "ermaso", "cnqgoc", "cnqgat",
              "cnmlat")}
    assert np.abs(g["emfroc"]).max() < 1e-6
    assert np.abs(g["emfrat"]).max() < 1e-6
    assert np.abs(g["ermaso"]).max() < 1e-6
    assert g["cnqgoc"].max() < 0.5
    assert g["cnqgat"].max() < 0.5
    assert g["cnmlat"].max() < 0.5


def test_production_params_roundtrip(qd):
    """input_parameters.m carries the run's physical constants; the
    analysis layer derives PE from them (rhooc, gpoc) like the Ruby
    loader (qgcm_k247.rb:514-563)."""
    assert qd.rhooc == 1000.0
    np.testing.assert_allclose(qd.gpoc, [0.015, 0.0075])
    e = qd.energy_series()
    # PE = 0.5*rho*g'*<eta^2>: positive, finite, both interfaces
    assert e["peocavg"].shape[1] == 2
    assert (e["peocavg"][-1] > 0).all()
