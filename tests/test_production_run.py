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
    # golden values (docs/production_run.md, round-5 ml_f64
    # regeneration): loose 30% envelope -- a different but healthy
    # realisation stays inside (the round-4 record's [6295, 5108,
    # 14619] does); constraint leakage / dissipation bugs do not
    np.testing.assert_allclose(ke[-1], [5739.0, 4979.0, 15003.0],
                               rtol=0.30)
    assert 1.3e5 < float(te[-1]) < 3.0e5


def test_production_constraints_and_cfl(qd):
    """The always-on invariant monitors over the full 5 years:
    mass/momentum constraint closure at rounding level, CFL under the
    reference's own warning criterion cflcrit = 0.8 (cfltry,
    q-gcm.F:2148-2149 -- warn-only; measured maxima 0.488 on the
    round-4 realisation, 0.551 on the round-5 ml_f64 regeneration),
    SST inside the valids hard limits (valsubs.F:77-81)."""
    with netcdf_file(os.path.join(RUNDIR, "monit.nc"), "r",
                     mmap=False) as f:
        g = {n: f.variables[n][:].copy() for n in
             ("emfroc", "emfrat", "ermaso", "cnqgoc", "cnqgat",
              "cnmlat")}
    assert np.abs(g["emfroc"]).max() < 1e-6
    assert np.abs(g["emfrat"]).max() < 1e-6
    assert np.abs(g["ermaso"]).max() < 1e-6
    assert g["cnqgoc"].max() < 0.8
    assert g["cnqgat"].max() < 0.8
    assert g["cnmlat"].max() < 0.8


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


# ---------------------------------------------------------------------
# k247_eddy_1yr: the fork's namesake experiment at production scale --
# unforced inviscid analytic eddy on the default 4 km cyclic 1.5-layer
# config (zero forcing per k247_make_forcing_q-gcm.F90:126-135).
# Being unforced AND inviscid, the run is itself the energy-
# conservation and beta-drift oracle. Numbers: docs/production_run.md.
# ---------------------------------------------------------------------

K247DIR = os.path.join(os.path.dirname(__file__), "..", "examples",
                       "k247_eddy_1yr", "outdata")


@pytest.fixture(scope="module")
def k247():
    if not os.path.exists(os.path.join(K247DIR, "monit.nc")):
        pytest.skip("k247 production monit.nc not present")
    from qgcm_tpu.analysis import QgcmData
    return QgcmData(K247DIR)


def test_k247_energy_conservation_production_scale(k247):
    """Unforced + inviscid for 73k f32 steps: layer-1 total energy
    (KE1 + PE; layer 2 is the 3.2e20 m rest layer whose depth-weighted
    'KE' is rounding noise) conserved to well under 1%."""
    e = k247.energy_series()
    ke1 = e["keocavg"][:, 0]
    pe = e["peocavg"][:, 0]
    te1 = ke1 + pe
    assert len(te1) == 365
    spread = (te1.max() - te1.min()) / te1[0]
    assert spread < 0.02, spread          # measured 0.0041
    # the partition shifts KE->PE but both stay O(initial)
    assert 0.5 < ke1[-1] / ke1[0] < 1.1
    assert 0.9 < pe[-1] / pe[0] < 1.5


def test_k247_beta_drift_production_scale(k247):
    """The committed eddy track (sshmax_etc.nc from the 73-day ocpo
    snapshots): anticyclone drifts SOUTHWEST at ~beta*Rd^2 and stays
    coherent all year (the package's beta-drift oracle, at 960^2)."""
    with netcdf_file(os.path.join(K247DIR, "sshmax_etc.nc"), "r",
                     mmap=False) as f:
        hm = f.variables["hmax"][:].copy()
        hi = f.variables["hmax_i"][:].copy()
        hj = f.variables["hmax_j"][:].copy()
    assert len(hm) == 5
    # coherent, slowly decaying amplitude
    assert hm[-1] > 0.5 * hm[0]
    assert (np.diff(hm) < 0).all()
    # monotone westward + southward track (no wraparound in year 1)
    assert (np.diff(hi) < 0).all()
    assert (np.diff(hj) < 0).all()
    # westward speed ~ beta*Rd^2 (order check: 2-8 cm/s)
    dxo, nsko, days = 4.0e3, 4, 73.0 * 86400.0
    speed = (hi[0] - hi[-1]) * dxo * nsko / (4 * days)
    assert 0.02 < speed < 0.08, speed     # measured ~0.039 m/s


def test_k247_unforced_diagnostics_exact_zero(k247):
    """Wind work, bottom drag and KE-PE wind conversion are
    identically zero in an unforced inviscid run; the cyclic
    constraint monitor closes exactly; CFL stays tiny."""
    with netcdf_file(os.path.join(K247DIR, "monit.nc"), "r",
                     mmap=False) as f:
        for name in ("utauoc", "btdgoc", "pkenoc"):
            assert np.abs(f.variables[name][:]).max() == 0.0, name
        assert np.abs(f.variables["emfroc"][:]).max() < 1e-12
        assert f.variables["cnqgoc"][:].max() < 0.2


# ---------------------------------------------------------------------
# southern_ocean_forced_1yr: the FORCED cyclic regime at production
# scale -- an ACC-like windstress with nonzero, asymmetric wall values
# drives the channel momentum constraints through txis/txin
# (xfosubs.F:568-707 -> ocisubs.F:169-327) for 58,400 ocean steps.
# The unforced k247 run pins the same constraint algebra with the
# stress terms identically zero; this one pins it with them ACTIVE.
# Numbers: docs/production_run.md.
# ---------------------------------------------------------------------

SODIR = os.path.join(os.path.dirname(__file__), "..", "examples",
                     "southern_ocean_forced_1yr", "outdata")


@pytest.fixture(scope="module")
def sforced():
    if not os.path.exists(os.path.join(SODIR, "monit.nc")):
        pytest.skip("forced-channel production monit.nc not present")
    from qgcm_tpu.analysis import QgcmData
    return QgcmData(SODIR)


def test_forced_channel_windwork_drives_spinup(sforced):
    """Wind work is strictly positive at every record (the
    txis/txin-bearing stress forcing is ACTIVE all year), bottom drag
    responds and grows toward balance, and the wind spins up all
    three layers from rest."""
    with netcdf_file(os.path.join(SODIR, "monit.nc"), "r",
                     mmap=False) as f:
        t = f.variables["time"][:].copy()
        ke = f.variables["kealoc"][:].copy()
        ut = f.variables["utauoc"][:].copy()
        bt = f.variables["btdgoc"][:].copy()
    assert len(t) == 365
    assert (ut > 0).all()                    # forced, every record
    assert (bt > 0).all()
    # drag grows by orders of magnitude toward wind-work balance
    # (Ekman spindown 281 d: equilibration is multi-year by design)
    assert bt[-1] > 100.0 * bt[0]
    assert 0.1 < bt[-1] / ut[-1] < 1.0       # measured 0.55
    # all layers energised from near-rest (measured [1141, 1794, 6812])
    assert (ke[0] < 50.0).all()
    assert (ke[-1] > 500.0).all()
    np.testing.assert_allclose(ke[-1], [1141.0, 1794.0, 6812.0],
                               rtol=0.5)
    # spin-up, not blow-up: monotone-ish late growth, finite
    assert np.isfinite(ke).all()


def test_forced_channel_constraints_close_under_forcing(sforced):
    """THE point of this run: with txis/txin forcing the leapfrogged
    channel momentum constraints at every step, the constraint
    monitors still close at rounding level (< 1e-3 reference bar;
    measured 4.6e-41), CFL stays tiny, SST stays inside the valids
    hard limits."""
    with netcdf_file(os.path.join(SODIR, "monit.nc"), "r",
                     mmap=False) as f:
        g = {n: f.variables[n][:].copy() for n in
             ("emfroc", "ermaso", "cnqgoc", "sstmin", "sstmax")}
    assert np.abs(g["emfroc"]).max() < 1e-3
    assert np.abs(g["ermaso"]).max() < 1e-3
    assert g["cnqgoc"].max() < 0.5           # measured 0.029
    assert g["sstmin"].min() > -35.0
    assert g["sstmax"].max() < 60.0


def test_forced_channel_energy_series(sforced):
    """analysis-layer energy budget on the forced channel: total
    energy grows through spin-up (te_fin/te_ini ~ 2.25) with PE and
    KE both finite and positive."""
    e = sforced.energy_series()
    te = e["te"]
    assert np.isfinite(te).all() and (te > 0).all()
    assert 1.5 < te[-1] / te[0] < 4.0        # measured 2.25
    assert (e["keocavg"][-1] > 0).all()
    assert (e["peocavg"][-1] > 0).all()
