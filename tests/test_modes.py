"""Configuration-variant coverage: the reference's CPP feature flags
(make.config: atmos_only, sb_hflux/nb_hflux, tau_udiff, no_oml_k247)
and the topography modes, exercised end-to-end."""

import numpy as np
import pytest

from qgcm_tpu.config import (ModelConfig, OceanConfig, AtmosConfig,
                             double_gyre_coupled)
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import (init_ocean_state,
                                   ocean_forcing_from_mean,
                                   make_ocean_step)
from qgcm_tpu.models.atmos import init_atmos_state
from qgcm_tpu.models.stepper import (make_atmos_only_runner,
                                     make_coupled_runner)
from qgcm_tpu.generators import zero_forcing, eddy_pressure
from qgcm_tpu.coupling import make_xforc


def _coupled_cfg(**over):
    return double_gyre_coupled(nxta=24, nyta=12, nxaooc=8, nyaooc=8,
                               ndxr=4, dta=180.0,
                               ocean=OceanConfig(dxo=20.0e3), **over)


def test_atmos_only_mode():
    """atmos_only: prescribed mean SST drives the atmosphere
    (q-gcm.F:752-775)."""
    cfg = _coupled_cfg(atmos_only=True)
    model = build_model(cfg)
    at = init_atmos_state(model, init="rbal")
    sst_mean = np.broadcast_to(
        model.rad.sstbar[:, None], (cfg.nyto, cfg.nxto)).copy()
    run = make_atmos_only_runner(model)
    at2 = run(at, sst_mean, 60)
    assert np.isfinite(np.asarray(at2.pa)).all()
    assert np.isfinite(np.asarray(at2.ast)).all()
    # radiative forcing spins the channel up from rest
    assert float(np.abs(np.asarray(at2.qa) - np.asarray(at.qa)).max()) > 0


def test_topography_define_and_array():
    """'define' builds the reference's test features (mid-Atlantic
    ridge / sloping Rockies); a user array passes through; the dynamic
    topography enters the bottom-layer PV."""
    # domain must be wide enough to contain the reference's built-in
    # features (ocean ridge at x = 2000-2600 km, topsubs.F:120-133;
    # atmos ridge near x = 8800 km, :270-298)
    cfg = double_gyre_coupled(nxta=128, nyta=32, nxaooc=18, nyaooc=8,
                              ndxr=8, dta=180.0,
                              ocean=OceanConfig(dxo=20.0e3))
    m_flat = build_model(cfg)
    # atmver=False: at this shrunken domain the 'define' Rockies
    # overlap the ocean footprint, which topset-style validation
    # correctly rejects in normal running (topsubs.F:392-416)
    m_def = build_model(cfg, topocname="define", topatname="define",
                        atmver=False)
    assert float(np.abs(m_def.topo.dtopoc).max()) > 0
    assert float(np.abs(m_def.topo.ddynat).max()) > 0
    assert float(np.abs(m_flat.topo.ddynoc).max()) == 0

    cfg = _coupled_cfg()
    m_flat = build_model(cfg)
    custom = np.zeros((cfg.nypo, cfg.nxpo))
    custom[:, : cfg.nxpo // 2] = 500.0
    m_arr = build_model(cfg, topocname=custom)
    np.testing.assert_array_equal(m_arr.topo.dtopoc, custom)

    # ddyn shows up in the initial PV of the bottom layer
    oc_flat = init_ocean_state(m_flat, init="rbal")
    oc_topo = init_ocean_state(m_arr, init="rbal")
    dq = np.abs(np.asarray(oc_topo.qo[-1]) - np.asarray(oc_flat.qo[-1]))
    assert dq.max() > 0
    dq01 = np.abs(np.asarray(oc_topo.qo[0]) - np.asarray(oc_flat.qo[0]))
    assert dq01.max() == 0


def test_topography_coupled_run_stable():
    cfg = _coupled_cfg()
    model = build_model(cfg, topocname="define", topatname="define")
    oc = init_ocean_state(model, init="rbal")
    at = init_atmos_state(model, init="rbal")
    oc2, at2 = make_coupled_runner(model)(oc, at, 30)
    assert np.isfinite(np.asarray(oc2.po)).all()
    assert np.isfinite(np.asarray(at2.pa)).all()


@pytest.mark.parametrize("flag", ["sb_hflux", "nb_hflux"])
def test_boundary_heat_flux_modes(flag):
    """sb/nb_hflux: specified-temperature boundary allows heat flux
    through the corresponding wall (omlsubs.F modified BCs)."""
    fnot = 5.92e-5 if flag == "sb_hflux" else -5.92e-5
    beta = 2.08e-11
    cfg = ModelConfig(nxta=24, nyta=24, nxaooc=24, nyaooc=12, ndxr=2,
                      fnot=fnot, beta=beta,
                      ocean=OceanConfig(nlo=2, dxo=20e3, delek=0.0,
                                        hoc=(800.0, 3200.0),
                                        gpoc=(0.01,),
                                        tabsoc=(287.0, 282.0),
                                        ah2oc=(0.0, 0.0),
                                        ah4oc=(0.0, 0.0)),
                      ocean_only=True, cyclic_ocean=True,
                      **{flag: True}).validate()
    model = build_model(cfg)
    st = init_ocean_state(model, po=eddy_pressure(cfg))
    f = ocean_forcing_from_mean(model, *zero_forcing(cfg))
    step = make_ocean_step(model)
    for _ in range(10):
        st, _ = step(st, f)
    assert np.isfinite(np.asarray(st.sst)).all()


def test_tau_udiff_changes_stress():
    """tau_udiff: the windstress sees the ocean-relative velocity over
    the ocean box, so a moving ocean changes tau there but not over
    land (xfosubs.F:240-335)."""
    cfg0 = _coupled_cfg()
    cfgu = _coupled_cfg(tau_udiff=True)
    m0, mu = build_model(cfg0), build_model(cfgu)
    at = init_atmos_state(m0, init="rbal")
    oc = init_ocean_state(m0, po=eddy_pressure(cfg0, ssh_amp=0.5))
    f0 = make_xforc(m0)(at.pam, oc.pom, oc.sstm, at.astm, at.hmixam)
    fu = make_xforc(mu)(at.pam, oc.pom, oc.sstm, at.astm, at.hmixam)
    tx0 = np.asarray(f0[0].tauxo)
    txu = np.asarray(fu[0].tauxo)
    assert np.abs(tx0 - txu).max() > 0
    # atmospheric stress outside the ocean window unchanged
    ta0 = np.asarray(f0[1].tauxa)
    tau = np.asarray(fu[1].tauxa)
    nx1, ny1 = cfg0.nx1 - 1, cfg0.ny1 - 1
    land = np.ones_like(ta0, bool)
    land[ny1:ny1 + cfg0.nyaooc + 1, nx1:nx1 + cfg0.nxaooc + 1] = False
    np.testing.assert_allclose(ta0[land], tau[land], rtol=1e-12)


def test_no_oml_mode():
    """k247 no_oml: the ocean mixed layer is frozen; entrainment is
    zero and SST never changes."""
    cfg = ModelConfig(nxta=24, nyta=24, nxaooc=24, nyaooc=12, ndxr=2,
                      fnot=5.92e-5, beta=2.08e-11,
                      ocean=OceanConfig(nlo=2, dxo=20e3, delek=0.0,
                                        hoc=(800.0, 3200.0),
                                        gpoc=(0.01,),
                                        tabsoc=(287.0, 282.0),
                                        ah2oc=(0.0, 0.0),
                                        ah4oc=(0.0, 0.0)),
                      ocean_only=True, cyclic_ocean=True,
                      no_oml=True).validate()
    model = build_model(cfg)
    st = init_ocean_state(model, po=eddy_pressure(cfg), init="rbal")
    f = ocean_forcing_from_mean(model, *zero_forcing(cfg))
    step = make_ocean_step(model)
    st2 = st
    for _ in range(5):
        st2, _ = step(st2, f)
    np.testing.assert_array_equal(np.asarray(st.sst),
                                  np.asarray(st2.sst))
    assert not np.array_equal(np.asarray(st.po), np.asarray(st2.po))


def test_modon_initial_condition():
    """Larichev-Reznik modon IC: antisymmetric dipole in y, continuous
    across the matching radius, stable for a few steps."""
    from qgcm_tpu.generators import modon_pressure
    cfg = ModelConfig(nxta=24, nyta=24, nxaooc=24, nyaooc=12, ndxr=2,
                      fnot=5.92e-5, beta=2.08e-11,
                      ocean=OceanConfig(nlo=2, dxo=20e3, delek=0.0,
                                        hoc=(800.0, 3200.0),
                                        gpoc=(0.01,),
                                        tabsoc=(287.0, 282.0),
                                        ah2oc=(0.0, 0.0),
                                        ah4oc=(0.0, 0.0)),
                      ocean_only=True, cyclic_ocean=True).validate()
    model = build_model(cfg)
    rdef = float(model.modes_oc.rdef[1])
    po = modon_pressure(cfg, rdef)
    assert np.isfinite(po).all()
    assert np.abs(po[0]).max() > 0
    # dipole: roughly antisymmetric about the centre row
    j0 = cfg.nyto // 2 - 1   # the y = 0 (zero) line of the dipole
    up = po[0, j0 + 4, :]
    dn = po[0, j0 - 4, :]
    assert np.sign(up[np.abs(up).argmax()]) != \
        np.sign(dn[np.abs(dn).argmax()])
    st = init_ocean_state(model, po=po)
    f = ocean_forcing_from_mean(model, *zero_forcing(cfg))
    step = make_ocean_step(model)
    for _ in range(5):
        st, _ = step(st, f)
    assert np.isfinite(np.asarray(st.po)).all()


def test_topography_extant_and_validation(tmp_path):
    """'extant' uses a pre-supplied field unchanged (topsubs.F:146-163)
    and topset's validation runs: atmospheric topography over the
    ocean footprint aborts unless atmver=False (:392-416), and
    non-cyclic fields warn (:227-236, 425-437).  Golden toptest-style
    check: the 'define' ridge equals the analytic profile of
    topsubs.F:120-133 at pinned points."""
    import warnings
    cfg = double_gyre_coupled(nxta=128, nyta=32, nxaooc=18, nyaooc=8,
                              ndxr=8, dta=180.0,
                              ocean=OceanConfig(dxo=20.0e3))

    # --- toptest-equivalent golden values for 'define' ---
    m_def = build_model(cfg, topocname="define")
    g = m_def.grids
    xrel = g.xpo - g.xpo[0]
    # ridge apex 1000 m at x = 2300 km, zero outside [2000, 2600] km
    i_apex = int(np.argmin(np.abs(xrel - 2300.0e3)))
    expect = max(0.0, 1000.0 * (1.0 - abs(xrel[i_apex] - 2300.0e3)
                                / 300.0e3))
    assert m_def.topo.dtopoc[5, i_apex] == pytest.approx(expect)
    i_out = int(np.argmin(np.abs(xrel - 1000.0e3)))
    assert m_def.topo.dtopoc[5, i_out] == 0.0
    # dynamic topography scaling ddyn = f0 D / H_nlo (topsubs.F:454)
    np.testing.assert_allclose(
        m_def.topo.ddynoc,
        cfg.fnot / cfg.ocean.hoc[-1] * m_def.topo.dtopoc, rtol=1e-15)

    # --- extant passes a pre-existing field through unchanged ---
    rng = np.random.default_rng(0)
    pre = np.abs(rng.standard_normal((cfg.nypo, cfg.nxpo))) * 50.0
    m_ext = build_model(cfg, topocname="extant", extant_oc=pre)
    np.testing.assert_array_equal(m_ext.topo.dtopoc, pre)
    with pytest.raises(ValueError, match="extant"):
        build_model(cfg, topocname="extant")

    # --- atmos topography over the ocean footprint aborts ---
    bad = np.zeros((cfg.nypa, cfg.nxpa))
    j0, i0 = cfg.ny1 - 1, cfg.nx1 - 1
    bad[j0 + 2, i0 + 2] = 100.0
    bad[:, -1] = bad[:, 0]
    with pytest.raises(ValueError, match="over ocean"):
        build_model(cfg, topatname=bad)
    # ... unless dataset preparation is in progress (atmver=False)
    build_model(cfg, topatname=bad, atmver=False)

    # --- non-cyclic atmos topography warns ---
    noncyc = np.zeros((cfg.nypa, cfg.nxpa))
    noncyc[:, 0] = 10.0
    with pytest.warns(UserWarning, match="cyclic"):
        build_model(cfg, topatname=noncyc, atmver=False)


def test_topography_extant_from_case_topog(tmp_path):
    """Driver-level 'extant': input.params naming 'extant' picks up the
    topog.nc prepared in the case directory."""
    from qgcm_tpu.run import run_case
    from qgcm_tpu.params import RunParams
    from qgcm_tpu.topo import write_topog
    from qgcm_tpu.config import ModelConfig

    base = ModelConfig(nxta=24, nyta=24, nxaooc=24, nyaooc=12, ndxr=2,
                       fnot=5.92e-5, beta=2.08e-11,
                       ocean_only=True, cyclic_ocean=True)
    p = RunParams(trun=0.05 / 365.0, dta=150.0, nstr=3, dxo=20.0e3,
                  delek=0.0, valday=0.0, odiday=0.0, adiday=0.0,
                  dgnday=0.0, prtday=0.0, resday=0.0, dtavoc=0.0,
                  dtavat=0.0, ah2oc=(0.0, 0.0), ah4oc=(0.0, 0.0),
                  tabsoc=(287.0, 282.0), hoc=(800.0, 3200.0),
                  gpoc=(0.01,), name="zero", topocname="extant")
    from qgcm_tpu.params import params_to_config
    from qgcm_tpu.model import build_model as bm
    cfg = params_to_config(p, base)
    hills = 20.0 * np.ones((cfg.nypo, cfg.nxpo))
    prep = bm(cfg, topocname="extant", extant_oc=hills)
    case = tmp_path
    write_topog(str(case / "topog.nc"), prep)

    from qgcm_tpu.generators import zero_forcing
    res = run_case(p, base, str(case / "out"),
                   mean_forcing=zero_forcing(cfg), verbose=False)
    assert not res.aborted
    # missing topog.nc is a hard error
    p2 = RunParams(**{**p.__dict__})
    with pytest.raises(FileNotFoundError):
        run_case(p2, base, str(tmp_path / "empty" / "out"),
                 mean_forcing=zero_forcing(cfg), verbose=False)


def test_four_layer_coupled():
    """Layer counts are fully parametric (reference capability: 'need
    at least 2 layers in each fluid', parameters_data.F comments allow
    n layers): a 4-layer ocean under a 4-layer atmosphere builds,
    steps coupled, and stays finite. Mis-sized per-layer vectors must
    fail at validate() with a clear message, not deep in radiation."""
    import numpy as np
    import pytest
    from qgcm_tpu.config import (ModelConfig, OceanConfig, AtmosConfig,
                                 RadiationConfig)
    from qgcm_tpu.model import build_model
    from qgcm_tpu.models.ocean import init_ocean_state
    from qgcm_tpu.models.atmos import init_atmos_state
    from qgcm_tpu.models.stepper import make_coupled_runner
    from qgcm_tpu.generators import eddy_pressure

    kw = dict(nxta=24, nyta=12, nxaooc=8, nyaooc=8, ndxr=2, dta=150.0,
              ocean=OceanConfig(nlo=4, dxo=40e3,
                                hoc=(300., 800., 1100., 2000.),
                                gpoc=(0.05, 0.025, 0.0125),
                                tabsoc=(287., 284., 283., 282.),
                                ah2oc=(0., 0., 0., 0.),
                                ah4oc=(1e9,) * 4),
              atmos=AtmosConfig(nla=4,
                                hat=(1500., 2000., 3000., 3500.),
                                gpat=(1.2, 0.4, 0.2),
                                tabsat=(320., 330., 340., 350.),
                                ah4at=(1e14,) * 4))

    with pytest.raises(ValueError, match="zopt"):
        ModelConfig(**kw).validate()       # default 3-entry zopt

    cfg = ModelConfig(
        **kw, radiation=RadiationConfig(zopt=(2.0e4, 2.0e4, 2.5e4,
                                              3.0e4))).validate()
    model = build_model(cfg)
    oc = init_ocean_state(model, po=eddy_pressure(cfg))
    at = init_atmos_state(model, init="rbal")
    oc2, at2 = make_coupled_runner(model)(oc, at, 4 * cfg.nstr)
    assert oc2.po.shape == (4, 17, 17)
    assert at2.pa.shape == (4, 13, 25)
    assert np.isfinite(np.asarray(oc2.po)).all()
    assert np.isfinite(np.asarray(at2.pa)).all()
