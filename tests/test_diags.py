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
    # complete manifest of the reference monit.nc variable set: every
    # name defined by an nf_def_var call in monitor_diag.F (incl. the
    # reference's literal 'vmminatat' typo, :2311) plus coordinates.
    manifest = """
        ah2doc ah4dat ah4doc arlaav arocav astmax astmin atstpos
        atstval btdgoc centat centoc cfraat cfraoc cnmlat cnmloc
        cnqgat cnqgoc ddtkeat ddtkeoc ddtpeat ddtpeoc emfrat emfroc
        enamat enamoc entmat entmoc ermasa ermaso et2mat et2moc
        etamat etamoc hcmlat hfmloc hmlmat kealat kealoc occirc
        occtot ocjpos ocjval olrtop oradav osfmax osfmin pavgat
        pavgoc pkenat pkenoc qavgat qavgoc slhfav sstmax sstmin
        tmaooc tmlmat tmlmoc ttmadn ttmads ttmdfn ttmdfs ugmaxat
        ugmaxoc ugminat ugminoc ummaxat ummaxoc umminat umminoc
        utauat utauoc vfmadn vfmads vgmaxat vgmaxoc vgminat vgminoc
        vmmaxat vmmaxoc vmminatat vmminoc wapmat wapmoc watmat
        watmoc wepmat wepmoc wetmat wetmoc time zo zom za zam
    """.split()
    with netcdf_file(str(tmp_path / "monit.nc"), "r", mmap=False) as f:
        missing = [n for n in manifest if n not in f.variables]
        assert not missing, f"monit.nc missing vs reference: {missing}"
        assert f.variables["kealoc"].shape == (2, model.cfg.nlo)
        assert np.isfinite(f.variables["utauoc"][:]).all()
        # jet diagnostics: integer rows within range, speeds finite
        ojp = f.variables["ocjpos"][:]
        assert ojp.dtype.kind == "i"
        assert (ojp >= 1).all() and (ojp <= model.cfg.nyto).all()
        assert np.isfinite(f.variables["atstval"][:]).all()
        # mid-layer depth coordinates (monnc_init, monitor_diag.F:2966)
        hoc = np.asarray(model.cfg.ocean.hoc)
        np.testing.assert_allclose(
            f.variables["zo"][:],
            1e-3 * (np.cumsum(hoc) - 0.5 * hoc), rtol=1e-6)


def _np_block_sum_t(f, nsi):
    """Direct NumPy transcription of tsampl's block sums."""
    ny, nx = f.shape
    by, bx = ny // nsi, nx // nsi
    return (f[:by * nsi, :bx * nsi]
            .reshape(by, nsi, bx, nsi).sum(axis=(1, 3)).reshape(-1))


def _np_trap_sum_p(f, nsi):
    """Direct NumPy transcription of psampl's trapezoid window sums."""
    ny, nx = f.shape
    by, bx = (ny - 1) // nsi, (nx - 1) // nsi
    w = np.ones(nsi + 1)
    w[0] = w[-1] = 0.5
    out = np.empty(by * bx)
    for js in range(by):
        for is_ in range(bx):
            blk = f[js * nsi:js * nsi + nsi + 1,
                    is_ * nsi:is_ * nsi + nsi + 1]
            out[js * bx + is_] = w @ blk @ w
    return out


def test_covariance_matches_numpy(setup):
    """Streaming packed moments over block-summed subsamples equal a
    direct NumPy covariance of the same subsampled snapshot sequence
    (reference tsampl/psampl/dssp semantics with nsi > 1)."""
    import numpy as np
    import jax.numpy as jnp
    from qgcm_tpu.diags.covaria import (zero_cov, cov_size,
                                        accumulate_cov, finalize_cov,
                                        unpack_cov)
    rng = np.random.default_rng(3)
    for grid, (ny, nx), nsi, np_sub in [
            ("t", (12, 16), 4, _np_block_sum_t),
            ("t", (10, 14), 1, _np_block_sum_t),
            ("p", (13, 17), 4, _np_trap_sum_p)]:
        nv = cov_size(ny, nx, nsi, grid=grid)
        acc = zero_cov(nv)
        snaps = []
        for _ in range(7):
            f = 15.0 + rng.standard_normal((ny, nx))
            snaps.append(np_sub(f, nsi))
            acc = accumulate_cov(acc, jnp.asarray(f), nsi, grid=grid)
        mean, ssp, swt = finalize_cov(acc)
        X = np.stack(snaps)
        assert swt == 7.0
        np.testing.assert_allclose(mean, X.mean(0), rtol=1e-12)
        # packed unnormalised SSP == (n-1) * covariance
        cov = unpack_cov(ssp, nv) / (len(snaps) - 1)
        np.testing.assert_allclose(cov, np.cov(X.T, ddof=1),
                                   rtol=1e-9, atol=1e-9)


def test_timavge_face_fluxes_match_reference_loops(setup):
    """_ocean_faces/_atmos_faces equal a direct NumPy transcription of
    the reference accumulation loops (tavocn timavge.F:486-556, tavatm
    :340-400), and eddy_fluxes forms <uT> - <u><T> on the face grids."""
    import jax.numpy as jnp
    from qgcm_tpu.diags.timavge import (_ocean_faces, _atmos_faces,
                                        zero_ocean_averages,
                                        zero_atmos_averages,
                                        accumulate_ocean,
                                        accumulate_atmos, eddy_fluxes)
    model, oc, at, ofor, afor = setup
    cfg = model.cfg
    g = model.grids

    # --- ocean (box: no-normal-flux boundaries) ---
    sst = np.asarray(oc.sst, np.float64)
    po1 = np.asarray(oc.po[0], np.float64)
    tx = np.asarray(ofor.tauxo, np.float64)
    ty = np.asarray(ofor.tauyo, np.float64)
    uvgfac = cfg.ycexp / (g.dxo * cfg.fnot)
    rhf0hm = 0.5 / (cfg.fnot * cfg.mixed.hmoc)
    nyto, nxpo = cfg.nyto, cfg.nxpo
    uuf = np.zeros((nyto, nxpo))
    tuf = np.zeros((nyto, nxpo))
    for j in range(nyto):
        tuf[j, 0] = sst[j, 0]
        tuf[j, -1] = sst[j, -1]
        for i in range(1, nxpo - 1):
            uuf[j, i] = (-uvgfac * (po1[j + 1, i] - po1[j, i])
                         + rhf0hm * (ty[j + 1, i] + ty[j, i]))
            tuf[j, i] = 0.5 * (sst[j, i] + sst[j, i - 1])
    nypo, nxto = cfg.nypo, cfg.nxto
    vvf = np.zeros((nypo, nxto))
    tvf = np.zeros((nypo, nxto))
    for i in range(nxto):
        tvf[0, i] = sst[0, i]
        tvf[-1, i] = sst[-1, i]
    for j in range(1, nypo - 1):
        for i in range(nxto):
            vvf[j, i] = (uvgfac * (po1[j, i + 1] - po1[j, i])
                         - rhf0hm * (tx[j, i + 1] + tx[j, i]))
            tvf[j, i] = 0.5 * (sst[j, i] + sst[j - 1, i])
    ju, jt, jv, jtv = _ocean_faces(model, oc.sst, oc.po[0], ofor.tauxo,
                                   ofor.tauyo, model.rad.tsbdy,
                                   model.rad.tnbdy)
    np.testing.assert_allclose(np.asarray(ju), uuf, atol=1e-12)
    np.testing.assert_allclose(np.asarray(jt), tuf, atol=1e-12)
    np.testing.assert_allclose(np.asarray(jv), vvf, atol=1e-12)
    np.testing.assert_allclose(np.asarray(jtv), tvf, atol=1e-12)

    # --- atmosphere (periodic x, v=0 on zonal walls) ---
    ast = np.asarray(at.ast, np.float64)
    pa1 = np.asarray(at.pa[0], np.float64)
    txa = np.asarray(afor.tauxa, np.float64)
    tya = np.asarray(afor.tauya, np.float64)
    rdxaf0 = 1.0 / (g.dxa * cfg.fnot)
    rhf0hma = 0.5 / (cfg.fnot * cfg.mixed.hmat)
    nyta, nxpa = cfg.nyta, cfg.nxpa
    uufa = np.zeros((nyta, nxpa))
    tufa = np.zeros((nyta, nxpa))
    for j in range(nyta):
        for i in range(nxpa):
            uufa[j, i] = (-rdxaf0 * (pa1[j + 1, i] - pa1[j, i])
                          - rhf0hma * (tya[j + 1, i] + tya[j, i]))
        tufa[j, 0] = tufa[j, -1] = 0.5 * (ast[j, 0] + ast[j, -1])
        for i in range(1, nxpa - 1):
            tufa[j, i] = 0.5 * (ast[j, i] + ast[j, i - 1])
    ju, jt, jv, jtv = _atmos_faces(model, at.ast, at.pa[0], afor.tauxa,
                                   afor.tauya)
    np.testing.assert_allclose(np.asarray(ju), uufa, atol=1e-12)
    np.testing.assert_allclose(np.asarray(jt), tufa, atol=1e-12)
    assert np.asarray(jv)[0].max() == 0.0 and np.asarray(jv)[-1].max() == 0.0

    # --- accumulation + eddy-flux formation over two snapshots ---
    dtype = jnp.dtype(cfg.dtype)
    oacc = zero_ocean_averages(cfg, dtype)
    aacc = zero_atmos_averages(cfg, dtype)
    oc2 = oc._replace(sst=oc.sst * 1.1)
    for o in (oc, oc2):
        oacc = accumulate_ocean(oacc, o, ofor, model)
        aacc = accumulate_atmos(aacc, at, afor, model)
    uptpoc, vptpoc = eddy_fluxes(oacc)
    assert uptpoc.shape == (cfg.nyto, cfg.nxpo)
    assert vptpoc.shape == (cfg.nypo, cfg.nxto)
    # same velocity both snapshots -> <uT>-<u><T> = 0 exactly
    np.testing.assert_allclose(uptpoc, 0.0, atol=1e-6)
    uptpat, vptpat = eddy_fluxes(aacc)
    assert uptpat.shape == (cfg.nyta, cfg.nxpa)
    assert vptpat.shape == (cfg.nypa, cfg.nxta)
    np.testing.assert_allclose(uptpat, 0.0, atol=1e-8)
