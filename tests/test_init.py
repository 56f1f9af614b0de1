"""Init-time component tests: eigenmodes (vs analytic 2-layer and the
reference's printed dg_oo values), radiation balance invariants,
grids, topography."""

import numpy as np
import pytest

from qgcm_tpu import config as qc
from qgcm_tpu.grids import build_grids
from qgcm_tpu.modes import eigenmodes, amatrix
from qgcm_tpu.radiation import radiat, STEFAN


def test_amatrix_rows():
    a = amatrix((0.015, 0.0075), (350.0, 750.0, 2900.0))
    # A has zero row sums only for equal coefficients; instead check
    # tridiagonal structure and signs
    assert a[0, 1] < 0 and a[0, 0] == -a[0, 1]
    assert a[2, 1] < 0 and a[2, 2] == -a[2, 1]
    assert np.allclose(a[1, 1], -(a[1, 0] + a[1, 2]))


def test_two_layer_analytic():
    """For 2 layers the baroclinic eigenvalue is known analytically:
    lambda = (H1+H2)/(g' H1 H2)."""
    g, h1, h2, f0 = 0.01, 800.0, 3200.0, 5.92e-5
    m = eigenmodes((g,), (h1, h2), f0)
    lam = (h1 + h2) / (g * h1 * h2)
    assert np.isclose(m.cphs[1], 1.0 / np.sqrt(lam), rtol=1e-12)
    assert np.isclose(m.rdef[1], 1.0 / np.sqrt(lam) / f0, rtol=1e-12)
    # barotropic mode is constant with Flierl normalisation = 1
    np.testing.assert_allclose(m.cm2l[:, 0], 1.0, rtol=1e-12)
    # transforms are mutual inverses
    np.testing.assert_allclose(m.cm2l @ m.cl2m, np.eye(2), atol=1e-13)


def test_dg_oo_modes():
    """3-layer dg_oo ocean: deformation radii should be ~46 km and
    ~26 km (canonical Q-GCM values for these parameters)."""
    cfg = qc.double_gyre_ocean_only()
    m = eigenmodes(cfg.ocean.gpoc, cfg.ocean.hoc, cfg.fnot)
    rd = m.rdef[1:] / 1e3
    assert 30 < rd[0] < 60 and 10 < rd[1] < 30
    # modal eigenvalue equation A r = lambda r
    a = m.amat
    for mm in range(3):
        lam = 0.0 if mm == 0 else 1.0 / m.cphs[mm] ** 2
        np.testing.assert_allclose(a @ m.cm2l[:, mm],
                                   lam * m.cm2l[:, mm], atol=1e-12)


def test_radiation_balance():
    cfg = qc.double_gyre_ocean_only()
    g = build_grids(cfg)
    r = radiat(cfg, g)
    # Mean-state temperatures should be physically sensible
    assert 250 < r.tmbara < 320
    assert 250 < r.tmbaro < 320
    # Ocean m.l. balance (radsubs.f:188): lambda*(To-Ta) + sigma/2*To^4
    # - sigma*Ta^4... check the defining fixed-point relation directly
    lhs = r.tmbaro * (cfg.mixed.xlamda + STEFAN * r.tmbaro**3)
    rhs = (cfg.mixed.xlamda * r.tmbara + 0.5 * STEFAN * r.tmbara**4
           - cfg.radiation.fsbar)
    assert abs(lhs - rhs) < 1e-6 * abs(rhs)
    # rbal profiles antisymmetric about mid-latitude (sin profile)
    np.testing.assert_allclose(r.sstbar, -r.sstbar[::-1], atol=1e-10)
    # perturbation coefficient signed by hemisphere
    assert r.fspco == cfg.radiation.fspamp  # fnot > 0
    # entrainment coefficients finite
    assert np.all(np.isfinite(r.aface))


def test_grids_embedding():
    cfg = qc.double_gyre_ocean_only()
    g = build_grids(cfg)
    # ocean centred in atmosphere
    assert np.isclose(g.xpo[0] + g.xpo[-1], g.xpa[0] + g.xpa[-1])
    assert np.isclose(g.ypo[0] + g.ypo[-1], g.ypa[0] + g.ypa[-1])
    # shared resolution relation
    assert np.isclose(g.dxa, cfg.ndxr * g.dxo)
    # p/T staggering
    assert np.isclose(g.xto[0] - g.xpo[0], 0.5 * g.dxo)


def test_radiation_independent_quadrature_and_golden():
    """Init-time golden check in the spirit of radtest.f: (a) the
    top-of-atmosphere mean balance closes against INDEPENDENT adaptive
    quadrature (scipy quad vs the package's nz=10001 trapezoids +
    Newton), (b) Dmup re-derived by quad matches, and (c) the derived
    coefficients are pinned to 10 digits for the canonical coupled
    configuration (regression guard for sign/factor errors).
    Reference prints these 'to more significant figures (as a check
    when porting the code between different systems)'
    (src/WhatsNew.txt:103-106)."""
    from scipy.integrate import quad
    cfg = qc.double_gyre_coupled()
    g = build_grids(cfg)
    r = radiat(cfg, g)
    hat = np.asarray(cfg.atmos.hat)
    tabsat = np.asarray(cfg.atmos.tabsat)
    zopt = np.asarray(cfg.radiation.zopt)
    zm, gam = cfg.radiation.zm, cfg.radiation.gamma
    hmat, S2 = cfg.mixed.hmat, 0.5 * STEFAN
    nla = cfg.nla

    tauk = np.empty(nla)
    tauk[0] = np.exp(-(hat[0] - hmat) / zopt[0])
    tauk[1:] = np.exp(-hat[1:] / zopt[1:])
    ups = []
    hbot, htop = hmat, hat[0]
    for k in range(nla):
        if k > 0:
            hbot, htop = htop, htop + hat[k]
        f = lambda z, k=k, ht=htop: ((tabsat[k] - gam * z) ** 4
                                     * np.exp(-(ht - z) / zopt[k]))
        val, err = quad(f, hbot, htop, epsabs=1e-12, epsrel=1e-13,
                        limit=500)
        ups.append(S2 * val / zopt[k])
    fm = lambda z: ((r.tmbara - gam * z) ** 4
                    * np.exp(-(hmat - z) / zm))
    upint, _ = quad(fm, 0, hmat, epsabs=1e-12, epsrel=1e-13, limit=500)
    F = S2 * upint / zm * tauk[0] + ups[0]
    for k in range(1, nla):
        F = F * tauk[k] + ups[k]
    # upward flux at the top of the atmosphere balances the solar input
    assert abs(F + cfg.radiation.fsbar) < 1e-7 * abs(cfg.radiation.fsbar)

    f3 = lambda z: ((r.tmbara - gam * z) ** 3
                    * np.exp(-(hmat - z) / zm))
    dmup_quad = 2.0 * STEFAN * quad(f3, 0, hmat, epsabs=1e-13,
                                    epsrel=1e-13, limit=500)[0] / zm
    # nz=10001 trapezoids are good to ~1e-8 relative here
    assert abs(r.Dmup - dmup_quad) < 1e-7 * abs(dmup_quad)

    # pinned high-precision golden values (canonical coupled config)
    assert r.tmbara == pytest.approx(300.69902393198896, rel=1e-10)
    assert r.tmbaro == pytest.approx(300.1692848337717, rel=1e-10)
    np.testing.assert_allclose(
        r.aface, [3.02169956e-07, -5.79075517e-08], rtol=1e-7)
    assert r.bface == pytest.approx(9.098715692510914e-07, rel=1e-9)
    assert r.dface == pytest.approx(8.00248908613519e-05, rel=1e-9)
    np.testing.assert_allclose(r.rbetat, [112.3053807, 19.2581641],
                               rtol=1e-8)
    assert r.rbtmat == pytest.approx(-0.4101238812632333, rel=1e-9)
    assert r.rbtmoc == pytest.approx(-0.4040155830993504, rel=1e-9)


def test_eigenmode_golden_values():
    """Pinned deformation radii for the canonical coupled config (the
    eigtest.f check), plus the defining eigenrelation at machine
    precision for both fluids."""
    from qgcm_tpu.modes import eigenmodes
    cfg = qc.double_gyre_coupled()
    mo = eigenmodes(cfg.ocean.gpoc, cfg.ocean.hoc, cfg.fnot)
    ma = eigenmodes(cfg.atmos.gpat, cfg.atmos.hat, cfg.fnot)
    np.testing.assert_allclose(
        mo.rdef, [0.0, 30438.67303125, 17297.4632586], rtol=1e-10)
    np.testing.assert_allclose(
        ma.rdef, [0.0, 496233.16859698, 259428.33553895], rtol=1e-10)
    for m, nl in ((mo, cfg.nlo), (ma, cfg.nla)):
        for mm in range(nl):
            lam = 0.0 if mm == 0 else 1.0 / m.cphs[mm] ** 2
            resid = m.amat @ m.cm2l[:, mm] - lam * m.cm2l[:, mm]
            assert np.abs(resid).max() < 1e-12 * np.abs(m.amat).max()
        # biorthogonality: cl2m is the exact inverse of cm2l
        np.testing.assert_allclose(m.cl2m @ m.cm2l, np.eye(nl),
                                   atol=1e-12)


def test_radiation_manifest():
    """docs/radiation_coefficients.txt pins the init-time radiation
    coefficients for all four example configurations -- the analogue
    of the reference's high-precision porting-check printout
    (radsubs.f:241-502, WhatsNew.txt:103-106).  Regenerating the
    manifest must reproduce the checked-in file line for line; a
    physics change that legitimately moves these values must
    regenerate it (python tools/radiation_manifest.py) in the same
    commit and say why."""
    import os
    import sys
    root = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, os.path.join(root, "tools"))
    try:
        import radiation_manifest as rm
    finally:
        sys.path.pop(0)
    fresh = rm.manifest_lines(root)
    with open(os.path.join(root, "docs",
                           "radiation_coefficients.txt")) as f:
        pinned = f.read().splitlines()
    assert fresh == pinned
