"""Init-time component tests: eigenmodes (vs analytic 2-layer and the
reference's printed dg_oo values), radiation balance invariants,
grids, topography."""

import numpy as np

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
