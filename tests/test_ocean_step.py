"""End-to-end ocean substep tests on small grids: inversion/PV
round-trip consistency, mass-constraint enforcement, stability and
approximate energy behaviour of an unforced eddy."""

import jax.numpy as jnp
import numpy as np
import pytest

from qgcm_tpu import config as qc
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import (
    make_ocean_step, init_ocean_state, ocean_forcing_from_mean)
from qgcm_tpu.models.stepper import make_ocean_only_runner
from qgcm_tpu.generators import eddy_pressure, zero_forcing
from qgcm_tpu.ops.vorticity import qcomp
from qgcm_tpu.ops.integrals import xintp


def small_box_cfg(**kw):
    return qc.ModelConfig(
        nxta=16, nyta=16, nxaooc=8, nyaooc=8, ndxr=3,
        ocean_only=True, cyclic_ocean=False, dta=200.0, nstr=3,
    ).replace(**kw).validate()


def small_cyclic_cfg(**kw):
    return qc.ModelConfig(
        nxta=16, nyta=16, nxaooc=16, nyaooc=8, ndxr=3,
        ocean_only=True, cyclic_ocean=True, dta=200.0, nstr=3,
    ).replace(**kw).validate()


def _setup(cfg, forcing_arrays=None):
    model = build_model(cfg)
    po = eddy_pressure(cfg, ssh_amp=0.05, l_efold=3 * cfg.ocean.dxo)
    state = init_ocean_state(model, po=po)
    if forcing_arrays is None:
        forcing_arrays = zero_forcing(cfg)
    forcing = ocean_forcing_from_mean(model, *forcing_arrays)
    return model, state, forcing


@pytest.mark.parametrize("case", ["box", "cyclic"])
def test_inversion_pv_roundtrip(case):
    """After a step, qcomp(po_new) must equal the stepped qo at all
    interior points: the inversion is the exact inverse of the PV
    operator (incl. homogeneous corrections)."""
    cfg = small_box_cfg() if case == "box" else small_cyclic_cfg()
    model, state, forcing = _setup(cfg)
    step = make_ocean_step(model)
    for _ in range(3):
        state, diags = step(state, forcing)
    q_re = qcomp(state.po, jnp.asarray(model.modes_oc.amat),
                 jnp.asarray(model.grids.yporel),
                 1.0 / model.grids.dxo**2, cfg.fnot, cfg.beta,
                 jnp.asarray(model.topo.ddynoc), cfg.nlo - 1,
                 cfg.cyclic_ocean)
    q_re = np.asarray(q_re)
    qo = np.asarray(state.qo)
    if case == "box":
        sl = np.s_[:, 1:-1, 1:-1]
    else:
        sl = np.s_[:, 1:-1, :]
    scale = np.abs(qo[sl] - cfg.beta
                   * np.asarray(model.grids.yporel)[None, 1:-1, None]).max()
    assert np.abs(q_re[sl] - qo[sl]).max() < 1e-10 * max(scale, 1e-30)


@pytest.mark.parametrize("case", ["box", "cyclic"])
def test_mass_constraint(case):
    """Area integral of each interface displacement must track the
    constraint state dpioc exactly (thickness conservation)."""
    cfg = small_box_cfg() if case == "box" else small_cyclic_cfg()
    model, state, forcing = _setup(cfg)
    step = make_ocean_step(model)
    for _ in range(5):
        state, diags = step(state, forcing)
    area = model.grids.dxo * model.grids.dyo
    eta_int = np.asarray(
        xintp(state.po[1:] - state.po[:-1], model.wop) * area)
    np.testing.assert_allclose(eta_int, np.asarray(state.dpioc),
                               rtol=1e-8, atol=1e-6)
    # the model's own continuity error monitor should be small
    if case == "cyclic":
        assert np.abs(np.asarray(diags.emfroc)).max() < 1e-6


def test_unforced_eddy_stability_and_energy():
    """Inviscid unforced eddy: run 200 steps; fields stay finite and
    total energy drifts by < 1% (leapfrog is neutrally stable; the
    25-step averaging dissipates only the computational mode)."""
    cfg = small_box_cfg(
        ocean=qc.OceanConfig(ah2oc=(0.0,) * 3, ah4oc=(0.0,) * 3,
                             delek=0.0),
        no_oml=True,
    )
    model, state, forcing = _setup(cfg)
    runner = make_ocean_only_runner(model, jit=True)

    def energy(st):
        # KE ~ sum |grad p|^2 * h / f^2 ; PE ~ sum eta^2 * gp
        po = np.asarray(st.po)
        ke = 0.0
        for k in range(cfg.nlo):
            px = np.diff(po[k], axis=1) / model.grids.dxo
            py = np.diff(po[k], axis=0) / model.grids.dyo
            ke += cfg.ocean.hoc[k] * ((px**2).sum() + (py**2).sum())
        pe = 0.0
        for k in range(cfg.nlo - 1):
            eta = (po[k + 1] - po[k]) / cfg.ocean.gpoc[k]
            pe += cfg.ocean.gpoc[k] * (eta**2).sum()
        return 0.5 * (ke / cfg.fnot**2 + pe)

    e0 = energy(state)
    state = runner(state, forcing, 200)
    assert np.isfinite(np.asarray(state.po)).all()
    assert np.isfinite(np.asarray(state.qo)).all()
    e1 = energy(state)
    assert abs(e1 - e0) < 0.01 * e0


def test_forced_run_spins_up():
    """With windstress, energy should grow from rest."""
    from qgcm_tpu.generators import double_gyre_windstress
    cfg = small_box_cfg()
    model = build_model(cfg)
    f = double_gyre_windstress(cfg, model.grids, tau0=2e-5)
    state = init_ocean_state(model, init="rbal")
    forcing = ocean_forcing_from_mean(model, *f)
    runner = make_ocean_only_runner(model, jit=True)
    state = runner(state, forcing, 100)
    po = np.asarray(state.po)
    assert np.isfinite(po).all()
    assert np.abs(po).max() > 0.0
