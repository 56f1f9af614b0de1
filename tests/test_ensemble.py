"""Ensemble runner tests: vmapped members reproduce single-trajectory
runs, perturbations are state-consistent, and the member axis shards
over the device mesh with ZERO collectives (pure data parallelism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qgcm_tpu import config as qc
from qgcm_tpu.config import double_gyre_coupled, OceanConfig
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import (
    init_ocean_state, ocean_forcing_from_mean)
from qgcm_tpu.models.atmos import init_atmos_state
from qgcm_tpu.models.stepper import (
    make_ocean_only_runner, make_coupled_runner)
from qgcm_tpu.models.ensemble import (
    stack_members, member, n_members, ensemble_mean, ensemble_std,
    spread_rms, perturbed_ocean_members, perturbed_atmos_members,
    ensemble_mesh, make_ensemble_runner)
from qgcm_tpu.generators import eddy_pressure, zero_forcing
from qgcm_tpu.parallel.inspect import collective_stats


def _box_cfg(**kw):
    return qc.ModelConfig(
        nxta=16, nyta=16, nxaooc=8, nyaooc=8, ndxr=3,
        ocean_only=True, cyclic_ocean=False, dta=200.0, nstr=3,
    ).replace(**kw).validate()


@pytest.fixture(scope="module")
def ocean_setup():
    cfg = _box_cfg()
    model = build_model(cfg)
    po = eddy_pressure(cfg, ssh_amp=0.05, l_efold=3 * cfg.ocean.dxo)
    control = init_ocean_state(model, po=po)
    forcing = ocean_forcing_from_mean(model, *zero_forcing(cfg))
    return model, control, forcing


def test_perturbed_members_consistent(ocean_setup):
    """Member 0 is the control; perturbed members differ by ~amp in
    RMS, vanish on the walls, and carry PV/constraints re-derived from
    the perturbed pressure (restart-grade internal consistency)."""
    model, control, forcing = ocean_setup
    amp = 2.0e-3
    members = perturbed_ocean_members(
        model, control, jax.random.PRNGKey(7), 4, amp=amp)
    assert n_members(members) == 4
    m0 = member(members, 0)
    for a, b in zip(m0, control):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    m1 = member(members, 1)
    dp = np.asarray(m1.po - control.po)
    rms = np.sqrt(np.mean(dp**2))
    assert 0.1 * amp < rms < 3.0 * amp
    # walls untouched (box: all four boundaries)
    assert np.all(dp[:, 0, :] == 0) and np.all(dp[:, -1, :] == 0)
    assert np.all(dp[:, :, 0] == 0) and np.all(dp[:, :, -1] == 0)
    # PV re-derived, not copied
    assert not np.allclose(np.asarray(m1.qo), np.asarray(control.qo))
    assert spread_rms(members, "po") > 0


def test_ensemble_matches_single_runs(ocean_setup):
    """The vmapped ensemble runner reproduces each member's
    single-trajectory run."""
    model, control, forcing = ocean_setup
    members = perturbed_ocean_members(
        model, control, jax.random.PRNGKey(0), 3, amp=1e-3)
    run_e = make_ensemble_runner(model, kind="ocean")
    out = run_e(members, forcing, 12)

    run_1 = make_ocean_only_runner(model)
    for i in range(3):
        ref = run_1(member(members, i), forcing, 12)
        for a, b, name in zip(member(out, i), ref, ref._fields):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-13,
                err_msg=f"member {i} field {name}")


def test_ensemble_mean_std_shapes(ocean_setup):
    model, control, forcing = ocean_setup
    members = perturbed_ocean_members(
        model, control, jax.random.PRNGKey(1), 4, amp=1e-3)
    mean = ensemble_mean(members)
    std = ensemble_std(members)
    assert mean.po.shape == control.po.shape
    assert std.sst.shape == control.sst.shape
    assert float(jnp.max(std.po)) > 0


def test_mesh_ensemble_zero_collectives(ocean_setup):
    """8 members sharded over the 8-device mesh: results equal the
    unsharded ensemble run, and the compiled program moves NO data
    between devices (members are independent -> linear scaling)."""
    model, control, forcing = ocean_setup
    members = perturbed_ocean_members(
        model, control, jax.random.PRNGKey(2), 8, amp=1e-3)
    mesh = ensemble_mesh()
    assert mesh.devices.size == 8

    run_plain = make_ensemble_runner(model, kind="ocean")
    run_mesh = make_ensemble_runner(model, kind="ocean", mesh=mesh)
    ref = run_plain(members, forcing, 8)
    out = run_mesh(members, forcing, 8)
    for a, b, name in zip(out, ref, ref._fields):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-13, atol=1e-14,
            err_msg=f"field {name}")

    stats = collective_stats(run_mesh, members, forcing, 8,
                             static_argnames=("n_steps",))
    assert stats.total == 0, stats.counts


def test_coupled_ensemble_matches_single_runs():
    cfg = double_gyre_coupled(nxta=24, nyta=12, nxaooc=8, nyaooc=8,
                              ndxr=4, dta=180.0,
                              ocean=OceanConfig(dxo=20.0e3))
    model = build_model(cfg)
    oc0 = init_ocean_state(model, init="rbal")
    at0 = init_atmos_state(model, init="rbal")
    ocm = perturbed_ocean_members(model, oc0, jax.random.PRNGKey(3),
                                  2, amp=1e-3)
    atm = perturbed_atmos_members(model, at0, jax.random.PRNGKey(4),
                                  2, amp=1e-2)
    run_e = make_ensemble_runner(model, kind="coupled")
    oc_out, at_out = run_e(ocm, atm, 2 * cfg.nstr)

    run_1 = make_coupled_runner(model)
    for i in range(2):
        oc_ref, at_ref = run_1(member(ocm, i), member(atm, i),
                               2 * cfg.nstr)
        np.testing.assert_allclose(np.asarray(member(oc_out, i).po),
                                   np.asarray(oc_ref.po),
                                   rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(np.asarray(member(at_out, i).pa),
                                   np.asarray(at_ref.pa),
                                   rtol=1e-12, atol=1e-13)


def test_cyclic_perturbation_keeps_inversion_exactness():
    """Perturbed members of a CYCLIC channel keep q == qcomp(p) at
    interior points after stepping. Regression: noise that ignored the
    duplicated cyclic p column (nxpo = nxto+1) was projected out by
    the exactly-cyclic spectral solve, leaving a permanent ~5e-3
    relative q/p inconsistency from the first substep on."""
    from qgcm_tpu.ops.vorticity import qcomp
    cfg = qc.ModelConfig(
        nxta=16, nyta=16, nxaooc=16, nyaooc=8, ndxr=3,
        ocean_only=True, cyclic_ocean=True, dta=200.0, nstr=3,
    ).validate()
    model = build_model(cfg)
    po = eddy_pressure(cfg, ssh_amp=0.05, l_efold=3 * cfg.ocean.dxo)
    control = init_ocean_state(model, po=po)
    forcing = ocean_forcing_from_mean(model, *zero_forcing(cfg))
    members = perturbed_ocean_members(
        model, control, jax.random.PRNGKey(5), 3, amp=1e-3)
    # perturbation respects the cyclic identification
    dp = np.asarray(member(members, 1).po - control.po)
    assert np.array_equal(dp[..., 0], dp[..., -1])

    run = make_ensemble_runner(model, kind="ocean")
    out = run(members, forcing, 8)
    amat = jnp.asarray(model.modes_oc.amat)
    yprel = jnp.asarray(model.grids.yporel)
    ddyn = model.topo.ddynoc_or_scalar(control.po.dtype)
    for i in range(3):
        s = member(out, i)
        q = qcomp(s.po, amat, yprel, 1.0 / model.grids.dxo**2,
                  cfg.fnot, cfg.beta, ddyn, cfg.nlo - 1, True)
        rel = float(jnp.max(jnp.abs(q - s.qo)[:, 1:-1, :])
                    / jnp.max(jnp.abs(s.qo)))
        assert rel < 1e-11, (i, rel)


def test_ensemble_cli_end_to_end(tmp_path):
    """`qgcm ensemble` drives a perturbed-IC run and writes the
    spread series (ensemble.nc) with growing-from-zero spread."""
    from scipy.io import netcdf_file
    from qgcm_tpu.cli import main
    case = tmp_path / "case"
    case.mkdir()
    rc = main(["ensemble", str(case), "--ocean-only",
               "--nxta", "16", "--nyta", "16", "--nxaooc", "8",
               "--nyaooc", "8", "--ndxr", "3", "--members", "4",
               "--amp", "1e-3", "--days", "0.05",
               "--sample-days", "0.025", "--quiet"])
    assert rc == 0
    f = netcdf_file(str(case / "outdata_ens" / "ensemble.nc"),
                    mmap=False)
    tyrs = f.variables["tyrs"][:]
    sp = f.variables["spread_po"][:]
    prms = f.variables["po_rms"][:]
    f.close()
    assert len(tyrs) == 3 and tyrs[-1] > tyrs[0]
    assert np.all(sp > 0) and np.all(np.isfinite(sp))
    assert prms.shape == (3, 4) and np.all(np.isfinite(prms))
    # qgcm analyze recognises an ensemble output directory
    assert main(["analyze", str(case / "outdata_ens")]) == 0
