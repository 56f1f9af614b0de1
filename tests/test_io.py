"""I/O tests: restart round-trip (resume equivalence), snapshot and
mean-forcing schemas."""

import numpy as np
import pytest
from scipy.io import netcdf_file

from qgcm_tpu.config import double_gyre_coupled, OceanConfig
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import init_ocean_state
from qgcm_tpu.models.atmos import init_atmos_state
from qgcm_tpu.models.stepper import make_coupled_runner
from qgcm_tpu.io import (save_restart, load_restart, OceanSnapshots,
                         AtmosSnapshots, write_mean_forcing,
                         read_mean_forcing)
from qgcm_tpu.generators import double_gyre_windstress


@pytest.fixture(scope="module")
def setup():
    cfg = double_gyre_coupled(nxta=24, nyta=12, nxaooc=8, nyaooc=8,
                              ndxr=4, dta=180.0,
                              ocean=OceanConfig(dxo=20.0e3))
    model = build_model(cfg)
    oc = init_ocean_state(model, init="rbal")
    at = init_atmos_state(model, init="rbal")
    return model, oc, at


def test_restart_roundtrip_fields(setup, tmp_path):
    """Written fields read back exactly (double precision)."""
    model, oc, at = setup
    run = make_coupled_runner(model)
    oc1, at1 = run(oc, at, 30)
    path = str(tmp_path / "restart.nc")
    save_restart(path, model, oc1, at1, tyrs=0.5)
    oc2, at2, tini = load_restart(path, model)
    assert tini == 0.5
    assert np.array_equal(np.asarray(oc1.po), np.asarray(oc2.po))
    assert np.array_equal(np.asarray(oc1.sstm), np.asarray(oc2.sstm))
    assert np.array_equal(np.asarray(at1.pam), np.asarray(at2.pam))
    assert np.array_equal(np.asarray(at1.hmixa), np.asarray(at2.hmixa))


def test_resume_equivalence(setup, tmp_path):
    """step(2N) == step(N) -> checkpoint -> step(N): the restart
    carries both time levels, so resuming reproduces the direct run up
    to the PV-from-pressure recomputation error (~1e-13 relative, the
    same property the reference restart has)."""
    model, oc, at = setup
    run = make_coupled_runner(model)
    oc_direct, at_direct = run(oc, at, 60)

    oc1, at1 = run(oc, at, 30)
    path = str(tmp_path / "restart.nc")
    save_restart(path, model, oc1, at1, tyrs=0.0)
    oc2, at2, _ = load_restart(path, model)
    oc_res, at_res = run(oc2, at2, 30, step0=30)

    for a, b, name in [(oc_direct.po, oc_res.po, "po"),
                       (oc_direct.sst, oc_res.sst, "sst"),
                       (at_direct.pa, at_res.pa, "pa"),
                       (at_direct.ast, at_res.ast, "ast")]:
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() < 1e-8 * scale, name


def test_snapshot_schema(setup, tmp_path):
    model, oc, at = setup
    cfg = model.cfg
    from qgcm_tpu.coupling import make_xforc
    ofor, afor, _ = make_xforc(model)(at.pam, oc.pom, oc.sstm,
                                      at.astm, at.hmixam)
    osnap = OceanSnapshots(str(tmp_path), model)
    asnap = AtmosSnapshots(str(tmp_path), model)
    osnap.append(oc, ofor, 0.0)
    osnap.append(oc, ofor, 0.1)
    asnap.append(at, afor, 0.0)
    osnap.close(); asnap.close()

    with netcdf_file(str(tmp_path / "ocpo.nc"), "r", mmap=False) as f:
        assert f.variables["p"].shape[0] == 2
        assert f.variables["p"].shape[1:] == (cfg.nlo, cfg.nypo, cfg.nxpo)
        assert f.variables["h"].shape[1] == cfg.nlo - 1
        assert f.variables["taux"][0].shape == (cfg.nypo, cfg.nxpo)
    with netcdf_file(str(tmp_path / "ocsst.nc"), "r", mmap=False) as f:
        assert f.variables["sst"][0].shape == (cfg.nyto, cfg.nxto)
        assert np.allclose(f.variables["sst"][0],
                           np.asarray(oc.sst, dtype=np.float32))
    with netcdf_file(str(tmp_path / "atast.nc"), "r", mmap=False) as f:
        assert f.variables["hmixa"][0].shape == (cfg.nyta, cfg.nxta)


def test_mean_forcing_roundtrip(setup, tmp_path):
    model, oc, at = setup
    tx, ty, fn = double_gyre_windstress(model.cfg, model.grids)
    path = str(tmp_path / "avges.nc")
    write_mean_forcing(path, model, tx, ty, fn)
    tx2, ty2, fn2 = read_mean_forcing(path)
    assert np.array_equal(tx, tx2)
    assert np.array_equal(fn, fn2)


def test_orbax_checkpoint_roundtrip(setup, tmp_path):
    """Sharded (Orbax) checkpoint path: save on one layout, restore
    into a device mesh, state identical."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs multi-device mesh")
    from qgcm_tpu.io.orbax_ckpt import save_checkpoint, load_checkpoint
    from qgcm_tpu.parallel.mesh import make_mesh

    model, oc, at = setup
    run = make_coupled_runner(model)
    oc1, at1 = run(oc, at, 15)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, oc1, at1, tyrs=0.25)

    mesh = make_mesh(jax.devices()[:8])
    oc2, at2, tyrs = load_checkpoint(path, model, mesh=mesh)
    assert tyrs == 0.25
    assert np.array_equal(np.asarray(oc1.po), np.asarray(oc2.po))
    assert np.array_equal(np.asarray(at1.hmixam), np.asarray(at2.hmixam))
    # restored arrays actually live on the mesh
    assert len(oc2.sst.addressable_shards) == 8
    # and the run continues identically to the unsharded path
    oc3, at3 = make_coupled_runner(model, mesh=mesh)(oc2, at2, 15,
                                                     step0=15)
    ref_oc, ref_at = run(oc1, at1, 15, step0=15)
    a, b = np.asarray(ref_oc.po), np.asarray(oc3.po)
    assert np.abs(a - b).max() < 1e-11 * (np.abs(a).max() + 1e-30)


def test_channel_windstress_wall_asymmetry():
    """channel_windstress must be exactly x-cyclic with NONZERO and
    DIFFERENT stresses at the two walls, so txis/txin (the boundary
    stress integrals, xfosubs.F:568-707) drive the southern and
    northern leapfrogged momentum constraints independently -- the
    contract the southern_ocean_forced_1yr production run rests on."""
    from qgcm_tpu.config import ModelConfig, OceanConfig
    from qgcm_tpu.model import build_model
    from qgcm_tpu.models.ocean import ocean_forcing_from_mean
    from qgcm_tpu.generators import channel_windstress

    cfg = ModelConfig(nxta=24, nyta=18, nxaooc=24, nyaooc=6, ndxr=4,
                      fnot=-1.19467e-4, beta=1.31301e-11,
                      ocean=OceanConfig(dxo=20.0e3),
                      ocean_only=True, cyclic_ocean=True,
                      nb_hflux=True).validate()
    model = build_model(cfg)
    tauxo, tauyo, fnetoc = channel_windstress(cfg, model.grids)
    assert np.allclose(tauxo[:, 0], tauxo[:, -1])     # exactly cyclic
    assert np.abs(tauxo[0]).min() > 0                 # south wall
    assert np.abs(tauxo[-1]).min() > 0                # north wall
    assert tauxo[0, 0] != tauxo[-1, 0]                # asymmetric
    assert tauxo.max() == tauxo[cfg.nypo // 2].max()  # jet mid-channel
    f = ocean_forcing_from_mean(model, tauxo, tauyo, fnetoc)
    txis, txin = float(f.txisoc), float(f.txinoc)
    assert txis != 0.0 and txin != 0.0 and txis != txin
