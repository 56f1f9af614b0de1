"""Fused Pallas QG-step kernel vs the jnp reference operators
(interpreter mode on CPU; the same code path runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qgcm_tpu.config import ModelConfig, OceanConfig, SpongeConfig
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import (init_ocean_state,
                                   ocean_forcing_from_mean, _qgostep,
                                   _oml, make_ocean_step)
from qgcm_tpu.generators import eddy_pressure, double_gyre_windstress


def _setup(cyclic, sponge=False, nlo=3):
    oc = OceanConfig(nlo=nlo, dxo=20e3, delek=2.0,
                     hoc=(350.0, 750.0, 2900.0)[:nlo],
                     gpoc=(0.015, 0.0075)[:nlo - 1],
                     tabsoc=(287.0, 282.0, 276.0)[:nlo],
                     ah2oc=(1e2, 1e2, 1e2)[:nlo],
                     ah4oc=(1e10, 2e10, 3e10)[:nlo])
    cfg = ModelConfig(nxta=24, nyta=24, nxaooc=24, nyaooc=12, ndxr=6,
                      fnot=5.92e-5, beta=2.08e-11, ocean=oc,
                      ocean_only=True, cyclic_ocean=cyclic,
                      sponge=SpongeConfig(enabled=sponge))
    model = build_model(cfg.validate())
    st = init_ocean_state(model, po=eddy_pressure(cfg))
    f = ocean_forcing_from_mean(
        model, *double_gyre_windstress(cfg, model.grids))
    # a couple of real steps so qo != qcomp(po) trivially
    st, _ = make_ocean_step(model)(st, f)
    st, _ = make_ocean_step(model)(st, f)
    entoc = _oml(model, st, f)[2]
    return model, st, f, entoc


@pytest.mark.parametrize("cyclic,sponge", [(False, False), (True, False),
                                           (True, True)])
def test_pallas_matches_jnp(cyclic, sponge):
    model, st, f, entoc = _setup(cyclic, sponge)
    q_ref, qm_ref, cyc_ref = _qgostep(model, st, f, entoc)

    model_p = model.__class__(**{**model.__dict__,
                                 "cfg": model.cfg.replace(use_pallas=True)})
    q_pl, qm_pl, cyc_pl = _qgostep(model_p, st, f, entoc)

    a, b = np.asarray(q_ref), np.asarray(q_pl)
    scale = np.abs(a).max()
    assert np.abs(a - b).max() < 1e-12 * scale
    assert np.array_equal(np.asarray(qm_ref), np.asarray(qm_pl))
    if cyclic:
        for key in cyc_ref:
            ra = np.asarray(cyc_ref[key])
            rb = np.asarray(cyc_pl[key])
            sc = np.abs(ra).max() + 1e-30
            assert np.abs(ra - rb).max() < 1e-10 * sc, key


def test_pallas_full_step_consistency():
    """Whole ocean substep with the fused kernel: inversion still
    exactly consistent (qcomp round-trip via the step machinery)."""
    model, st, f, entoc = _setup(True, True, nlo=2)
    model_p = model.__class__(**{**model.__dict__,
                                 "cfg": model.cfg.replace(use_pallas=True)})
    st1, d1 = make_ocean_step(model)(st, f)
    st2, d2 = make_ocean_step(model_p)(st, f)
    for name in ("po", "qo", "sst"):
        a = np.asarray(getattr(st1, name))
        b = np.asarray(getattr(st2, name))
        assert np.abs(a - b).max() < 1e-11 * (np.abs(a).max() + 1e-30), name


@pytest.mark.parametrize("cyclic", [(False), (True)])
def test_pallas_vmap_fence(cyclic):
    """jax.vmap over the Pallas path must equal a per-member loop
    BIT-EXACTLY. pallas_call's automatic batching rule silently
    corrupted batched member trajectories at production widths (961-
    wide rows) before faulting Mosaic outright (commit 74f558c), so
    qgstep_pallas carries a sequential_vmap fence at the kernel
    boundary: any vmap lowers to one correct full-width launch per
    batch element and can never reach Mosaic's broken auto-batching.
    This pins the fence for ANY user vmap, not just the ensemble
    runner's own use_pallas=False defence (models/ensemble.py)."""
    model, st, f, entoc = _setup(cyclic, sponge=cyclic)
    model_p = model.__class__(**{**model.__dict__,
                                 "cfg": model.cfg.replace(use_pallas=True)})
    sts = jax.tree.map(lambda x: jnp.stack([x, 1.01 * x, 0.99 * x]), st)
    q_b, qm_b, cyc_b = jax.vmap(
        lambda s: _qgostep(model_p, s, f, entoc))(sts)
    for i in range(3):
        si = jax.tree.map(lambda x: x[i], sts)
        q_i, qm_i, cyc_i = _qgostep(model_p, si, f, entoc)
        assert np.array_equal(np.asarray(q_b[i]), np.asarray(q_i)), i
        assert np.array_equal(np.asarray(qm_b[i]), np.asarray(qm_i)), i
        if cyclic:
            for key in cyc_i:
                assert np.array_equal(np.asarray(cyc_b[key][i]),
                                      np.asarray(cyc_i[key])), (i, key)


@pytest.mark.parametrize("cyclic", [False, True])
def test_pallas_multi_tile_edges(cyclic):
    """A grid taller than TILE_Y exercises the multi-tile path: the
    window assembly from pipelined blocks + out-of-block `_edges` rows
    must hand each tile exactly the rows its stencils need across the
    tile boundary (the single-chip TPU check pins this bit-exactly at
    961^2; this keeps it covered on the CPU interpret path)."""
    oc = OceanConfig(nlo=2, dxo=10e3, delek=2.0,
                     hoc=(350.0, 2900.0), gpoc=(0.015,),
                     tabsoc=(287.0, 276.0), ah2oc=(1e2, 1e2),
                     ah4oc=(1e10, 2e10))
    cfg = ModelConfig(nxta=24, nyta=24, nxaooc=24, nyaooc=24, ndxr=6,
                      fnot=5.92e-5, beta=2.08e-11, ocean=oc,
                      ocean_only=True, cyclic_ocean=cyclic)
    model = build_model(cfg.validate())
    assert cfg.nypo > 128, "test must span multiple y tiles"
    st = init_ocean_state(model, po=eddy_pressure(cfg))
    f = ocean_forcing_from_mean(
        model, *double_gyre_windstress(cfg, model.grids))
    st, _ = make_ocean_step(model)(st, f)
    entoc = _oml(model, st, f)[2]
    q_ref, qm_ref, _ = _qgostep(model, st, f, entoc)
    model_p = model.__class__(**{**model.__dict__,
                                 "cfg": model.cfg.replace(use_pallas=True)})
    q_pl, qm_pl, _ = _qgostep(model_p, st, f, entoc)
    a, b = np.asarray(q_ref), np.asarray(q_pl)
    assert np.abs(a - b).max() < 1e-12 * np.abs(a).max()
    assert np.array_equal(np.asarray(qm_ref), np.asarray(qm_pl))
