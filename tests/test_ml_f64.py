"""config.ml_f64: the float64 mixed-layer prediction core on float32
models (models/ocean._oml, models/atmos._aml).

Round-5 diagnosis: the mixed-layer clamps (ocean SST convection floor,
atmos min-thickness fixer) are non-smooth switches; under f32 roundoff
they can decouple the leapfrog time levels at a switching front, after
which the advection-diffusion runs away EXPLOSIVELY (measured on the
forced 5 km channel: a healthy realisation went 9 K -> NaN within 160
steps at day 87, while the identical state continued in f64 -- or with
just the prediction core in f64 -- stays bounded; the f64 Fortran
reference can never see the regime). The fix promotes ONLY the
elementwise prediction+clamp chain (measured sufficient on the real
chip, and -4% on the headline bench vs -23% for a fully-f64 mixed
layer)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from qgcm_tpu.config import (double_gyre_coupled, OceanConfig,
                             ml_f64_enabled)
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import init_ocean_state
from qgcm_tpu.models.atmos import init_atmos_state
from qgcm_tpu.models.stepper import make_coupled_runner
from qgcm_tpu.generators import eddy_pressure


def _cfg(dtype, **kw):
    return double_gyre_coupled(nxta=24, nyta=12, nxaooc=8, nyaooc=8,
                               ndxr=4, dtype=dtype,
                               ocean=OceanConfig(dxo=20.0e3), **kw)


def test_ml_f64_resolution():
    """auto = ON for float32 models, OFF for float64; explicit values
    override."""
    assert ml_f64_enabled(_cfg("float32"))
    assert not ml_f64_enabled(_cfg("float64"))
    assert not ml_f64_enabled(_cfg("float32", ml_f64=False))
    assert ml_f64_enabled(_cfg("float64", ml_f64=True))


def test_ml_f64_engages_on_f32_and_keeps_storage_dtype():
    """On an f32 coupled model the default produces f32 state leaves
    whose values DIFFER from the pure-f32 mixed layer (the f64 core
    really runs), and the run stays finite."""
    cfg = _cfg("float32")
    model = build_model(cfg)
    oc = init_ocean_state(model, po=eddy_pressure(cfg))
    at = init_atmos_state(model, init="rbal")
    oc1, at1 = make_coupled_runner(model)(oc, at, 24)
    assert oc1.sst.dtype == jnp.float32
    assert at1.ast.dtype == jnp.float32
    assert at1.hmixa.dtype == jnp.float32
    assert np.isfinite(np.asarray(oc1.sst)).all()
    assert np.isfinite(np.asarray(at1.ast)).all()

    m_off = dataclasses.replace(model, cfg=cfg.replace(ml_f64=False))
    oc2, at2 = make_coupled_runner(m_off)(oc, at, 24)
    assert np.abs(np.asarray(oc1.sst) - np.asarray(oc2.sst)).max() > 0
    assert np.abs(np.asarray(at1.ast) - np.asarray(at2.ast)).max() > 0


def test_ml_f64_noop_on_f64_models():
    """On float64 models the compute dtype equals the storage dtype
    either way: forcing the flag on must be BIT-IDENTICAL to off --
    the CPU-parity and golden trajectories are untouched."""
    cfg = _cfg("float64")
    model_off = build_model(cfg.replace(ml_f64=False))
    model_on = build_model(cfg.replace(ml_f64=True))
    oc = init_ocean_state(model_off, po=eddy_pressure(cfg))
    at = init_atmos_state(model_off, init="rbal")
    o1, a1 = make_coupled_runner(model_off)(oc, at, 12)
    o2, a2 = make_coupled_runner(model_on)(oc, at, 12)
    for x, y in zip(jax.tree.leaves((o1, a1)),
                    jax.tree.leaves((o2, a2))):
        assert np.array_equal(np.asarray(x), np.asarray(y))
