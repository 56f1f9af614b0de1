"""Adjoint sensitivities (qgcm_tpu/adjoint.py): reverse-mode gradients
through the full physics, pinned against central finite differences.
No reference analogue -- the Fortran model has no adjoint; here the
whole leapfrog scan + spectral inversion + constraint algebra is a
pure JAX program and jax.grad differentiates it mechanically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qgcm_tpu.config import ModelConfig, OceanConfig
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import (init_ocean_state,
                                   ocean_forcing_from_mean)
from qgcm_tpu.models.stepper import make_ocean_only_runner
from qgcm_tpu.generators import (eddy_pressure, double_gyre_windstress,
                                 channel_windstress, zero_forcing)
from qgcm_tpu.adjoint import (ocean_sensitivity, layer1_energy_proxy,
                              transport_proxy)


def _setup(cyclic):
    cfg = ModelConfig(nxta=24, nyta=24, nxaooc=24, nyaooc=12, ndxr=2,
                      fnot=5.92e-5, beta=2.08e-11, dta=150.0,
                      ocean=OceanConfig(nlo=2, dxo=20e3, delek=2.0,
                                        hoc=(800.0, 3200.0),
                                        gpoc=(0.01,),
                                        tabsoc=(287.0, 282.0),
                                        ah2oc=(0.0, 0.0),
                                        ah4oc=(1e10, 1e10)),
                      ocean_only=True, cyclic_ocean=cyclic).validate()
    model = build_model(cfg)
    st0 = init_ocean_state(model, po=eddy_pressure(cfg))
    gen = channel_windstress if cyclic else double_gyre_windstress
    mf = gen(cfg, model.grids)
    return model, st0, mf


@pytest.mark.parametrize("cyclic", [False, True])
def test_forcing_gradient_matches_finite_differences(cyclic):
    """dL/d(windstress amplitude) from the adjoint equals the central
    finite difference of the primal to ~1e-6 relative (f64, 60 steps;
    the cyclic case routes the gradient through the channel momentum
    constraint algebra and the txis/txin stress integrals)."""
    model, st0, (tauxo, tauyo, fnetoc) = _setup(cyclic)
    obj = (transport_proxy if cyclic else layer1_energy_proxy)(model)
    sens = ocean_sensitivity(model, obj)
    n = 60

    val, g = sens(st0, (tauxo, tauyo, fnetoc), n)
    # directional derivative along the stress pattern itself
    # (= d/da L(a*tau) at a=1) from the adjoint field
    dir_grad = float(jnp.vdot(g.forcing[0], jnp.asarray(tauxo)))

    run = make_ocean_only_runner(model)

    def primal(a):
        f = ocean_forcing_from_mean(model, a * np.asarray(tauxo),
                                    tauyo, fnetoc)
        st = run(st0, f, n)
        return float(obj(st))

    eps = 1e-3
    fd = (primal(1.0 + eps) - primal(1.0 - eps)) / (2 * eps)
    assert fd != 0.0
    assert abs(dir_grad - fd) < 1e-6 * abs(fd), (dir_grad, fd)
    # gradient field sanity: finite everywhere, right shape
    for gf in g.forcing:
        assert np.isfinite(np.asarray(gf)).all()


def test_initial_condition_gradient_matches_jvp():
    """dL/d(state0): the reverse-mode gradient's inner product with a
    random perturbation direction equals the forward-mode (jvp)
    directional derivative -- adjoint/tangent consistency through the
    whole step machinery (including the PV/constraint re-derivation
    in the initial state)."""
    model, st0, mf = _setup(False)
    obj = layer1_energy_proxy(model)
    sens = ocean_sensitivity(model, obj, remat=False)
    n = 30
    _, g = sens(st0, mf, n)

    key = jax.random.PRNGKey(0)
    dpo = 1e-3 * jax.random.normal(key, st0.po.shape, st0.po.dtype)
    tangent = jax.tree.map(jnp.zeros_like, st0)
    tangent = tangent._replace(po=dpo, pom=dpo)

    f = ocean_forcing_from_mean(model, *mf)
    run = make_ocean_only_runner(model, jit=False)
    _, jvp_val = jax.jvp(lambda s: obj(run(s, f, n)), (st0,),
                         (tangent,))
    vjp_val = sum(float(jnp.vdot(a, b)) for a, b in
                  zip(jax.tree.leaves(g.state0),
                      jax.tree.leaves(tangent)))
    assert abs(float(jvp_val) - vjp_val) < 1e-9 * abs(float(jvp_val))


@pytest.mark.parametrize("remat", [True, "dots", 3])
def test_remat_gradient_equals_stored_gradient(remat):
    """remat=True (full recompute, the O(carry) memory path),
    remat="dots" (save the spectral GEMM outputs, the measured-faster
    backward) and an int remat (the per-level fan-out of the NESTED
    checkpointed scan -- remat=3 forces three nesting levels at 25
    scan pairs, the bounded-memory scheme production horizons need:
    flat per-iteration carries measured an attempted 105 GB
    allocation at the 4800-step channel adjoint) must all produce
    the same gradient as the fully-stored reverse pass."""
    model, st0, mf = _setup(False)
    obj = layer1_energy_proxy(model)
    n = 50
    _, g_stored = ocean_sensitivity(model, obj, remat=False)(
        st0, mf, n)
    _, g_remat = ocean_sensitivity(model, obj, remat=remat)(
        st0, mf, n)
    for a, b in zip(jax.tree.leaves(g_stored.forcing),
                    jax.tree.leaves(g_remat.forcing)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-12 * (np.abs(a).max() + 1e-30)


def test_unforced_gradient_is_zero_field_effectless():
    """Sanity: with zero forcing the transport objective of a box eddy
    still produces a finite adjoint stress field, and the value/grad
    pair is reproducible (same seed, same numbers) -- the API contract
    for optimisation loops."""
    model, st0, _ = _setup(False)
    mf = zero_forcing(model.cfg)
    sens = ocean_sensitivity(model, layer1_energy_proxy(model))
    v1, g1 = sens(st0, mf, 20)
    v2, g2 = sens(st0, mf, 20)
    assert float(v1) == float(v2)
    a = np.asarray(g1.forcing[0])
    b = np.asarray(g2.forcing[0])
    assert np.array_equal(a, b)
    assert np.isfinite(a).all() and np.abs(a).max() > 0


def test_adjoint_forces_pallas_off():
    """f32 TPU models auto-enable the fused Pallas kernel, which has
    no VJP: ocean_sensitivity must rebuild the model with the jnp
    stencil chain (same fence-style defence as the ensemble runner)
    so differentiation works regardless of the model's kernel flag.
    Validated compiled on the real chip (961-wide channel, 240
    remat'd steps) in round 5; this pins the fence on CPU."""
    model, st0, mf = _setup(False)
    model_p = model.__class__(**{**model.__dict__,
                                 "cfg": model.cfg.replace(use_pallas=True)})
    sens = ocean_sensitivity(model_p, layer1_energy_proxy(model_p))
    val, g = sens(st0, mf, 10)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g.forcing[0])).all()


def test_coupled_runner_differentiates_with_remat():
    """The coupled runner's remat=True path (per-cycle jax.checkpoint)
    also differentiates: d(final atmos mixed-layer temperature)/
    d(initial SST) -- the direct air-sea heat-flux coupling pathway
    through xforc + both fluids' steps -- matches the central finite
    difference of the primal along a random direction.
    (Forward-mode jvp is NOT used here: a where-kink tangent in the
    atmos mixed-layer min-thickness fixer produces NaN tangents that
    reverse mode never sees -- FD is the arbiter.)"""
    from qgcm_tpu.config import double_gyre_coupled
    from qgcm_tpu.models.atmos import init_atmos_state
    from qgcm_tpu.models.stepper import make_coupled_runner

    cfg = double_gyre_coupled(nxta=24, nyta=12, nxaooc=8, nyaooc=8,
                              ndxr=4,
                              ocean=OceanConfig(dxo=20.0e3))
    model = build_model(cfg)
    oc0 = init_ocean_state(model, po=eddy_pressure(cfg))
    at0 = init_atmos_state(model, init="rbal")
    run = make_coupled_runner(model, remat=True)
    n = 4 * cfg.nstr

    def loss(sst):
        oc = oc0._replace(sst=sst, sstm=sst)
        _, at_f = run(oc, at0, n)
        return jnp.mean(jnp.square(at_f.ast))

    g = jax.jit(jax.grad(loss))(oc0.sst)
    assert np.isfinite(np.asarray(g)).all()
    dsst = 1e-2 * jax.random.normal(jax.random.PRNGKey(1),
                                    oc0.sst.shape, oc0.sst.dtype)
    vjp_val = float(jnp.vdot(g, dsst))
    eps = 1e-2
    fd = (float(loss(oc0.sst + eps * dsst))
          - float(loss(oc0.sst - eps * dsst))) / (2 * eps)
    assert fd != 0.0
    assert abs(vjp_val - fd) <= 1e-5 * abs(fd), (vjp_val, fd)


def test_forcing_inversion_by_gradient_descent():
    """End-to-end use case: recover an unknown wind-stress amplitude
    from an 'observed' final state by gradient descent on the misfit
    -- the optimisation-loop workflow the adjoint exists for. Starting
    2x too strong, a few Newton-like steps on the 1-D amplitude
    recover the true value to <1%."""
    model, st0, (tauxo, tauyo, fnetoc) = _setup(False)
    run = make_ocean_only_runner(model, jit=False)
    n = 40
    tauxo = jnp.asarray(tauxo)

    def final_po(amp):
        f = ocean_forcing_from_mean(model, amp * tauxo, tauyo, fnetoc)
        return run(st0, f, n).po

    obs = final_po(1.0)          # truth: amp = 1

    @jax.jit
    def misfit_vg(amp):
        return jax.value_and_grad(
            lambda a: jnp.mean(jnp.square(final_po(a) - obs)))(amp)

    amp = 2.0
    for _ in range(12):
        v, g = misfit_vg(amp)
        # Newton on the (locally ~quadratic) 1-D misfit:
        # v ~ c*(amp-1)^2, g ~ 2c*(amp-1) => step = 2v/g
        amp = amp - 2.0 * v / g
    assert abs(float(amp) - 1.0) < 1e-2, float(amp)


def test_distributed_adjoint_matches_single_device():
    """Gradients through the SHARDED runner (rows mesh + explicit
    ppermute halo schedule, matmul-DST solver): XLA transposes the
    collectives and the distributed gradient equals the single-device
    one to ~1e-15. The matmul solver is the production TPU path
    anyway (auto at >=512 interior); the FFT path's rfft transpose
    trips an upstream XLA dtype verifier bug under GSPMD and the a2a
    pencil solvers stay forward-only (cotangent varying-axes
    mismatch) -- both noted in ocean_sensitivity's docstring."""
    if len(jax.devices()) < 4:
        pytest.skip("needs multi-device CPU mesh")
    from qgcm_tpu.parallel.mesh import make_mesh, shard_tree

    cfg = ModelConfig(nxta=24, nyta=24, nxaooc=24, nyaooc=12, ndxr=2,
                      fnot=5.92e-5, beta=2.08e-11, dta=150.0,
                      solver_transform="matmul",
                      ocean=OceanConfig(nlo=2, dxo=20e3, delek=2.0,
                                        hoc=(800.0, 3200.0),
                                        gpoc=(0.01,),
                                        tabsoc=(287.0, 282.0),
                                        ah2oc=(0.0, 0.0),
                                        ah4oc=(1e10, 1e10)),
                      ocean_only=True, cyclic_ocean=False).validate()
    model = build_model(cfg)
    st0 = init_ocean_state(model, po=eddy_pressure(cfg))
    mf = double_gyre_windstress(cfg, model.grids)
    obj = layer1_energy_proxy(model)
    n = 30

    _, g1 = ocean_sensitivity(model, obj)(st0, mf, n)

    mesh = make_mesh(jax.devices()[:4], rows_only=True)
    sens_d = ocean_sensitivity(model, obj, mesh=mesh,
                               halo_variant="overlap")
    _, g2 = sens_d(shard_tree(st0, mesh), mf, n)

    for a, b in zip(jax.tree.leaves(g1.forcing),
                    jax.tree.leaves(g2.forcing)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-13 * (np.abs(a).max() + 1e-30)
    a = np.asarray(g1.state0.po)
    b = np.asarray(g2.state0.po)
    assert np.abs(a - b).max() <= 1e-12 * (np.abs(a).max() + 1e-30)


def test_segmented_adjoint_equals_single_program():
    """segment_steps (host-level checkpointing for horizons whose
    one-program backward exceeds HBM -- measured 740 MB over the v5e
    at the 30-day production channel): the chained per-segment VJPs
    must reproduce the single-program gradient at machine precision,
    value and all gradient fields."""
    model, st0, mf = _setup(False)
    obj = layer1_energy_proxy(model)
    n = 60
    v1, g1 = ocean_sensitivity(model, obj)(st0, mf, n)
    v2, g2 = ocean_sensitivity(model, obj, segment_steps=20)(
        st0, mf, n)
    assert abs(float(v1) - float(v2)) <= 1e-12 * abs(float(v1))
    for a, b in zip(jax.tree.leaves(g1.forcing),
                    jax.tree.leaves(g2.forcing)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-11 * (np.abs(a).max() + 1e-30)
    a = np.asarray(g1.state0.po); b = np.asarray(g2.state0.po)
    assert np.abs(a - b).max() <= 1e-11 * (np.abs(a).max() + 1e-30)
    # indivisible horizons are rejected loudly
    with pytest.raises(ValueError, match="multiple"):
        ocean_sensitivity(model, obj, segment_steps=25)(st0, mf, n)
