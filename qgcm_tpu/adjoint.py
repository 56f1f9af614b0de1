"""Adjoint sensitivities: gradients THROUGH the model.

No reference analogue -- Q-GCM has no adjoint (hand-writing one for
the Fortran leapfrog + FFT/Thomas solver would be a separate model).
Here the whole time loop is a pure JAX program, so reverse-mode
`jax.grad` differentiates the complete physics -- leapfrog scan,
Arakawa Jacobian, mixed layers, the spectral PV inversion (matmul-DST
and FFT paths), the channel momentum/mass constraint algebra --
mechanically, to machine precision (pinned against central finite
differences in tests/test_adjoint.py).

The memory problem every adjoint model faces (storing the forward
trajectory for the backward sweep) is handled the TPU way: the
runners accept `remat=True` (models/stepper.py), wrapping the scan
body in `jax.checkpoint` so the backward pass stores ONE state carry
per step-pair / coupling cycle and recomputes the step internals --
the standard trade of FLOPs for HBM.

Typical uses: wind-stress sensitivity of channel transport or gyre
energy, initial-condition sensitivity (the tangent-linear
singular-vector machinery behind ensemble perturbations), forcing
inversion by gradient descent.

    sens = ocean_sensitivity(model, layer1_energy_proxy(model))
    val, grads = sens(state0, (tauxo, tauyo, fnetoc), n_steps=1200)
    dL_dtaux = grads.forcing[0]   # (nypo, nxpo) adjoint stress field
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .model import Model
from .state import OceanState


class OceanSensitivity(NamedTuple):
    """Gradients of a scalar objective from ocean_sensitivity."""
    state0: OceanState      # dL/d(initial state), same pytree
    forcing: tuple          # dL/d(tauxo, tauyo, fnetoc)


def ocean_sensitivity(model: Model, loss: Callable[[OceanState],
                                                   jnp.ndarray],
                      remat=True, jit: bool = True, mesh=None,
                      halo_variant=None):
    """Build dL/d(initial state, mean forcing) for an ocean-only run.

    loss: scalar function of the FINAL OceanState.
    remat: True = full per-pair rematerialisation (the long-horizon
    memory bound); "dots" = also save the spectral GEMM outputs (18%
    faster backward, more memory -- stepper._remat_wrap); False =
    store the whole forward trajectory (short runs only).
    Returns fn(state0, (tauxo, tauyo, fnetoc), n_steps, step0=0)
    -> (loss_value, OceanSensitivity). n_steps is jit-static.

    The forcing gradient is taken with respect to the physical mean
    fields (the avges.nc triple), THROUGH ocean_forcing_from_mean --
    so dL/dtauxo includes the Ekman-velocity, curl and boundary
    stress-integral (txis/txin) pathways, not just the direct drag
    terms.

    mesh/halo_variant: DISTRIBUTED adjoints -- pass a device mesh
    (and optionally the explicit ppermute halo schedule) and the
    sharded state; XLA transposes the collectives and the gradient
    matches the single-device one to ~1e-15 (test_adjoint). Two
    constraints, both measured round 5: the solver must be the matmul
    DST (auto at production sizes; set solver_transform="matmul" to
    force at small ones -- the FFT path's rfft transpose trips an
    upstream XLA dtype verifier bug under GSPMD), and the a2a pencil
    solvers stay forward-only (their shard_map cotangents carry
    mismatched varying-axes annotations), so spectral transforms ride
    GSPMD in adjoint runs."""
    from .models.ocean import ocean_forcing_from_mean
    from .models.stepper import make_ocean_only_runner
    from .config import pallas_enabled
    if pallas_enabled(model.cfg):
        # the fused Pallas kernel defines no VJP (and its sequential-
        # vmap fence covers batching, not differentiation): adjoint
        # runs take the jnp stencil chain, which jax.grad transposes
        # mechanically. Auto-on f32 TPU models would otherwise fail
        # to differentiate.
        import dataclasses
        model = dataclasses.replace(
            model, cfg=model.cfg.replace(use_pallas=False))
    run = make_ocean_only_runner(model, jit=False, remat=remat,
                                 mesh=mesh, halo_variant=halo_variant)

    def objective(state0, mean_forcing, n_steps, step0):
        f = ocean_forcing_from_mean(model, *mean_forcing)
        st = run(state0, f, n_steps, step0)
        return loss(st)

    vg = jax.value_and_grad(objective, argnums=(0, 1))

    def fn(state0, mean_forcing, n_steps: int, step0=0):
        mean_forcing = tuple(jnp.asarray(x) for x in mean_forcing)
        val, (gs, gf) = vg(state0, mean_forcing, n_steps, step0)
        return val, OceanSensitivity(state0=gs, forcing=gf)

    if jit:
        fn = jax.jit(fn, static_argnames=("n_steps",))
    return fn


def layer1_energy_proxy(model: Model):
    """Scalar objective: domain-mean layer-1 geostrophic kinetic
    energy density (J m^-3 up to the rho factor), computed from the
    final pressure exactly as the analysis layer does
    (u = -p_y/f0, v = p_x/f0):  0.5 * <|grad p|^2> / f0^2."""
    f0 = model.cfg.fnot
    dx = model.grids.dxo

    def loss(st: OceanState):
        p = st.po[0]
        px = (p[:, 1:] - p[:, :-1]) / dx
        py = (p[1:, :] - p[:-1, :]) / dx
        return 0.5 * (jnp.mean(jnp.square(px))
                      + jnp.mean(jnp.square(py))) / f0**2

    return loss


def transport_proxy(model: Model):
    """Scalar objective: zonal-mean zonal transport of layer 1 in a
    channel, <u1> = -<dp/dy>/f0 averaged over the domain -- the ACC
    transport analogue the wind-stress sensitivity is usually asked
    of."""
    f0 = model.cfg.fnot
    dy = model.grids.dxo

    def loss(st: OceanState):
        p = st.po[0]
        return -jnp.mean((p[1:, :] - p[:-1, :]) / dy) / f0

    return loss
