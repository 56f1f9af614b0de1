"""Area integrals with C-grid edge weights.

Replaces reference src/intsubs.f: xintt (plain T-grid sum) and xintp
(p-grid trapezoidal sum with 1/2 edge and 1/4 corner weights).
Implemented as a weight-mask multiply + sum; XLA lowers the reduction
to a deterministic tree sum (more accurate than the reference's serial
accumulation).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def xintp_weights(nyp: int, nxp: int, dtype=np.float64) -> np.ndarray:
    """Trapezoidal p-grid weights: 1 interior, 1/2 edges, 1/4 corners."""
    w = np.ones((nyp, nxp), dtype=dtype)
    w[0, :] *= 0.5
    w[-1, :] *= 0.5
    w[:, 0] *= 0.5
    w[:, -1] *= 0.5
    return w


def xintp(field: jnp.ndarray, weights=None) -> jnp.ndarray:
    """Trapezoidal p-grid sum over the last two axes (multiply by dx*dy
    for the physical area integral, as call sites in the reference do).
    Computed from slices -- a full-grid weight mask would be baked into
    compiled programs as a field-sized constant."""
    if weights is not None:
        return jnp.sum(field * weights, axis=(-2, -1))
    inner = jnp.sum(field[..., 1:-1, 1:-1], axis=(-2, -1))
    edges = 0.5 * (jnp.sum(field[..., 0, 1:-1], axis=-1)
                   + jnp.sum(field[..., -1, 1:-1], axis=-1)
                   + jnp.sum(field[..., 1:-1, 0], axis=-1)
                   + jnp.sum(field[..., 1:-1, -1], axis=-1))
    corners = 0.25 * (field[..., 0, 0] + field[..., 0, -1]
                      + field[..., -1, 0] + field[..., -1, -1])
    return inner + edges + corners


def xintt(field: jnp.ndarray) -> jnp.ndarray:
    """Plain T-grid sum over the last two axes."""
    return jnp.sum(field, axis=(-2, -1))
