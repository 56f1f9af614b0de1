"""Stencil op tests: Arakawa Jacobian conservation properties and
Laplacian boundary conditions."""

import jax.numpy as jnp
import numpy as np

from qgcm_tpu.ops.stencils import del2_bc, jacobian9, interior_5pt


def _compact(rng, ny, nx, margin=3, cyclic=False):
    """Random field with compact support `margin` points from every
    boundary, so the Arakawa flux-form telescoping has no boundary
    terms and the conservation identities are exact."""
    f = rng.standard_normal((ny, nx))
    f[:margin, :] = 0.0
    f[-margin:, :] = 0.0
    f[:, :margin] = 0.0
    f[:, -margin:] = 0.0
    if cyclic:
        f[:, -1] = f[:, 0]
    return f


def test_jacobian_antisymmetry():
    rng = np.random.default_rng(0)
    ny, nx = 26, 34
    p = rng.standard_normal((ny, nx))
    q = rng.standard_normal((ny, nx))
    jqp = np.asarray(jacobian9(jnp.asarray(q), jnp.asarray(p), False))
    jpq = np.asarray(jacobian9(jnp.asarray(p), jnp.asarray(q), False))
    np.testing.assert_allclose(jqp, -jpq, atol=1e-12)


def test_jacobian_conservation_box():
    """With compact-support fields the 9-point Arakawa Jacobian exactly
    conserves the domain sums of J, q*J (enstrophy) and p*J (energy)."""
    rng = np.random.default_rng(0)
    ny, nx = 26, 34
    p = _compact(rng, ny, nx)
    q = _compact(rng, ny, nx)
    jac = np.asarray(jacobian9(jnp.asarray(q), jnp.asarray(p), False))
    scale = np.abs(jac).sum()
    assert abs(jac.sum()) < 1e-12 * scale
    assert abs((q * jac).sum()) < 1e-12 * scale * np.abs(q).max()
    assert abs((p * jac).sum()) < 1e-12 * scale * np.abs(p).max()


def test_jacobian_conservation_cyclic():
    """Cyclic-x: compact support in y only; x wraps."""
    rng = np.random.default_rng(1)
    ny, nx = 22, 33
    p = rng.standard_normal((ny, nx))
    q = rng.standard_normal((ny, nx))
    for f in (p, q):
        f[:3, :] = 0.0
        f[-3:, :] = 0.0
        f[:, -1] = f[:, 0]
    jac = np.asarray(jacobian9(jnp.asarray(q), jnp.asarray(p), True))
    assert np.allclose(jac[:, -1], jac[:, 0])
    # weighted sum (cyclic: drop duplicated column)
    scale = np.abs(jac).sum()
    assert abs(jac[:, :-1].sum()) < 1e-11 * scale
    assert abs((q * jac)[:, :-1].sum()) < 1e-11 * scale * np.abs(q).max()
    assert abs((p * jac)[:, :-1].sum()) < 1e-11 * scale * np.abs(p).max()


def test_jacobian_linear_fields():
    """J(q, p) for q = x, p = y must be -1 * (12 dx dy) / (dx dy) ...
    with the unscaled stencil: J_unscaled = 12*dx*dy*J, J(x,y)=1."""
    ny, nx = 12, 15
    x = np.arange(nx, dtype=float)[None, :] * np.ones((ny, 1))
    y = np.arange(ny, dtype=float)[:, None] * np.ones((1, nx))
    jac = np.asarray(jacobian9(jnp.asarray(x), jnp.asarray(y), False))
    # unscaled stencil on unit grid: adfac = 1/12 => J = jac/12 = -1?
    # J(q,p) = dq/dx dp/dy - dq/dy dp/dx = 1*1 - 0 = 1 -> jac = 12
    np.testing.assert_allclose(jac[2:-2, 2:-2], 12.0)


def test_del2_bc_matches_interior():
    rng = np.random.default_rng(2)
    ny, nx = 14, 17
    p = rng.standard_normal((ny, nx))
    out = np.asarray(del2_bc(jnp.asarray(p), 0.3, 1.0, cyclic=False))
    ref = np.asarray(interior_5pt(jnp.asarray(p), 1.0))
    np.testing.assert_allclose(out[1:-1, 1:-1], ref)
    # mixed BC rows
    np.testing.assert_allclose(out[0, :], 0.3 * (p[1, :] - p[0, :]))
    np.testing.assert_allclose(out[:, -1][1:-1],
                               0.3 * (p[1:-1, -2] - p[1:-1, -1]))


def test_del2_bc_cyclic_wrap():
    rng = np.random.default_rng(3)
    ny, nx = 14, 17
    p = rng.standard_normal((ny, nx))
    p[:, -1] = p[:, 0]
    out = np.asarray(del2_bc(jnp.asarray(p), 0.3, 1.0, cyclic=True))
    np.testing.assert_allclose(out[:, -1], out[:, 0])
    # column 0 west neighbour is column nx-2
    j = 5
    expect = (p[j - 1, 0] + p[j + 1, 0] + p[j, -2] + p[j, 1]
              - 4 * p[j, 0])
    np.testing.assert_allclose(out[j, 0], expect)
