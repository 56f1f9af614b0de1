"""Explicit all_to_all sharded spectral Helmholtz solves.

The reference parallelises its Helmholtz solvers by OpenMP over rows
for the x-FFT and over wavenumbers for the y-Thomas recursion
(src/ocisubs.F:460-494,565-605) -- the two phases need the data
x-local and y-local respectively.  Under a 2-D device mesh the same
dependency structure appears across chips: the x-transform needs the
full x extent on-device and the y-transform the full y extent.  GSPMD
resolves this by ALL-GATHERING the field (replicating whole grids:
O(N^2) bytes per device); the classic distributed-spectral pattern is
pencil transposes -- `all_to_all` collectives that repartition the
grid so each phase is local, moving only O(N^2 / P) bytes per device.

This module implements that pattern as `shard_map` wrappers around
the single-device solvers in solver/helmholtz.py:

  ShardedBoxHelmholtz      DST-x / DST-y  (finite box, Dirichlet)
  ShardedCyclicHelmholtz   DST-y / RFFT-x (zonally periodic channel)

Box pipeline (mesh ('y','x'), my x mx devices, P = my*mx):

  blocks (Yg/my,Xg/mx) --a2a('x')------> x-pencils (Yg/P, Xg)  DST-x
                       --a2a(('y','x'))-> y-pencils (Yg, Xg/P)  DST-y
  [spectral algebra runs on the y-pencil layout under GSPMD:
   elementwise denominators + O(1) Parseval contractions]
                       <-- exact mirror transposes on the inverse

Four all_to_alls per solve; each transform is applied to a fully-local
axis, so the FFT/MXU-matmul kernels are the exact single-device ones
(results match the unsharded solver to ~1e-15 rel; the channel path is
bit-exact).

The ENTIRE p-grid array rides through the pipeline (padded up to
multiples of P with zeros on both axes); interior extraction, spectral
placement and boundary-zero placement all happen inside the pencil
stage where that axis is LOCAL.  This is deliberate: slicing or
padding a sharded axis outside shard_map makes GSPMD reshard an uneven
layout, which it implements as a full-grid all-gather -- measured at
(3,68,100) f64 gathered per solve on the first cut of this module.
With full-grid passing the only out-of-shard_map ops are shrink-slices
of the padding, which are communication-free.

Chunk-order bookkeeping: a tiled `all_to_all` concatenates received
chunks in GROUP order.  For the box chain the first transpose is over
'x' (the y-chunk index becomes iy*mx + ix), so the full transpose must
use group order ('y','x') for y to reassemble naturally.  The cyclic
chain transposes over 'y' first (x-chunk index ix*my + iy) and
therefore uses group order ('x','y'); its y-pencil chunk held by
device (iy,ix) is ix*my + iy, which is what the spectral-denominator
slice indexes.  tests/test_spectral.py pins both orderings on 8x1,
4x2, 2x4 and 1x8 meshes.

Spectral padding: transform length is part of the basis, so padding
never enters a transform -- spectra live at offset 0 with zero-filled
tails, their eigenvalue vectors are padded with 1.0 and the Parseval
weights gx/gy with 0.0, so padded entries stay exactly zero through
the constraint algebra in models/ocean._ocinvq (which runs unchanged
on the padded spectrum).

All wrapper fields are host NumPy (never jax Arrays): these objects
are captured by jitted step closures, and device constants embedded at
lowering would re-fetch and re-compile (see CLAUDE.md / model.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from ..solver.helmholtz import (
    BoxHelmholtz, CyclicHelmholtz, _PREC, _dst1_mm_packed,
    _idst1_mm_packed, dst1,
)


def _pad_up(n: int, mult: int) -> int:
    return -(-n // mult) * mult


def _place(f, axis: int, offset: int, target: int):
    """Embed f along `axis` at `offset` in a zero array of extent
    `target` (axis-local pad: (offset, target - offset - n))."""
    n = f.shape[axis]
    widths = [(0, 0)] * f.ndim
    widths[axis % f.ndim] = (offset, target - offset - n)
    return jnp.pad(f, widths)


def _pad_vec(v: np.ndarray, target: int, fill: float) -> np.ndarray:
    out = np.full((target,), fill, dtype=np.asarray(v).dtype)
    out[: len(v)] = v
    return out


class ShardedBoxHelmholtz:
    """Drop-in replacement for BoxHelmholtz under a 2-D mesh: same
    attribute surface as used by models/ocean._ocinvq (rdm2, gx, gy,
    norm, _denom, forward/inverse/solve_spec/solve), with the 2-D DST
    routed through explicit all_to_all pencil transposes.  Spectra are
    returned PADDED to (Yg, Xg) in the y-pencil layout
    P(None, None, ('y','x')); gx/gy/_denom are padded to match, so the
    spectral constraint algebra is layout- and padding-oblivious."""

    def __init__(self, base: BoxHelmholtz, mesh):
        self.base = base
        self.mesh = mesh
        self.my = mesh.shape["y"]
        self.mx = mesh.shape["x"]
        self.nprocs = self.my * self.mx
        self.nxp, self.nyp = base.nxp, base.nyp
        self.nxi, self.nyi = base.nxp - 2, base.nyp - 2
        self.Xg = _pad_up(self.nxp, self.nprocs)
        self.Yg = _pad_up(self.nyp, self.nprocs)
        self.transform = base.transform
        self.mm_precision = base.mm_precision
        self.norm = base.norm
        self.rdm2 = base.rdm2
        # Padded eigenvalue/weight vectors: lam pads with 1.0 (denom
        # stays nonzero there -- true lam are <= 0 and rdm2 >= 0, so
        # 2.0 - rdm2 cannot vanish for geophysical rdm2 ~ 1e-9 m^-2);
        # g pads with 0.0 so Parseval contractions ignore the padding.
        self.lamx = _pad_vec(np.asarray(base.lamx), self.Xg, 1.0)
        self.lamy = _pad_vec(np.asarray(base.lamy), self.Yg, 1.0)
        self.gx = _pad_vec(np.asarray(base.gx), self.Xg, 0.0)
        self.gy = _pad_vec(np.asarray(base.gy), self.Yg, 0.0)

    # -- local transform kernels (full axis on-device) ----------------
    def _tx(self, f, axis):
        if self.transform == "matmul":
            return _dst1_mm_packed(f, axis, _PREC[self.mm_precision])
        return dst1(f, axis=axis)

    def _itx(self, f, axis):
        if self.transform == "matmul":
            return _idst1_mm_packed(f, axis, _PREC[self.mm_precision])
        return dst1(f, axis=axis)

    def _denom(self):
        return (jnp.asarray(self.lamx)[None, None, :]
                + jnp.asarray(self.lamy)[None, :, None]
                - jnp.asarray(self.rdm2)[:, None, None])

    def _pad_grid(self, rhs):
        return _place(_place(rhs, -1, 0, self.Xg), -2, 0, self.Yg)

    # -- distributed transforms ---------------------------------------
    def forward(self, rhs: jnp.ndarray) -> jnp.ndarray:
        """Interior 2-D DST of a p-grid field; returns the PADDED
        spectrum (nm, Yg, Xg) in the y-pencil layout
        P(None, None, ('y','x')), spectral content at offset 0."""
        nxi, nyi, Xg, Yg = self.nxi, self.nyi, self.Xg, self.Yg

        def local(f):
            # f: (nm, Yg/my, Xg/mx) block of the padded p-grid
            b = lax.all_to_all(f, "x", 1, 2, tiled=True)   # x-pencil
            b = _place(self._tx(b[..., 1 : 1 + nxi], -1), -1, 0, Xg)
            c = lax.all_to_all(b, ("y", "x"), 2, 1, tiled=True)
            return _place(self._tx(c[..., 1 : 1 + nyi, :], -2),
                          -2, 0, Yg)

        fn = jax.shard_map(local, mesh=self.mesh,
                           in_specs=P(None, "y", "x"),
                           out_specs=P(None, None, ("y", "x")))
        return fn(self._pad_grid(rhs))

    def inverse(self, spec: jnp.ndarray) -> jnp.ndarray:
        """Padded y-pencil spectrum -> p-grid field (zero boundary,
        already scaled by norm)."""
        nxi, nyi, Xg, Yg = self.nxi, self.nyi, self.Xg, self.Yg
        norm = self.norm

        def local(s):
            # s: (nm, Yg, Xg/P) y-pencil; interior rows land at
            # offset 1 (zero Dirichlet boundary rows/cols built in)
            c = _place(self._itx(s[..., :nyi, :], -2), -2, 1, Yg)
            b = lax.all_to_all(c, ("y", "x"), 1, 2, tiled=True)
            b = _place(norm * self._itx(b[..., :nxi], -1), -1, 1, Xg)
            return lax.all_to_all(b, "x", 2, 1, tiled=True)

        fn = jax.shard_map(local, mesh=self.mesh,
                           in_specs=P(None, None, ("y", "x")),
                           out_specs=P(None, "y", "x"))
        return fn(spec)[..., : self.nyp, : self.nxp]

    def solve_spec(self, rhs: jnp.ndarray) -> jnp.ndarray:
        return self.forward(rhs) / self._denom()

    def solve(self, rhs: jnp.ndarray) -> jnp.ndarray:
        return self.inverse(self.solve_spec(rhs))


class ShardedCyclicHelmholtz:
    """Channel solver with explicit pencil transposes: DST-y on
    y-pencils, RFFT-x + spectral division + IRFFT-x on x-pencils,
    DST-y back.  Used for the cyclic ocean and (always) the
    atmosphere.  Only .solve() is needed by the inversion routines."""

    def __init__(self, base: CyclicHelmholtz, mesh):
        self.base = base
        self.mesh = mesh
        self.my = mesh.shape["y"]
        self.mx = mesh.shape["x"]
        self.nprocs = self.my * self.mx
        self.nxp, self.nyp = base.nxp, base.nyp
        self.nx = base.nxp - 1            # distinct cyclic columns
        self.nyi = base.nyp - 2
        self.Xg = _pad_up(self.nxp, self.nprocs)
        self.Yg = _pad_up(self.nyp, self.nprocs)
        self.norm = base.norm
        self.rdm2 = np.asarray(base.rdm2)
        self.lamx = np.asarray(base.lamx)            # (nx//2+1,) full
        self.lamy = _pad_vec(np.asarray(base.lamy), self.Yg, 1.0)

    def solve(self, rhs: jnp.ndarray) -> jnp.ndarray:
        nx, nyi, Xg, Yg = self.nx, self.nyi, self.Xg, self.Yg
        my, nP, norm = self.my, self.nprocs, self.norm
        Yc = Yg // nP
        dtype = rhs.dtype

        def local(f):
            # f: (nm, Yg/my, Xg/mx) block.  Group order ('x','y')
            # throughout: the first transpose is over 'y', which tags
            # x chunks ix*my + iy -- see module docstring.
            b = lax.all_to_all(f, "y", 2, 1, tiled=True)   # y-pencil
            b = _place(dst1(b[..., 1 : 1 + nyi, :], axis=-2), -2, 0, Yg)
            c = lax.all_to_all(b, ("x", "y"), 1, 2, tiled=True)
            spec = jnp.fft.rfft(c[..., :nx], axis=-1)
            r = lax.axis_index("x") * my + lax.axis_index("y")
            lamy_c = lax.dynamic_slice_in_dim(
                jnp.asarray(self.lamy), r * Yc, Yc)
            denom = (jnp.asarray(self.lamx)[None, None, :]
                     + lamy_c[None, :, None]
                     - jnp.asarray(self.rdm2)[:, None, None])
            sy = jnp.fft.irfft(spec / denom, n=nx, axis=-1).astype(dtype)
            # cyclic duplicate column nxp-1 = column 0, built here
            # while x is local
            sy = jnp.concatenate([sy, sy[..., :1]], axis=-1)
            d = lax.all_to_all(_place(sy, -1, 0, Xg),
                               ("x", "y"), 2, 1, tiled=True)
            d = _place(norm * dst1(d[..., :nyi, :], axis=-2), -2, 1, Yg)
            return lax.all_to_all(d, "y", 1, 2, tiled=True)

        def pad_grid(r):
            return _place(_place(r, -1, 0, Xg), -2, 0, Yg)

        fn = jax.shard_map(local, mesh=self.mesh,
                           in_specs=P(None, "y", "x"),
                           out_specs=P(None, "y", "x"))
        return fn(pad_grid(rhs))[..., : self.nyp, : self.nxp]


def wrap_inversions(model, mesh):
    """Return a Model whose PV-inversion solvers route their global
    transforms through the explicit all_to_all pencil pipeline.  The
    constraint algebra around them is untouched (it is elementwise or
    O(1) reductions, which GSPMD already handles without gathers)."""
    inv_oc, inv_at = model.inv_oc, model.inv_at
    if inv_oc is not None:
        helm = inv_oc.helm
        wrapped = (ShardedCyclicHelmholtz(helm, mesh)
                   if isinstance(helm, CyclicHelmholtz)
                   else ShardedBoxHelmholtz(helm, mesh))
        inv_oc = dataclasses.replace(inv_oc, helm=wrapped)
    if inv_at is not None:
        inv_at = dataclasses.replace(
            inv_at, helm=ShardedCyclicHelmholtz(inv_at.helm, mesh))
    return dataclasses.replace(model, inv_oc=inv_oc, inv_at=inv_at)
