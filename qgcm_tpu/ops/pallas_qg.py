"""Fused Pallas TPU kernel for the QG vorticity leapfrog step.

Replaces the XLA-fusion chain of models/ocean._qgostep /
models/atmos._qgastep (del2 -> del4 -> del6 of the lagged pressure,
Arakawa 9-point Jacobian, layer forcing, leapfrog update; reference
src/qgosubs.F:45-229, ocadif :231-454) with ONE kernel pass per
(layer, y-tile): halo-extended tiles are staged into VMEM, the whole
stencil chain runs on-chip, and only the new vorticity tile goes back
to HBM. The jnp path materialises ~6 intermediate fields in HBM.

Halo handling: BlockSpec blocks cannot overlap, so every field rides
as plain ragged pipelined blocks and the halo-carrying inputs ship a
thin `_edges` array of just their out-of-block halo rows (~h/TILE of
a field); the (TILE+2h, nx+2h) window is assembled in VMEM.
Boundary conditions are applied in-kernel by masking on global row /
column indices, exactly mirroring ops/stencils.del2_bc. Ghost values
outside the domain are zeros (box) or x-wraparound (cyclic, west of
column 0 = column nxp-2 per the duplicated-east-column convention);
every output affected by a ghost is overwritten by a mask.

The cyclic momentum-constraint integrals need del2p/del4p only on the
2 rows nearest each wall; the caller recomputes those thin slices with
the jnp operator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 3          # del6 = three nested 5-point applications
TILE_Y = 128


def _xghost(f, h, cyclic):
    """Append h ghost columns each side: wraparound (cyclic p-array
    convention) or zeros (box)."""
    if h == 0:
        return f
    if cyclic:
        return jnp.concatenate(
            [f[..., -1 - h:-1], f, f[..., 1:1 + h]], axis=-1)
    zx = jnp.zeros(f.shape[:-1] + (h,), f.dtype)
    return jnp.concatenate([zx, f, zx], axis=-1)


def _edges(f, h, cyclic, nty, x_ext=False):
    """Per-tile OUT-OF-BLOCK halo rows: (nl, ny, nx) ->
    (nl, nty, 2h, nx + 2h), rows [t*T-h, t*T) then [t*T+T, t*T+T+h)
    (zeros outside the domain).  The halo windows overlap, which
    BlockSpec blocks cannot express; shipping just these edge rows and
    assembling the window in VMEM keeps the pipelined block fetches
    while staging ~h/T of a field instead of a full strided copy
    (the old _tiles windows cost ~8 ms/step at NAtl; an in-kernel
    HBM DMA variant lost the pipeline and measured slower still).
    x_ext: f already carries exactly h real exchanged ghost columns
    (2-D shard_map windows, pre-sliced by the caller); keep them
    instead of synthesising wrap/zero ghosts."""
    nl, ny, nx = f.shape
    fp = jnp.pad(f, [(0, 0), (h, nty * TILE_Y + h - ny), (0, 0)])
    rows = [jnp.concatenate(
        [fp[:, t * TILE_Y: t * TILE_Y + h],
         fp[:, t * TILE_Y + TILE_Y + h: t * TILE_Y + TILE_Y + 2 * h]],
        axis=-2) for t in range(nty)]
    out = jnp.stack(rows, axis=1)
    return out if x_ext else _xghost(out, h, cyclic)


def _make_kernel(ny, nx, nl, cyclic, sponge, consts, ah2, ah4,
                 nx_total=None, x_ext=False):
    # nx is the CORE width (the output width); nx_total the global
    # domain width the wall masks key on (== nx except in x_ext mode,
    # where the arrays are a 2-D shard_map window whose x ghosts are
    # real exchanged columns and whose core col 0 sits at global
    # column goff[1]).
    nx_total = nx if nx_total is None else nx_total
    # RAGGED-TILE INVARIANT: when ny % TILE_Y != 0, block rows with
    # global index >= ny hold UNSPECIFIED data (Mosaic pads the edge
    # tile; interpret mode pads differently). Every value the stencil
    # chain derives from those rows must only ever reach (a) output
    # rows >= ny, which Mosaic discards on writeback, or (b) jnp.where
    # branches that a global-row mask rejects. All masks here compare
    # against `rows(...)`/`gr0` GLOBAL indices, and the north-wall
    # mask (gr == ny - 1) fires strictly below the ragged region, so
    # the invariant holds. If you widen a read or weaken a mask,
    # re-check it on REAL TPU hardware -- the CPU interpret test can
    # pass while Mosaic's padding differs.
    (dxm2, bcfac, adfac, rfnot, tdt, bdrfac, c1spl, beta_y0, beta_dy,
     fohfac0, fohfac1) = consts

    def kernel(goff_ref, pom_blk, po_blk, qo_blk, pom_e, po_e, qo_e,
               qom_ref, wek_ref, ent_ref, rspl_ref, out_ref):
        k = pl.program_id(0)
        t = pl.program_id(1)
        # goff: global row index of array row 0 (0 for full-field
        # calls; shard_offset - halo inside the shard_map halo path,
        # where ghost rows of OTHER shards lead the local block)
        base = t * TILE_Y + goff_ref[0]

        def window(blk, edg, h):
            """Assemble the (T+2h, nx+2h) halo window in VMEM from the
            pipelined block and the shipped out-of-block edge rows."""
            b = _kernel_xghost(blk[0], h)
            return jnp.concatenate(
                [edg[0, 0, :h], b, edg[0, 0, h:]], axis=-2)

        def _kernel_xghost(b, h):
            if x_ext:
                # the block arrives with exactly h real exchanged
                # ghost columns (pre-sliced OUTSIDE the kernel: Mosaic
                # cannot concatenate a lane-offset slice with the
                # offset-0 edge rows)
                return b
            if h == 0:
                return b
            if cyclic:
                return jnp.concatenate(
                    [b[:, -1 - h:-1], b, b[:, 1:1 + h]], axis=-1)
            zx = jnp.zeros((b.shape[0], h), b.dtype)
            return jnp.concatenate([zx, b, zx], axis=-1)

        def rows(g0, n):
            return (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                    + (base + g0))

        def colmask(n, h):
            gc = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) - h
            if x_ext:
                # global column of the window's core col 0 (SMEM);
                # static in the full-field mode, which keeps its
                # Mosaic-friendly constant-foldable masks
                gc = gc + goff_ref[1]
            return gc == 0, gc == nx_total - 1

        def lap_bc(f, h):
            """Mixed-BC Laplacian: f has h ghost rings, output h-1."""
            c = f[1:-1, 1:-1]
            s, n = f[:-2, 1:-1], f[2:, 1:-1]
            w, e = f[1:-1, :-2], f[1:-1, 2:]
            lap = dxm2 * (s + n + w + e - 4.0 * c)
            gr = rows(1 - h, c.shape[0])
            south = gr == 0
            north = gr == ny - 1
            out = jnp.where(south, bcfac * (n - c),
                            jnp.where(north, bcfac * (s - c), lap))
            if not cyclic:
                west, east = colmask(c.shape[1], h - 1)
                zonal = south | north
                out = jnp.where(west & ~zonal, bcfac * (e - c), out)
                out = jnp.where(east & ~zonal, bcfac * (w - c), out)
            return out

        pom = window(pom_blk, pom_e, HALO)
        d2 = lap_bc(pom, HALO)
        d4 = lap_bc(d2, HALO - 1)

        c = d4[1:-1, 1:-1]
        d6 = dxm2 * (d4[:-2, 1:-1] + d4[2:, 1:-1] + d4[1:-1, :-2]
                     + d4[1:-1, 2:] - 4.0 * c)
        gr0 = rows(0, TILE_Y)
        zonal = (gr0 == 0) | (gr0 == ny - 1)
        edge = zonal
        if not cyclic:
            west0, east0 = colmask(nx, 0)
            edge = edge | west0 | east0
        d6 = jnp.where(edge, 0.0, d6)
        d4c = d4[1:-1, 1:-1]
        d2c = d2[2:-2, 2:-2]

        q = window(qo_blk, qo_e, 1)
        p = window(po_blk, po_e, 1)

        def nb(f):
            return (f[1:-1, 2:], f[1:-1, :-2], f[2:, 1:-1],
                    f[:-2, 1:-1], f[2:, 2:], f[2:, :-2], f[:-2, 2:],
                    f[:-2, :-2])

        qe, qw, qn, qs, qne, qnw, qse, qsw = nb(q)
        pe, pw, pn, ps, pne, pnw, pse, psw = nb(p)
        qc = q[1:-1, 1:-1]
        jac = ((qe - qw) * (pn - ps) + (qs - qn) * (pe - pw)
               + qe * (pne - pse) - qw * (pnw - psw)
               - qn * (pne - pnw) + qs * (pse - psw)
               + pn * (qne - qnw) - ps * (qse - qsw)
               - pe * (qne - qse) + pw * (qnw - qsw))
        jac = jnp.where(edge, 0.0, jac)

        fdt = pom.dtype
        ah2k = jnp.zeros((), fdt)
        ah4k = jnp.zeros((), fdt)
        for i in range(nl):
            sel = (k == i).astype(fdt)
            ah2k = ah2k + sel * ah2[i]
            ah4k = ah4k + sel * ah4[i]

        dqdt = adfac * jac + (ah2k * rfnot) * d4c - (ah4k * rfnot) * d6
        if not cyclic:
            dqdt = jnp.where(west0 | east0, 0.0, dqdt)

        is0 = (k == 0).astype(fdt)
        is1 = (k == 1).astype(fdt)
        isb = (k == nl - 1).astype(fdt)
        dqdt = (dqdt + is0 * (fohfac0 * (wek_ref[...] - ent_ref[...]))
                + is1 * (fohfac1 * ent_ref[...])
                - isb * (bdrfac * d2c))

        qom = qom_ref[0]
        qnew = qom + tdt * dqdt
        if sponge:
            betay = beta_y0 + beta_dy * gr0.astype(fdt)
            qnew = qnew + (tdt * c1spl) * rspl_ref[...] * (qom - betay)
        out_ref[0, ...] = jnp.where(zonal, qc, qnew)

    return kernel


def qgstep_pallas(pom, po, qo, qom, wekpo, entoc, r_spl, consts,
                  ah2, ah4, *, cyclic, sponge, interpret=False,
                  row0=0, ny_total=None, col0=0, nx_total=None,
                  x_ext=False):
    """Fused vorticity leapfrog. `consts`: python-float tuple
    (dxm2, bcfac, adfac, 1/f0, tdt, bdrfac, c1spl, beta*y0, beta*dy,
    fohfac0, fohfac1); ah2/ah4: per-layer python-float tuples.
    Returns qo_new with the zonal boundary rows carrying the OLD qo
    (overwritten later by the boundary PV relation).

    row0/ny_total support per-shard calls inside the shard_map halo
    path (parallel/halo.py): the arrays then hold a ghost-extended
    local window whose row 0 sits at GLOBAL row `row0` (a traced
    int32 scalar is fine), while the wall/sponge masks key on the
    global domain height `ny_total` (static).

    x_ext (box only): pom/po/qo additionally carry HALO real exchanged
    ghost COLUMNS (2-D shard_map windows, parallel/halo.py); the core
    is then nx - 2*HALO wide with its column 0 at GLOBAL column `col0`
    (traced), wall masks keying on the global width `nx_total`
    (static). qom/wek/ent/rspl stay core-width."""
    nl, ny, nx = pom.shape
    ny_total = ny if ny_total is None else ny_total
    ncore = nx - 2 * HALO if x_ext else nx
    nx_total = ncore if nx_total is None else nx_total
    nty = pl.cdiv(ny, TILE_Y)
    nxw = ncore + 2 * HALO
    if x_ext:
        # pre-slice the width-1-halo fields to ncore+2 here (XLA-land):
        # an in-kernel lane slice cannot be concatenated with the
        # offset-0 edge rows by Mosaic
        po = po[..., HALO - 1: nx - HALO + 1]
        qo = qo[..., HALO - 1: nx - HALO + 1]
    nx_po = ncore + 2 if x_ext else nx

    # Every field rides RAW with ragged pipelined blocks (Mosaic masks
    # the edge tile); the halo-carrying inputs additionally ship their
    # thin out-of-block edge rows (_edges, ~h/T of a field) and the
    # window is assembled in VMEM -- no full-field staging relayouts.
    pom_e = _edges(pom, HALO, cyclic, nty, x_ext)  # (nl,nty,6,ncore+6)
    po_e = _edges(po, 1, cyclic, nty, x_ext)
    qo_e = _edges(qo, 1, cyclic, nty, x_ext)
    rspl = r_spl if sponge else jnp.zeros_like(wekpo)

    kernel = _make_kernel(ny_total, ncore, nl, cyclic, sponge, consts,
                          tuple(ah2), tuple(ah4), nx_total=nx_total,
                          x_ext=x_ext)

    # The package enables jax_enable_x64 globally (CPU parity runs);
    # Mosaic cannot lower the resulting int64 grid/index arithmetic,
    # so trace the kernel call in a 32-bit scope (all operands are
    # already float32 on TPU).
    x64_scope = (jax.enable_x64(False)
                 if jax.config.jax_enable_x64 and not interpret
                 else _nullcontext())
    with x64_scope:
        goff = jnp.stack([jnp.asarray(row0, jnp.int32),
                          jnp.asarray(col0, jnp.int32)])
        call = pl.pallas_call(
        kernel,
        grid=(nl, nty),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # global (row0,col0)
            pl.BlockSpec((1, TILE_Y, nx), lambda k, t: (k, t, 0),
                         memory_space=pltpu.VMEM),       # pom block
            pl.BlockSpec((1, TILE_Y, nx_po), lambda k, t: (k, t, 0),
                         memory_space=pltpu.VMEM),       # po block
            pl.BlockSpec((1, TILE_Y, nx_po), lambda k, t: (k, t, 0),
                         memory_space=pltpu.VMEM),       # qo block
            pl.BlockSpec((1, 1, 2 * HALO, nxw),
                         lambda k, t: (k, t, 0, 0),
                         memory_space=pltpu.VMEM),       # pom edges
            pl.BlockSpec((1, 1, 2, ncore + 2),
                         lambda k, t: (k, t, 0, 0),
                         memory_space=pltpu.VMEM),       # po edges
            pl.BlockSpec((1, 1, 2, ncore + 2),
                         lambda k, t: (k, t, 0, 0),
                         memory_space=pltpu.VMEM),       # qo edges
            pl.BlockSpec((1, TILE_Y, ncore),
                         lambda k, t: (k, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Y, ncore), lambda k, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Y, ncore), lambda k, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Y, ncore), lambda k, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_Y, ncore),
                               lambda k, t: (k, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nl, ny, ncore), pom.dtype),
            # 8 full-width blocks double-buffered exceed the default
            # 16 MB scoped-VMEM budget at reference-scale nx (v5e has
            # 128 MB of VMEM; at NAtl 4801-wide rows the blocks total
            # ~40 MB in flight)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )
        # vmap FENCE: pallas_call's automatic batching rule is broken
        # for this kernel on Mosaic -- at production widths (961-wide
        # rows) it SILENTLY CORRUPTED batched member trajectories and
        # later faulted the TPU kernel outright (commit 74f558c). Any
        # jax.vmap over this function must therefore never reach that
        # rule: sequential_vmap lowers a batched call to a lax.map
        # over the batch axis, one correct full-width kernel launch
        # per element. Correct but serial -- batched throughput work
        # should prefer the jnp stencil chain (models/ensemble.py
        # keeps use_pallas=False: batched-XLA measured 1.13x over a
        # per-member loop at 961^2, BENCHMARKS.md round 4).
        call = jax.custom_batching.sequential_vmap(call)
        out = call(goff, pom, po, qo, pom_e, po_e, qo_e, qom, wekpo,
                   entoc, rspl)

    return out


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
