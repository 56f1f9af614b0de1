"""AOT schedule census: do the pencil-solve all_to_all spans enclose
GEMM work of OTHER modes/blocks?

The pencil solvers issue one transpose chain PER MODE and keep the
radix-split levels as separate block GEMMs precisely so the
latency-hiding scheduler can run one mode's all_to_all concurrently
with another's MXU transform stages (parallel/spectral.py,
solver/helmholtz.py tree form). This tool AOT-compiles the sharded box
solve for a v5e topology at NAtl scale (f32, matmul DST, async-a2a
flag) and reports, for every all-to-all-start/-done span in the
compiled schedule, how many instructions inside the span are GEMMs
(dot ops or fusions whose bodies contain dots) -- the direct evidence
that the transposes pipeline with transform compute.

Run: python tools/census_overlap.py [--size 4801]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from qgcm_tpu.solver.helmholtz import make_box_helmholtz  # noqa: E402
from qgcm_tpu.parallel.spectral import ShardedBoxHelmholtz  # noqa: E402


_GEMM_RE = re.compile(r"= .*\b(dot|convolution)\(")


def _dot_computations(txt: str) -> set:
    """Names of computations whose bodies contain a GEMM (dot, or
    convolution -- the TPU backend lowers the MXU matmuls that way)."""
    out = set()
    name = None
    has_dot = False
    for line in txt.splitlines():
        m = re.match(r"%?([\w.\-]+) \([^)]*\) -> ", line.strip())
        if m:
            if name and has_dot:
                out.add(name)
            name, has_dot = m.group(1), False
        if _GEMM_RE.search(line.strip()):
            has_dot = True
    if name and has_dot:
        out.add(name)
    return out


def census(txt: str):
    dotcomps = _dot_computations(txt)
    # the scheduled entry computation is the largest one
    body = max(re.split(r"\n(?=%|ENTRY)", txt), key=len)
    lines = body.splitlines()

    def is_gemm(line):
        s = line.strip()
        if _GEMM_RE.search(s):
            return True
        m = re.search(r"calls=%?([\w.\-]+)", s)
        return bool(m and m.group(1) in dotcomps)

    spans = []
    open_spans = {}          # var name -> (start line idx, gemms, ops)
    for i, line in enumerate(lines):
        s = line.strip()
        ms = re.match(r"%?([\w.\-]+) = .* all-to-all-start\(", s)
        if ms:
            open_spans[ms.group(1)] = [i, 0, 0]
            continue
        md = re.search(r"all-to-all-done\(%?([\w.\-]+)\)", s)
        if md and md.group(1) in open_spans:
            start, g, o = open_spans.pop(md.group(1))
            spans.append((i - start - 1, g, o))
            continue
        for v in open_spans.values():
            v[2] += 1
            if is_gemm(line):
                v[1] += 1
            elif " fusion(" in line or " reverse(" in line:
                v[2] += 0    # counted in width already
    return spans


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4801)
    ap.add_argument("--topo", default="v5e:2x4",
                    help="AOT topology (e.g. v5e:2x4, v5e:8x8)")
    ap.add_argument("--mesh", default=None, metavar="NYxNX",
                    help="mesh shape over the topology's devices "
                    "(default: rows-only NY=all, the production "
                    "layout; the round-2 census used 4x2)")
    ap.add_argument("--no-async", action="store_true",
                    help="compile with synchronous all-to-all (the "
                    "compiler refuses async a2a when the replica "
                    "group spans more than one torus ring, e.g. "
                    "64-wide groups on v5e:8x8: 'Async all-to-all "
                    "not supported on limited ICI'); reports the "
                    "sync a2a op count instead of spans")
    args = ap.parse_args()
    nxp = args.size
    try:
        from jax.experimental import topologies
        topo = topologies.get_topology_desc(args.topo, "tpu")
    except Exception as e:  # pragma: no cover
        print("AOT TPU compile unavailable:", e)
        return
    ndev = len(topo.devices)
    if args.mesh:
        my, mx = (int(v) for v in args.mesh.split("x"))
    else:
        my, mx = ndev, 1
    assert my * mx == ndev, (my, mx, ndev)
    tmesh = Mesh(np.array(topo.devices).reshape(my, mx), ("y", "x"))
    rdm2 = np.array([0.0, 5.9e-10, 2.3e-9], dtype=np.float32)
    base = make_box_helmholtz(nxp, nxp, 1e3, 1e3, rdm2,
                              dtype=jnp.float32, transform="matmul")
    sh = ShardedBoxHelmholtz(base, tmesh)
    sd = jax.ShapeDtypeStruct((3, nxp, nxp), jnp.float32)
    shd = NamedSharding(tmesh, P(None, "y", "x"))

    def fn(r):
        r = jax.lax.with_sharding_constraint(r, shd)
        return jax.lax.with_sharding_constraint(sh.solve(r), shd)

    opts = ({} if args.no_async else
            {"xla_tpu_enable_async_all_to_all": "true"})
    with jax.enable_x64(False):
        txt = jax.jit(fn, compiler_options=opts) \
            .lower(sd).compile().as_text()

    print(f"box a2a solve {nxp}^2 x 3 f32 (matmul DST), {args.topo} "
          f"AOT, mesh {my}x{mx}:")
    if args.no_async:
        n_a2a = len(re.findall(r"= .*\ball-to-all\(", txt))
        print(f"  synchronous all-to-all ops: {n_a2a} "
              "(compiles and runs; no overlap spans to census)")
        return
    spans = census(txt)
    print(f"  async all-to-all spans: {len(spans)}")
    tot_g = sum(g for _, g, _ in spans)
    n_gemmy = sum(1 for _, g, _ in spans if g > 0)
    for w, g, o in spans:
        print(f"    span width {w:3d} instrs, {g:3d} GEMM "
              f"(dot-containing) fusions")
    print(f"  spans enclosing GEMM work of other modes/blocks: "
          f"{n_gemmy}/{len(spans)}  (total {tot_g} GEMM fusions "
          "inside spans)")


if __name__ == "__main__":
    main()
