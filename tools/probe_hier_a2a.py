"""Probe: would a hierarchical (two-stage, 8-wide-group) all-to-all
restore the async lowering on a v5e:8x8 topology, where the direct
64-wide a2a is refused ("Async all-to-all not supported on limited
ICI", tools/census_overlap.py --topo v5e:8x8 --mesh 64x1)?

ANSWER (runnable record): NO. Factoring the rows axis into
('y1','y2') = 8x8 and issuing a2a('y2') + a2a('y1') -- each an 8-wide
replica group, the size that lowers asynchronously on v5e:2x4/4x4 --
still produces SYNCHRONOUS all-to-all ops on the 8x8 topology:

    async all-to-all-start ops: 0, sync all-to-all: 2

"Limited ICI" is a property of the TOPOLOGY (v5e 4x8 and 8x8 slices),
not of the replica-group size, so the two-stage decomposition (which
would also move ~1.75x the bytes) cannot buy overlap at 32+ chips.
The scaling model therefore credits no overlap past 16 chips
(tools/scaling_model.py ASYNC_MAX_P).

Run: python tools/probe_hier_a2a.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402


def main():
    try:
        from jax.experimental import topologies
        topo = topologies.get_topology_desc("v5e:8x8", "tpu")
    except Exception as e:  # pragma: no cover
        print("AOT TPU compile unavailable:", e)
        return
    mesh2 = Mesh(np.array(topo.devices).reshape(8, 8), ("y1", "y2"))

    def local(b):
        # the two stages of a factored rows-transpose: 8-wide groups
        c = lax.all_to_all(b, "y2", 2, 1, tiled=True)
        d = lax.all_to_all(c, "y1", 2, 1, tiled=True)
        return d * 2.0

    fn = jax.shard_map(local, mesh=mesh2,
                       in_specs=P(None, ("y1", "y2"), None),
                       out_specs=P(None, ("y1", "y2"), None))
    sd = jax.ShapeDtypeStruct((3, 4864, 4864), jnp.float32)
    with jax.enable_x64(False):
        txt = jax.jit(fn, compiler_options={
            "xla_tpu_enable_async_all_to_all": "true"}) \
            .lower(sd).compile().as_text()
    n_start = len(re.findall(r"all-to-all-start\(", txt))
    n_sync = len(re.findall(r"= .*\ball-to-all\(", txt))
    print(f"async all-to-all-start ops: {n_start}, "
          f"sync all-to-all: {n_sync}")


if __name__ == "__main__":
    main()
