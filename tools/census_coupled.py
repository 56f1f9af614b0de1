"""Census of the coupled sharded scan body: which ops all-gather?

Builds the coupled runner at test scale on the 8-virtual-device CPU
mesh (rows-only, like the cyclic census) and prints every collective
in the while-loop body with its shape, plus metadata source lines.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import re
import numpy as np

from qgcm_tpu.config import double_gyre_coupled, OceanConfig
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import init_ocean_state
from qgcm_tpu.models.atmos import init_atmos_state
from qgcm_tpu.models.stepper import make_coupled_runner
from qgcm_tpu.parallel.mesh import make_mesh, shard_tree


def main():
    rows_only = "--rows" in sys.argv
    cfg = double_gyre_coupled(nxta=24, nyta=12, nxaooc=8, nyaooc=8,
                              ndxr=2, dta=180.0, dtype="float64",
                              ocean=OceanConfig(dxo=40.0e3))
    model = build_model(cfg)
    mesh = make_mesh(jax.devices()[:8], rows_only=rows_only)
    print("mesh:", dict(mesh.shape))
    ocean = shard_tree(init_ocean_state(model, init="rbal"), mesh)
    atmos = shard_tree(init_atmos_state(model, init="rbal"), mesh)
    run = make_coupled_runner(model, mesh=mesh, spectral_variant="a2a")
    txt = run.lower(ocean, atmos, 2 * cfg.nstr).compile().as_text()
    body = max(re.split(r"\n(?=%|ENTRY)", txt), key=len)
    for op in ("all-gather", "all-to-all", "collective-permute"):
        n = len(re.findall(" " + op, body))
        print(f"{op}: {n}")
    print("---- all-gather lines ----")
    for line in body.splitlines():
        if re.search(r"= \S* all-gather", line.strip()) or \
           "all-gather-start" in line:
            s = line.strip()
            m = re.search(r'metadata=\{[^}]*op_name="([^"]*)"', s)
            src = re.search(r'source_file="([^"]*)"[^}]*source_line=(\d+)',
                            s)
            shape = s.split("=", 1)[0].strip()
            print(shape)
            if m:
                print("   op:", m.group(1)[:160])
            if src:
                print("   at:", src.group(1), ":", src.group(2))


if __name__ == "__main__":
    main()
