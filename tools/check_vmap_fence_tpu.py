"""One-shot TPU validation of the Pallas vmap fence (round 5).

Runs jax.vmap over the pallas-enabled _qgostep COMPILED on the real
chip (f32) and compares against a per-member loop. Before the
sequential_vmap fence (ops/pallas_qg.py) this lowering went through
pallas_call's automatic batching rule, which silently corrupted
batched trajectories at 961-wide rows and faulted Mosaic at
production widths (commit 74f558c). Usage:

    python tools/check_vmap_fence_tpu.py [--wide]

--wide uses a 961-wide cyclic channel (the width that faulted).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qgcm_tpu.config import ModelConfig, OceanConfig, SpongeConfig
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import (init_ocean_state,
                                   ocean_forcing_from_mean, _qgostep,
                                   _oml, make_ocean_step)
from qgcm_tpu.generators import eddy_pressure, double_gyre_windstress


def main():
    wide = "--wide" in sys.argv
    nxta = 240 if wide else 24
    oc = OceanConfig(nlo=3, dxo=20e3, delek=2.0,
                     hoc=(350.0, 750.0, 2900.0),
                     gpoc=(0.015, 0.0075),
                     tabsoc=(287.0, 282.0, 276.0),
                     ah2oc=(1e2, 1e2, 1e2),
                     ah4oc=(1e10, 2e10, 3e10))
    cfg = ModelConfig(nxta=nxta, nyta=24, nxaooc=nxta, nyaooc=12,
                      ndxr=6 if wide else 4, fnot=5.92e-5,
                      beta=2.08e-11, ocean=oc, ocean_only=True,
                      cyclic_ocean=True, dtype="float32",
                      sponge=SpongeConfig(enabled=True),
                      use_pallas=True)
    model = build_model(cfg.validate())
    st = init_ocean_state(model, po=eddy_pressure(cfg))
    f = ocean_forcing_from_mean(
        model, *double_gyre_windstress(cfg, model.grids))
    st, _ = jax.jit(make_ocean_step(model))(st, f)
    entoc = _oml(model, st, f)[2]
    print("grid:", st.po.shape, "backend:", jax.default_backend())

    sts = jax.tree.map(lambda x: jnp.stack([x, 1.01 * x, 0.99 * x]), st)
    q_b = jax.jit(jax.vmap(
        lambda s: _qgostep(model, s, f, entoc)[0]))(sts)
    one = jax.jit(lambda s: _qgostep(model, s, f, entoc)[0])
    ok = True
    for i in range(3):
        si = jax.tree.map(lambda x: x[i], sts)
        q_i = one(si)
        same = np.array_equal(np.asarray(q_b[i]), np.asarray(q_i))
        print(f"member {i}: bit-exact={same}  "
              f"maxabs={float(jnp.abs(q_b[i] - q_i).max()):.3e}")
        ok &= same
    print("FENCE OK" if ok else "FENCE MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
