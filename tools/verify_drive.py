"""End-to-end package-surface drive (.claude/skills/verify recipe):
30-day unforced eddy run on CPU through the public API, then the
southwest-beta-drift and inversion-exactness oracles."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from qgcm_tpu.config import ModelConfig, OceanConfig
from qgcm_tpu.model import build_model
from qgcm_tpu.models.ocean import init_ocean_state, ocean_forcing_from_mean
from qgcm_tpu.models.stepper import make_ocean_only_runner
from qgcm_tpu.generators import eddy_pressure, zero_forcing
from qgcm_tpu.ops.vorticity import qcomp

cfg = ModelConfig(nxta=24, nyta=24, nxaooc=24, nyaooc=12, ndxr=4,
                  fnot=5.92e-5, beta=2.08e-11, dta=150.0,
                  ocean=OceanConfig(nlo=2, dxo=10e3, delek=0.0,
                      hoc=(800., 3200.), gpoc=(0.01,),
                      tabsoc=(287., 282.),
                      ah2oc=(0., 0.), ah4oc=(0., 0.)),
                  ocean_only=True, cyclic_ocean=True).validate()
model = build_model(cfg)
st0 = init_ocean_state(model, po=eddy_pressure(cfg))
f = ocean_forcing_from_mean(model, *zero_forcing(cfg))
st = make_ocean_only_runner(model)(st0, f, 5760)   # ~30 model days
p0, p1 = np.asarray(st0.po[0]), np.asarray(st.po[0])
j0, i0 = np.unravel_index(np.argmax(p0), p0.shape)
j1, i1 = np.unravel_index(np.argmax(p1), p1.shape)
print("SW drift:", (j0, i0), "->", (j1, i1))
assert i1 < i0 and j1 < j0, "beta drift not southwest"
q_re = np.asarray(qcomp(st.po, jnp.asarray(model.modes_oc.amat),
                        jnp.asarray(model.grids.yporel),
                        1.0 / model.grids.dxo**2, cfg.fnot, cfg.beta,
                        jnp.asarray(model.topo.ddynoc), cfg.nlo - 1,
                        cfg.cyclic_ocean))
qo = np.asarray(st.qo)
rel = np.abs(qo[:, 1:-1, 1:-1] - q_re[:, 1:-1, 1:-1]).max() \
    / np.abs(qo).max()
print("qcomp interior rel err:", rel)
assert rel < 1e-12
print("VERIFY OK")
