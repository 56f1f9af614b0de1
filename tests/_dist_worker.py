"""Worker process for the 2-process jax.distributed test.

Each process joins the coordinator, builds the SAME ocean-only model,
shards the state over the GLOBAL (2-host) mesh, runs N steps, and
reports global scalar reductions (computed inside jit, so they are
fully replicated and fetchable from every process). Global non-sharded
I/O is guarded with is_primary() -- the test asserts exactly one
process wrote the marker.

Usage: python tests/_dist_worker.py <coord> <nproc> <pid> <outdir>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from qgcm_tpu.config import (ModelConfig, OceanConfig,  # noqa: E402
                             double_gyre_coupled)
from qgcm_tpu.model import build_model  # noqa: E402
from qgcm_tpu.models.ocean import (init_ocean_state,  # noqa: E402
                                   ocean_forcing_from_mean)
from qgcm_tpu.models.atmos import init_atmos_state  # noqa: E402
from qgcm_tpu.models.stepper import (make_ocean_only_runner,  # noqa: E402
                                     make_coupled_runner)
from qgcm_tpu.generators import eddy_pressure, zero_forcing  # noqa: E402
from qgcm_tpu.parallel.launch import (distributed_session,  # noqa: E402
                                      is_primary)
from qgcm_tpu.parallel.mesh import make_hybrid_mesh, shard_tree  # noqa: E402


def build():
    cfg = ModelConfig(nxta=24, nyta=24, nxaooc=24, nyaooc=12, ndxr=2,
                      fnot=5.92e-5, beta=2.08e-11,
                      ocean=OceanConfig(nlo=2, dxo=20e3, delek=2.0,
                                        hoc=(800.0, 3200.0),
                                        gpoc=(0.01,),
                                        tabsoc=(287.0, 282.0),
                                        ah2oc=(0.0, 0.0),
                                        ah4oc=(1e10, 1e10)),
                      ocean_only=True, cyclic_ocean=False).validate()
    model = build_model(cfg)
    st = init_ocean_state(model, po=eddy_pressure(cfg))
    f = ocean_forcing_from_mean(model, *zero_forcing(cfg))
    return model, st, f


def scalars(st):
    """Replicated global reductions of the (distributed) final state."""
    return jax.jit(lambda s: {
        "po_l2": jnp.sum(s.po ** 2),
        "po_max": jnp.max(jnp.abs(s.po)),
        "qo_l2": jnp.sum(s.qo ** 2),
        "sst_sum": jnp.sum(s.sst),
        "dpioc": jnp.sum(s.dpioc),
    })(st)


def build_coupled():
    cfg = double_gyre_coupled(nxta=24, nyta=12, nxaooc=8, nyaooc=8,
                              ndxr=4, dta=180.0,
                              ocean=OceanConfig(dxo=20.0e3))
    model = build_model(cfg)
    oc = init_ocean_state(model, po=eddy_pressure(cfg))
    at = init_atmos_state(model, init="rbal")
    return model, oc, at


def coupled_scalars(oc, at):
    return jax.jit(lambda o, a: {
        "cpl_po_l2": jnp.sum(o.po ** 2),
        # abs-sums: plain sums of near-zero-mean fields cancel to
        # rounding level and defeat a relative comparison
        "cpl_sst_sum": jnp.sum(jnp.abs(o.sst)),
        "cpl_pa_l2": jnp.sum(a.pa ** 2),
        "cpl_ast_sum": jnp.sum(jnp.abs(a.ast)),
        "cpl_hmixa_max": jnp.max(a.hmixa),
    })(oc, at)


def main():
    coord, nproc, pid, outdir = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    with distributed_session(coordinator_address=coord,
                             num_processes=nproc, process_id=pid):
        assert jax.process_count() == nproc
        assert len(jax.devices()) == 4 * nproc, len(jax.devices())
        assert len(jax.local_devices()) == 4

        model, st, f = build()
        st0, f0 = st, f           # host copies for the ensemble below
        # DCN-aware placement: hosts split 'y', local devices fill 'x'
        # (parallel/mesh.make_hybrid_mesh), and the PV inversion goes
        # through the explicit all_to_all pencil solvers.
        mesh = make_hybrid_mesh()
        assert mesh.shape["y"] == nproc, dict(mesh.shape)
        st = shard_tree(st, mesh)
        f = shard_tree(f, mesh)
        out = make_ocean_only_runner(model, mesh=mesh,
                                     spectral_variant="a2a")(st, f, 12)

        # state really is distributed across processes
        n_local = len(out.sst.addressable_shards)
        assert n_local < len(jax.devices()), n_local

        # coupled cycle over the same 2-process mesh: xforc (bicubic
        # refinement, windstress, heat fluxes) + both fluids' steps
        # and inversions run distributed (q-gcm.F:1222-1268 analogue)
        cmodel, oc, at = build_coupled()
        oc = shard_tree(oc, mesh)
        at = shard_tree(at, mesh)
        oc2, at2 = make_coupled_runner(cmodel, mesh=mesh,
                                       spectral_variant="a2a")(oc, at, 6)
        assert len(oc2.sst.addressable_shards) < len(jax.devices())

        # multi-HOST ensemble: 8 perturbed members sharded over the
        # global 8-device member mesh (4 members' shards per process);
        # the compiled program is collective-free, so this is the
        # scale-out path for predictability runs
        from qgcm_tpu.models.ensemble import (
            perturbed_ocean_members, make_ensemble_runner,
            ensemble_mesh, shard_members)
        members = perturbed_ocean_members(
            model, st0, jax.random.PRNGKey(11), 8, amp=1e-3)
        emesh = ensemble_mesh()
        ens = make_ensemble_runner(model, kind="ocean", mesh=emesh)(
            shard_members(members, emesh), f0, 12)
        ens_scalars = jax.jit(lambda ms: {
            "ens_po_l2": jnp.sum(ms.po ** 2),
            "ens_spread": jnp.sqrt(jnp.mean(
                jnp.square(jnp.std(ms.po, axis=0)))),
        })(ens)

        vals = {k: float(v) for k, v in scalars(out).items()}
        vals.update({k: float(v) for k, v in ens_scalars.items()})
        vals["ens_local_shards"] = len(ens.po.addressable_shards)
        vals.update({k: float(v) for k, v in
                     coupled_scalars(oc2, at2).items()})
        vals["primary"] = is_primary()
        vals["n_local_shards"] = n_local
        with open(os.path.join(outdir, f"proc{pid}.json"), "w") as fh:
            json.dump(vals, fh)

        if is_primary():              # global-IO guard under test
            with open(os.path.join(outdir, "primary_marker"), "w") as fh:
                fh.write(f"written by process {jax.process_index()}\n")


if __name__ == "__main__":
    main()
