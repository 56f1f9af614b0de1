"""Sharded checkpointing via Orbax (the at-scale path of SURVEY §5.4).

restart.nc (io/restart.py) stays the interoperable format -- identical
schema to the reference, but it gathers the state to one host. For
multi-host NAtl.1km-class runs, each process instead writes its own
shards of the leapfrog state with Orbax, and restores directly into
the target sharding without materialising the global arrays anywhere.

The checkpoint stores only (po, pom, sst, sstm, pa, pam, ast, astm,
hmixa, hmixam, tyrs) -- exactly the reference restart contract;
vorticity and the constraint scalars are rederived on load
(q-gcm.F:715-750), keeping resume exact.
"""

from __future__ import annotations

import numpy as np


def _state_payload(ocean, atmos, tyrs: float) -> dict:
    return dict(
        po=ocean.po, pom=ocean.pom, sst=ocean.sst, sstm=ocean.sstm,
        pa=atmos.pa, pam=atmos.pam, ast=atmos.ast, astm=atmos.astm,
        hmixa=atmos.hmixa, hmixam=atmos.hmixam,
        tyrs=np.float64(tyrs))


def save_checkpoint(path: str, ocean, atmos, tyrs: float, model=None):
    """Write a (possibly sharded) checkpoint directory. In
    single-fluid modes pass the inactive state as None together with
    `model` and a default init-time state is stored for it (the
    reference restart likewise always carries both fluids)."""
    import orbax.checkpoint as ocp
    if ocean is None or atmos is None:
        if model is None:
            raise ValueError("model= required when a state is None")
        zoc, zat = _zero_states(model)
        ocean = ocean if ocean is not None else zoc
        atmos = atmos if atmos is not None else zat
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        ckptr.save(path, _state_payload(ocean, atmos, tyrs), force=True)


def load_checkpoint(path: str, model, mesh=None):
    """-> (OceanState, AtmosState, tyrs). With `mesh`, arrays restore
    directly into the 2-D spatial sharding used by the runners."""
    import orbax.checkpoint as ocp
    import jax

    restore_args = None
    if mesh is not None:
        from ..parallel.mesh import _divisible_spec
        from jax.sharding import NamedSharding

        template = _state_payload(
            *_zero_states(model), 0.0)

        def arg(x):
            x = np.asarray(x)
            if x.ndim < 2:
                return ocp.ArrayRestoreArgs(
                    sharding=NamedSharding(
                        mesh, jax.sharding.PartitionSpec()))
            return ocp.ArrayRestoreArgs(
                sharding=NamedSharding(mesh, _divisible_spec(mesh, x)))

        restore_args = jax.tree_util.tree_map(arg, template)

    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        if restore_args is not None:
            d = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(
                    restore_args=restore_args))
        else:
            d = ckptr.restore(path)

    from ..models.ocean import init_ocean_state
    from ..models.atmos import init_atmos_state
    ocean = init_ocean_state(model, po=d["po"], pom=d["pom"],
                             sst=d["sst"], sstm=d["sstm"])
    atmos = init_atmos_state(model, pa=d["pa"], pam=d["pam"],
                             ast=d["ast"], astm=d["astm"],
                             hmixa=d["hmixa"], hmixam=d["hmixam"])
    return ocean, atmos, float(np.asarray(d["tyrs"]))


def _zero_states(model):
    from ..models.ocean import init_ocean_state
    from ..models.atmos import init_atmos_state
    return (init_ocean_state(model, init="zero"),
            init_atmos_state(model, init="zero"))
