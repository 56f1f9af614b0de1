#!/usr/bin/env python
"""Headline benchmark: ocean grid-point-layer updates per second per chip.

Config: double-gyre 5 km ocean (961x961 p-grid, 3 layers) -- the
reference's examples/double_gyre_ocean_only case. One ocean leapfrog
substep = mixed layer + QG step + PV inversion + boundary PV
(reference main loop src/q-gcm.F:1222-1255).

Baseline: the reference publishes no throughput numbers; BASELINE.md
derives a CPU envelope of order 1e7 grid-point-layer updates/s from the
production job shape (1 process x 32 OpenMP threads, 336 h cap for a
5-year run). vs_baseline is measured against 1e7.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_UPDATES_PER_S = 1.0e7
STEPS_PER_CHUNK = 250
REPS = 3


def main():
    from qgcm_tpu.config import double_gyre_ocean_only
    from qgcm_tpu.model import build_model
    from qgcm_tpu.models.ocean import (
        init_ocean_state, ocean_forcing_from_mean)
    from qgcm_tpu.models.stepper import make_ocean_only_runner
    from qgcm_tpu.generators import eddy_pressure, double_gyre_windstress

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = "float32" if on_tpu else "float64"
    cfg = double_gyre_ocean_only(dtype=dtype)
    model = build_model(cfg)

    po = eddy_pressure(cfg, ssh_amp=0.15)
    state = init_ocean_state(model, po=po)
    forcing = ocean_forcing_from_mean(
        model, *double_gyre_windstress(cfg, model.grids))

    run = make_ocean_only_runner(model)

    def sync(st):
        # Materialise one element on the host: a remote backend's
        # block_until_ready can return before execution finishes, but a
        # value fetch cannot.
        jax.block_until_ready(st)
        return float(st.po[0, 1, 1])

    # compile + warmup
    state = run(state, forcing, STEPS_PER_CHUNK)
    sync(state)

    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        state = run(state, forcing, STEPS_PER_CHUNK)
        sync(state)
        best = min(best, time.perf_counter() - t0)

    points = cfg.nxpo * cfg.nypo * cfg.nlo          # p-grid point-layers
    rate = points * STEPS_PER_CHUNK / best
    print(json.dumps({
        "metric": "ocean_gridpoint_layer_updates_per_s_per_chip",
        "value": rate,
        "unit": "updates/s",
        "vs_baseline": rate / BASELINE_UPDATES_PER_S,
    }))


if __name__ == "__main__":
    main()
