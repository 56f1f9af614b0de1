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

Secondary fields (TPU only): the NAtl.1km 4801^2x3 box, the
solve-bound regime where throughput is ~2.4x below the 961^2 headline
(~85 ms/step, frozen at ~85% of the 6-pass bf16 GEMM roofline with two
measured de-flip rejects -- BENCHMARKS.md). Reported here so the
per-round record carries BOTH numbers, not just the headline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "natl_ms_per_step": N, "natl_updates_per_s_per_chip": N}
"""

import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_UPDATES_PER_S = 1.0e7
STEPS_PER_CHUNK = 250
NATL_STEPS = 25
REPS = 3

# NAtl compiles 120-650 s cold on a remote TPU tunnel; the persistent
# cache makes re-runs warm (~1 s), same as `qgcm run`
if "JAX_COMPILATION_CACHE_DIR" not in os.environ and \
        jax.config.jax_compilation_cache_dir is None:
    _cache = os.path.expanduser("~/.cache/qgcm_tpu/xla")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def sync(st):
    # Materialise one element on the host: a remote backend's
    # block_until_ready can return before execution finishes, but a
    # value fetch cannot.
    jax.block_until_ready(st)
    return float(jax.tree_util.tree_leaves(st)[0].ravel()[0])


def measure_ocean_only(cfg, steps, reps):
    """min wall time per chunk over `reps` (after compile + layout
    settle), as (ms_per_step, updates_per_s)."""
    from qgcm_tpu.model import build_model
    from qgcm_tpu.models.ocean import (
        init_ocean_state, ocean_forcing_from_mean)
    from qgcm_tpu.models.stepper import make_ocean_only_runner
    from qgcm_tpu.generators import (eddy_pressure,
                                     double_gyre_windstress)

    model = build_model(cfg)
    st = init_ocean_state(model, po=eddy_pressure(cfg, ssh_amp=0.15))
    f = ocean_forcing_from_mean(
        model, *double_gyre_windstress(cfg, model.grids))
    run = make_ocean_only_runner(model)

    st = run(st, f, steps)     # compile
    sync(st)
    st = run(st, f, steps)     # settle output layouts
    sync(st)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        st = run(st, f, steps)
        sync(st)
        best = min(best, time.perf_counter() - t0)
    pts = cfg.nxpo * cfg.nypo * cfg.nlo      # p-grid point-layers
    return best / steps * 1e3, pts * steps / best


def main():
    from qgcm_tpu.config import double_gyre_ocean_only, natl_1km

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = "float32" if on_tpu else "float64"

    ms, rate = measure_ocean_only(
        double_gyre_ocean_only(dtype=dtype), STEPS_PER_CHUNK, REPS)
    out = {
        "metric": "ocean_gridpoint_layer_updates_per_s_per_chip",
        "value": rate,
        "unit": "updates/s",
        "vs_baseline": rate / BASELINE_UPDATES_PER_S,
    }
    if on_tpu:
        natl_ms, natl_rate = measure_ocean_only(
            natl_1km(dtype="float32"), NATL_STEPS, REPS)
        out["natl_ms_per_step"] = natl_ms
        out["natl_updates_per_s_per_chip"] = natl_rate
    print(json.dumps(out))


if __name__ == "__main__":
    main()
