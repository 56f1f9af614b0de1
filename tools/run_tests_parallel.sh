#!/usr/bin/env bash
# Full suite as 3 parallel pytest groups (~12 min wall vs ~32 min
# serial; tests/conftest.py pins every group to CPU with the 8-device
# virtual mesh, so the groups do not contend for the TPU tunnel).
# Groups are balanced by measured file durations; NEW test files land
# in group 3 by the catch-all glob below -- rebalance when a group
# dominates. Usage: tools/run_tests_parallel.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."

G1="tests/test_ensemble.py tests/test_halo.py tests/test_longrun_mesh.py"
G2="tests/test_sharding.py tests/test_spectral.py tests/test_distributed.py tests/test_golden.py tests/test_params_run.py"
# group 3: everything else (catch-all keeps new files covered)
G3=$(ls tests/test_*.py | grep -v -e ensemble -e halo -e longrun_mesh \
     -e sharding -e spectral -e distributed -e golden -e params_run \
     | tr '\n' ' ')

pids=()
logs=()
i=0
for g in "$G1" "$G2" "$G3"; do
    i=$((i + 1))
    log=$(mktemp /tmp/qgcm_tests_g${i}.XXXX.log)
    logs+=("$log")
    # shellcheck disable=SC2086
    python -m pytest $g -q "$@" >"$log" 2>&1 &
    pids+=($!)
done

rc=0
for i in 0 1 2; do
    wait "${pids[$i]}" || rc=1
    echo "=== group $((i + 1)) ==="
    tail -n 3 "${logs[$i]}"
done
exit $rc
