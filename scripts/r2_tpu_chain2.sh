#!/bin/bash
# Round-2 TPU chain, phase 2 (after the 10k Kalbar chain):
#  1. Carnarvon recorded fit retry (AM now chunked under the tunnel limit)
#  2. long-window AM SBC arm (600+2400/thin 30/obs_sweeps 8 — the
#     recorded run docs/SBC.md's table points at)
#  3. NUTS SBC arm
# The hosted-TPU tunnel wedges for hours at a time, so: block until a
# probe succeeds, run each phase with one retry, and re-probe between
# attempts.  Each probe runs in a child process (a wedged tunnel hangs
# jax.devices() indefinitely).
set -u
cd "$(dirname "$0")/.."

tpu_ok() {
    timeout 240 python -c "import jax; assert any(d.platform == 'tpu' for d in jax.devices()); import jax.numpy as jnp; (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()" >/dev/null 2>&1
}

wait_for_tpu() {
    until tpu_ok; do
        echo "$(date +%H:%M:%S) TPU unavailable; waiting..." >> chain2_status.log
        sleep 120
    done
    echo "$(date +%H:%M:%S) TPU OK" >> chain2_status.log
}

# run_phase <label> <timeout_s> <logfile> cmd...
run_phase() {
    local label=$1 tmo=$2 log=$3; shift 3
    for attempt in 1 2; do
        wait_for_tpu
        echo "=== $label (attempt $attempt) $(date) ===" >> chain2_status.log
        timeout "$tmo" "$@" > "$log" 2>&1
        local rc=$?
        echo "$label attempt $attempt exit: $rc $(date)" >> chain2_status.log
        [ $rc -eq 0 ] && return 0
    done
    return 1
}

: > chain2_status.log

run_phase "[1/3] carnarvon fit" 10000 carn_study.log \
    python scripts/run_carnarvon_fit.py

run_phase "[2/3] SBC AM long-window" 9000 sbc_study/am_long.log \
    python scripts/run_sbc_study.py --sampler am

run_phase "[3/3] SBC NUTS" 14000 sbc_study/nuts_rerun.log \
    python scripts/run_sbc_study.py --sampler nuts

echo "=== chain2 done $(date) ===" >> chain2_status.log
