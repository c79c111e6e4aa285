#!/bin/bash
# Round-2 TPU chain, phase 3 (queued behind chain2's NUTS SBC arm):
#  1. AM SBC arm with pooled chains (4 x (600+600)/thin 30, obs_sweeps 8,
#     L=80): tests whether multi-excursion pooling removes the edge-piled
#     ranks the single-excursion long-window arm flagged on g_aw.
#  2. Carnarvon PT run: the parallel-tempering sampler docs/CARNARVON.md
#     names as the right tool for the lambda-xi-obs-prob ridge, recorded.
# Same discipline as chain2: block on TPU health, one retry per phase.
set -u
cd "$(dirname "$0")/.."

PREV_PID=${1:-}

tpu_ok() {
    timeout 240 python -c "import jax; assert any(d.platform == 'tpu' for d in jax.devices()); import jax.numpy as jnp; (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()" >/dev/null 2>&1
}

wait_for_tpu() {
    until tpu_ok; do
        echo "$(date +%H:%M:%S) TPU unavailable; waiting..." >> chain3_status.log
        sleep 120
    done
    echo "$(date +%H:%M:%S) TPU OK" >> chain3_status.log
}

run_phase() {
    local label=$1 tmo=$2 log=$3; shift 3
    for attempt in 1 2; do
        wait_for_tpu
        echo "=== $label (attempt $attempt) $(date) ===" >> chain3_status.log
        timeout "$tmo" "$@" > "$log" 2>&1
        local rc=$?
        echo "$label attempt $attempt exit: $rc $(date)" >> chain3_status.log
        [ $rc -eq 0 ] && return 0
    done
    return 1
}

: > chain3_status.log

if [ -n "$PREV_PID" ]; then
    echo "waiting for chain2 (pid $PREV_PID) to finish..." >> chain3_status.log
    while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
    echo "chain2 done $(date)" >> chain3_status.log
fi

run_phase "[1/2] SBC AM multichain" 12000 sbc_study/am_multichain.log \
    python scripts/run_sbc_study.py --sampler am \
        --am-samples 600 --am-burn 600 --am-chains 4 --am-thin 30 \
        --outdir sbc_study/multichain

run_phase "[2/2] carnarvon PT" 9000 carn_study/pt.log \
    python -m parasitoids_tpu.bayes.run --new 3000 1000 carn_study/pt \
        --sampler pt --temps 8 --swap-every 10 --tune-ladder \
        --obs-sweeps 4 --checkpoint-every 500 \
        dataset=carnarvon 'domain_info=(10000.0,200)'

echo "=== chain3 done $(date) ===" >> chain3_status.log
