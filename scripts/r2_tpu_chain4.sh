#!/bin/bash
# Round-2 TPU chain, phase 4 — replaces the chain2/chain3 queue after the
# NUTS SBC arm was measured at ~8.5 min/replicate (~14 h for 100): that arm
# now runs LAST as a checkpointed resume loop (parasitoids_tpu/bayes/sbc.py
# run_sbc(checkpoint_path=...)), with a partial summary recorded after every
# bounded invocation, so whatever completes is evidence.  Order:
#  1. AM multichain SBC arm (4 x (600+600)/thin 30 pooled): the
#     discriminator for the 4 edge-piled parameters the long-window arm
#     flagged (finite-chain artifact vs real defect).
#  2. Carnarvon PT run + trace analysis: the ridge tool docs/CARNARVON.md
#     names, recorded.
#  3. NUTS SBC arm: bounded invocations that resume from the per-replicate
#     checkpoint until 100 replicates or the loop budget is spent.
# Same discipline as chain2: block on TPU health, retry each phase.
set -u
cd "$(dirname "$0")/.."

tpu_ok() {
    timeout 240 python -c "import jax; assert any(d.platform == 'tpu' for d in jax.devices()); import jax.numpy as jnp; (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()" >/dev/null 2>&1
}

wait_for_tpu() {
    until tpu_ok; do
        echo "$(date +%H:%M:%S) TPU unavailable; waiting..." >> chain4_status.log
        sleep 120
    done
    echo "$(date +%H:%M:%S) TPU OK" >> chain4_status.log
}

run_phase() {
    local label=$1 tmo=$2 log=$3; shift 3
    for attempt in 1 2; do
        wait_for_tpu
        echo "=== $label (attempt $attempt) $(date) ===" >> chain4_status.log
        timeout "$tmo" "$@" > "$log" 2>&1
        local rc=$?
        echo "$label attempt $attempt exit: $rc $(date)" >> chain4_status.log
        [ $rc -eq 0 ] && return 0
    done
    return 1
}

: > chain4_status.log

# -- [1/3] AM multichain SBC (checkpointed; attempt 2 resumes) -----------
run_phase "[1/3] SBC AM multichain" 12000 sbc_study/am_multichain.log \
    python scripts/run_sbc_study.py --sampler am \
        --am-samples 600 --am-burn 600 --am-chains 4 --am-thin 30 \
        --outdir sbc_study/multichain
python scripts/summarize_sbc_ckpt.py sbc_study/multichain/sbc_am.ckpt.npz \
    am sbc_study/multichain >> chain4_status.log 2>&1 || true

# -- [2/3] Carnarvon PT ---------------------------------------------------
run_phase "[2/3] carnarvon PT" 9000 carn_study/pt.log \
    python -m parasitoids_tpu.bayes.run --new 3000 1000 carn_study/pt \
        --sampler pt --temps 8 --swap-every 10 --tune-ladder \
        --obs-sweeps 4 --checkpoint-every 500 \
        dataset=carnarvon 'domain_info=(10000.0,200)'
if [ -f carn_study/pt.npz ]; then
    python scripts/analyze_carn_trace.py carn_study/pt.npz pt \
        >> chain4_status.log 2>&1 || true
fi

# -- [3/3] NUTS SBC resume loop ------------------------------------------
# each invocation resumes from sbc_study/sbc_nuts.ckpt.npz; a partial
# summary lands in sbc_study/summary.json after every bounded slice
for slice in 1 2 3 4 5 6 7 8 9 10 11 12; do
    wait_for_tpu
    echo "=== [3/3] SBC NUTS slice $slice $(date) ===" >> chain4_status.log
    timeout 4000 python scripts/run_sbc_study.py --sampler nuts \
        >> sbc_study/nuts_rerun.log 2>&1
    rc=$?
    echo "[3/3] NUTS slice $slice exit: $rc $(date)" >> chain4_status.log
    if [ $rc -eq 0 ]; then
        echo "[3/3] NUTS arm complete $(date)" >> chain4_status.log
        break
    fi
    python scripts/summarize_sbc_ckpt.py sbc_study/sbc_nuts.ckpt.npz \
        nuts sbc_study >> chain4_status.log 2>&1 || true
done

echo "=== chain4 done $(date) ===" >> chain4_status.log
