#!/bin/bash
# Round-3 TPU chain, phase 7 — takes over from chain6 once its fixed
# phases ([1] north-star, [2] PT, [3] 801^2 NUTS, [4] real fit, [5] PPC)
# have run.  The PT run completed crash-free (the --max-program-steps
# chunking fix) but its ladder swap rates collapsed (0.02-0.26) and the
# cold chain is unconverged (ESS(g_aw) 18) — so the converged-Carnarvon
# deliverable (VERDICT r2 item 2) moves to the machinery that already
# converged the Kalbar 801^2 posterior: Laplace-warm-started NUTS.
# Remaining queue:
#  1. carnarvon (synthetic-truth) warm NUTS, 2 chains x (80 + 700)
#  2. its diagnostics + 100-draw PPC
#  3. SBC NUTS warm loop to 100 replicates (every remaining minute)
set -u
cd "$(dirname "$0")/.."

STATUS=chain7_status.log
DEADLINE=${CHAIN7_DEADLINE_S:-$(( $(date +%s) + 14400 ))}

log() { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

tpu_ok() {
    timeout 240 python -c "import jax; assert any(d.platform == 'tpu' for d in jax.devices()); import jax.numpy as jnp; (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()" >/dev/null 2>&1
}
wait_for_tpu() {
    until tpu_ok; do log "TPU unavailable; waiting..."; sleep 120; done
}

run_phase() {
    local label=$1 tmo=$2 plog=$3; shift 3
    if [ "$(left)" -lt 300 ]; then log "$label SKIPPED (deadline)"; return 2; fi
    [ "$tmo" -gt "$(left)" ] && tmo=$(left)
    wait_for_tpu
    log "$label START (timeout ${tmo}s)"
    timeout "$tmo" "$@" >> "$plog" 2>&1
    local rc=$?
    log "$label exit: $rc"
    if [ $rc -ne 0 ]; then
        log "$label tail: $(tail -3 "$plog" | tr '\n' ' | ')"
    fi
    return $rc
}

: > "$STATUS"
log "chain7 start; deadline in $(left) s"

# -- [0] 801^2 warm NUTS (redo of chain6 [3]) ------------------------------
# chain6's attempt OOMed in the MAP-point Hessian: jax.hessian batches all
# 31 JVP columns (23.8 GB > 15.75 GB HBM at 801^2); map_fit now computes
# sequential HVP columns (hessian_columns), so this retries with the fix.
nuts801() {
    if [ -f runs/nuts_r3.npz ]; then return 0; fi
    if [ ! -f runs/nuts_r3.ckpt.npz ]; then
        run_phase "[0] 801^2 NUTS (new)" 6000 runs/nuts_r3.log \
            python -m parasitoids_tpu.bayes.run --new 1000 100 \
                runs/nuts_r3 --sampler nuts --chains 2 --mass laplace \
                --steps-per-call 4 --checkpoint-every 25 \
                'domain_info=(10000.0,400)' \
            && return 0
    fi
    for attempt in 1 2; do
        [ -f runs/nuts_r3.ckpt.npz ] || break
        run_phase "[0] 801^2 NUTS (resume $attempt)" 6000 runs/nuts_r3.log \
            python -m parasitoids_tpu.bayes.run --resume runs/nuts_r3 0 \
                --steps-per-call 4 'domain_info=(10000.0,400)' \
            && return 0
    done
    [ -f runs/nuts_r3.npz ]
}
if nuts801; then
    log "[0] 801^2 NUTS recorded at runs/nuts_r3.npz"
    if [ ! -f runs/nuts_r3_ppc100.json ]; then
        run_phase "[0b] PPC kalbar nuts_r3" 2400 runs/nuts_r3_ppc.log \
            python -m parasitoids_tpu.bayes.predictive runs/nuts_r3.npz \
                --draws 100 --json 'domain_info=(10000.0,400)' \
            || log "[0b] FAILED"
    fi
else
    log "[0] FAILED — see runs/nuts_r3.log"
fi

# -- [1] carnarvon synthetic-truth warm NUTS -------------------------------
carn_nuts() {
    if [ -f carn_study/nuts_warm.npz ]; then return 0; fi
    if [ ! -f carn_study/nuts_warm.ckpt.npz ]; then
        run_phase "[1] carn warm NUTS (new)" 7200 carn_study/nuts_warm.log \
            python -m parasitoids_tpu.bayes.run --new 700 80 \
                carn_study/nuts_warm --sampler nuts --chains 2 \
                --mass laplace --steps-per-call 4 --checkpoint-every 25 \
                dataset=carnarvon 'domain_info=(10000.0,200)' \
            && return 0
    fi
    for attempt in 1 2; do
        [ -f carn_study/nuts_warm.ckpt.npz ] || break
        run_phase "[1] carn warm NUTS (resume $attempt)" 7200 \
            carn_study/nuts_warm.log \
            python -m parasitoids_tpu.bayes.run --resume \
                carn_study/nuts_warm 0 --steps-per-call 4 \
                dataset=carnarvon 'domain_info=(10000.0,200)' \
            && return 0
    done
    [ -f carn_study/nuts_warm.npz ]
}
if carn_nuts; then
    run_phase "[1b] carn warm NUTS diagnostics" 1800 \
        carn_study/analyze_nuts_warm.log \
        python scripts/analyze_carn_trace.py carn_study/nuts_warm.npz \
            nuts_warm || log "[1b] FAILED"
    if [ ! -f carn_study/nuts_warm_ppc100.json ]; then
        run_phase "[1c] carn warm NUTS PPC" 2400 carn_study/nuts_warm_ppc.log \
            python -m parasitoids_tpu.bayes.predictive \
                carn_study/nuts_warm.npz --draws 100 --json \
                dataset=carnarvon 'domain_info=(10000.0,200)' \
            || log "[1c] FAILED"
    fi
else
    log "[1] FAILED — see carn_study/nuts_warm.log"
fi

# -- [2] SBC NUTS warm loop to 100 replicates ------------------------------
while [ "$(left)" -gt 600 ]; do
    wait_for_tpu
    log "[2 sbc-nuts] slice START ($(left) s left)"
    timeout 3600 python scripts/run_sbc_study.py --sampler nuts \
        --warm-start --nuts-burn 32 --nuts-samples 128 --nuts-thin 2 \
        --max-depth 4 >> sbc_study/nuts_warm.log 2>&1
    rc=$?
    log "[2 sbc-nuts] slice exit: $rc"
    python scripts/summarize_sbc_ckpt.py sbc_study/sbc_nuts.ckpt.npz \
        nuts sbc_study >> "$STATUS" 2>&1 || true
    if [ $rc -eq 0 ]; then log "[2 sbc-nuts] ARM COMPLETE"; break; fi
    if [ $rc -ne 124 ]; then
        log "[2 sbc-nuts] tail: $(tail -3 sbc_study/nuts_warm.log | tr '\n' ' | ')"
    fi
done

log "chain7 done ($(left) s before deadline)"
