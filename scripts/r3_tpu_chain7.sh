#!/bin/bash
# Round-3 TPU chain, phase 7 — takes over from chain6.  chain6 outcomes:
#  [1] north-star 10k AM: OK (runs/northstar_am.npz, committed)
#  [2] carnarvon PT: ran crash-free under --max-program-steps chunking,
#      but the tuned ladder's swap rates collapsed (0.02-0.26) and the
#      cold chain is unconverged (ESS(g_aw) 18) — recorded as evidence;
#      the converged-posterior deliverable moves to warm NUTS here.
#  [3] 801^2 warm NUTS and [4] real-carnarvon fit: both OOMed in the
#      MAP-point Hessian (jax.hessian batches all 31 JVP columns: 23.8 GB
#      at 801^2, 19.7 GB at carnarvon 401^2 x 30 days, vs 15.75 GB HBM).
#      map_fit.hessian_columns (sequential HVPs) fixes both; redone here.
#  [5] 100-draw PPCs: ran for the recorded carnarvon traces.
# Also fixes a chain6 bug: NUTS --resume invocations must pass
# --sampler nuts (default is am; the resume retry routed to the AM loader
# and crashed on the missing traces npz).
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
    mkdir -p "$(dirname "$plog")"   # shell redirects cannot create dirs
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

# nuts_run <tag> <db> <log> <tmo> <new-args...>
# new run, then checkpoint resumes (with --sampler nuts) until done
nuts_run() {
    local tag=$1 db=$2 plog=$3 tmo=$4; shift 4
    if [ -f "$db.npz" ]; then return 0; fi
    if [ ! -f "$db.ckpt.npz" ]; then
        run_phase "$tag (new)" "$tmo" "$plog" \
            python -m parasitoids_tpu.bayes.run "$@" && return 0
    fi
    for attempt in 1 2; do
        [ -f "$db.ckpt.npz" ] || break
        run_phase "$tag (resume $attempt)" "$tmo" "$plog" \
            python -m parasitoids_tpu.bayes.run --resume "$db" 0 \
                --sampler nuts --steps-per-call 4 "${RESUME_OVERRIDES[@]}" \
            && return 0
    done
    [ -f "$db.npz" ]
}

: > "$STATUS"
log "chain7 start; deadline in $(left) s"

# -- [0] 801^2 warm NUTS (redo of chain6 [3] with hessian_columns) ---------
RESUME_OVERRIDES=('domain_info=(10000.0,400)')
if nuts_run "[0] 801^2 NUTS" runs/nuts_r3 runs/nuts_r3.log 6000 \
        --new 1000 100 runs/nuts_r3 --sampler nuts --chains 2 \
        --mass laplace --steps-per-call 4 --checkpoint-every 25 \
        'domain_info=(10000.0,400)'; then
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
RESUME_OVERRIDES=(dataset=carnarvon 'domain_info=(10000.0,200)')
if nuts_run "[1] carn warm NUTS" carn_study/nuts_warm \
        carn_study/nuts_warm.log 7200 \
        --new 700 80 carn_study/nuts_warm --sampler nuts --chains 2 \
        --mass laplace --steps-per-call 4 --checkpoint-every 25 \
        dataset=carnarvon 'domain_info=(10000.0,200)'; then
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

# -- [2] REAL carnarvon fit (redo of chain6 [4]) ---------------------------
RESUME_OVERRIDES=(dataset=carnreal 'domain_info=(10000.0,200)')
if nuts_run "[2] real-carnarvon NUTS" carn_study/real/nuts \
        carn_study/real/nuts.log 4800 \
        --new 600 80 carn_study/real/nuts --sampler nuts --chains 2 \
        --mass laplace --steps-per-call 8 --checkpoint-every 25 \
        dataset=carnreal 'domain_info=(10000.0,200)'; then
    run_phase "[2b] real-carnarvon diagnostics+PPC" 2400 \
        carn_study/real/analyze.log \
        python scripts/analyze_real_fit.py carn_study/real/nuts.npz \
        || log "[2b] FAILED"
else
    log "[2] FAILED — see carn_study/real/nuts.log"
fi

# -- [3] SBC NUTS warm loop to 100 replicates ------------------------------
while [ "$(left)" -gt 600 ]; do
    wait_for_tpu
    log "[3 sbc-nuts] slice START ($(left) s left)"
    timeout 3600 python scripts/run_sbc_study.py --sampler nuts \
        --warm-start --nuts-burn 32 --nuts-samples 128 --nuts-thin 2 \
        --max-depth 4 >> sbc_study/nuts_warm_arm.log 2>&1
    rc=$?
    log "[3 sbc-nuts] slice exit: $rc"
    python scripts/summarize_sbc_ckpt.py sbc_study/sbc_nuts.ckpt.npz \
        nuts sbc_study >> "$STATUS" 2>&1 || true
    if [ $rc -eq 0 ]; then log "[3 sbc-nuts] ARM COMPLETE"; break; fi
    if [ $rc -ne 124 ]; then
        log "[3 sbc-nuts] tail: $(tail -3 sbc_study/nuts_warm_arm.log | tr '\n' ' | ')"
    fi
done

log "chain7 done ($(left) s before deadline)"
