#!/bin/bash
# Round-3 TPU chain — the evidence queue for VERDICT r2 items 1-4, 6-7.
#
# Hardened per VERDICT r2 item 5 (the round-2 runner's failures):
#  * every phase retry RESUMES from its checkpoint (PT --resume, NUTS
#    --resume, SBC per-replicate ckpt) instead of re-running from zero;
#  * after every attempt the crash cause (log tail) is recorded in
#    chain5_status.log, so a failure is a diagnosis, not a mystery;
#  * every phase ends in either an artifact or a loud FAILED record;
#  * a global deadline stops the queue in time for the driver's bench run.
#
# Queue order (rationale in docs/ROUND3.md):
#  1. score-identity check        — decisive simulator<->likelihood test
#  2. SBC NUTS warm-start, window A (~3 h of checkpointed slices)
#  3. carnarvon PT (synthetic-truth study), resume retries
#  4. full-scale 801^2 warm-started NUTS run (>= 1k draws, 2 chains)
#  5. SBC NUTS warm-start, window B (to 100 replicates)
#  6. REAL carnarvon data fit (MAP + NUTS on dataset=carnreal)
#  7. AM near-independent SBC arm (thin 60) — only if time remains
#  8. predictive checks at >= 100 draws for both studies
set -u
cd "$(dirname "$0")/.."

STATUS=chain5_status.log
DEADLINE=${CHAIN5_DEADLINE_S:-$(( $(date +%s) + 34200 ))}   # default +9.5 h

log() { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }

left() { echo $(( DEADLINE - $(date +%s) )); }

tpu_ok() {
    timeout 240 python -c "import jax; assert any(d.platform == 'tpu' for d in jax.devices()); import jax.numpy as jnp; (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()" >/dev/null 2>&1
}

wait_for_tpu() {
    until tpu_ok; do
        log "TPU unavailable; waiting..."
        sleep 120
    done
}

# run_phase <label> <timeout_s> <log> <cmd...>
# One attempt, bounded; records exit code and, on failure, the last lines
# of the phase log (the round-2 runner retried blind and re-crashed).
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
log "chain5 start; deadline in $(left) s"
mkdir -p carn_study/real runs

# -- [1] score-identity check --------------------------------------------
if [ ! -f sbc_study/score_check.json ]; then
    run_phase "[1] score check" 1800 sbc_study/score_check.log \
        python scripts/run_score_check.py --datasets 400 --thetas 3 \
        || log "[1] FAILED — no score_check.json"
else
    log "[1] score_check.json already present; skipping"
fi

# -- SBC NUTS warm-start loop (shared by windows A/B) ---------------------
# lean exact config: depth-4 trees, 160 draws thin 2 (same L = 80),
# Hessian-at-truth fixed metric, 48-step step-size-only warmup
sbc_nuts_window() {
    local window_s=$1 end=$(( $(date +%s) + $1 ))
    while [ "$(date +%s)" -lt "$end" ] && [ "$(left)" -gt 600 ]; do
        wait_for_tpu
        log "[sbc-nuts] slice START"
        timeout 3600 python scripts/run_sbc_study.py --sampler nuts \
            --warm-start --nuts-samples 160 --nuts-thin 2 --max-depth 4 \
            >> sbc_study/nuts_warm.log 2>&1
        local rc=$?
        log "[sbc-nuts] slice exit: $rc"
        python scripts/summarize_sbc_ckpt.py sbc_study/sbc_nuts.ckpt.npz \
            nuts sbc_study >> "$STATUS" 2>&1 || true
        if [ $rc -eq 0 ]; then log "[sbc-nuts] ARM COMPLETE"; return 0; fi
        if [ $rc -ne 124 ]; then
            log "[sbc-nuts] tail: $(tail -3 sbc_study/nuts_warm.log | tr '\n' ' | ')"
        fi
    done
    return 1
}

# -- [2] SBC NUTS window A (~3 h) -----------------------------------------
SBC_DONE=0
if python - <<'EOF'
import json, sys
try:
    s = json.load(open('sbc_study/summary.json'))['samplers']['nuts']
    sys.exit(0 if not s.get('partial', True) else 1)
except Exception:
    sys.exit(1)
EOF
then
    log "[2] NUTS SBC arm already complete"
    SBC_DONE=1
else
    sbc_nuts_window 10800 && SBC_DONE=1
fi

# -- [3] carnarvon PT (synthetic-truth study) ------------------------------
pt_phase() {
    local total=4000 burn=1000
    if [ ! -f carn_study/pt.npz ]; then
        run_phase "[3] carnarvon PT (new)" 6600 carn_study/pt.log \
            python -m parasitoids_tpu.bayes.run --new $((total - burn)) $burn \
                carn_study/pt --sampler pt --temps 8 --swap-every 10 \
                --tune-ladder --obs-sweeps 4 --checkpoint-every 500 \
                --max-program-steps 400 \
                dataset=carnarvon 'domain_info=(10000.0,200)' \
            && return 0
    fi
    # resume path: retries continue from rounds_done (NOT from zero — the
    # round-2 runner's blind identical re-run is exactly what item 5 bans)
    for attempt in 1 2 3; do
        [ -f carn_study/pt.npz ] || { log "[3] FAILED — no pt.npz to resume"; return 1; }
        local more
        more=$(python - <<'EOF'
import json
meta = json.load(open('carn_study/pt.meta.json'))
print(max(0, 4000 - int(meta.get('rounds_done', 0)) * int(meta.get('swap_every', 10))))
EOF
) || more=4000
        [ "$more" -le 0 ] && return 0
        run_phase "[3] carnarvon PT (resume $attempt, $more steps left)" 6600 \
            carn_study/pt.log \
            python -m parasitoids_tpu.bayes.run --resume carn_study/pt "$more" \
                --max-program-steps 400 \
                dataset=carnarvon 'domain_info=(10000.0,200)' \
            && return 0
    done
    return 1
}
if pt_phase; then
    run_phase "[3b] PT trace analysis" 1800 carn_study/analyze_pt.log \
        python scripts/analyze_carn_trace.py carn_study/pt.npz pt \
        || log "[3b] FAILED"
else
    log "[3] FAILED — PT did not finish; partial checkpoint (if any) kept"
fi

# -- [4] full-scale 801^2 warm-started NUTS (>= 1k draws, 2 chains) --------
nuts801_phase() {
    if [ ! -f runs/nuts_r3.npz ]; then
        if [ ! -f runs/nuts_r3.ckpt.npz ]; then
            run_phase "[4] 801^2 NUTS (new)" 7200 runs/nuts_r3.log \
                python -m parasitoids_tpu.bayes.run --new 1000 100 \
                    runs/nuts_r3 --sampler nuts --chains 2 --mass laplace \
                    --steps-per-call 4 --checkpoint-every 25 \
                    'domain_info=(10000.0,400)' \
                && return 0
        fi
        for attempt in 1 2; do
            [ -f runs/nuts_r3.ckpt.npz ] || break
            run_phase "[4] 801^2 NUTS (resume $attempt)" 7200 runs/nuts_r3.log \
                python -m parasitoids_tpu.bayes.run --resume runs/nuts_r3 0 \
                    --steps-per-call 4 'domain_info=(10000.0,400)' \
                && return 0
        done
        [ -f runs/nuts_r3.npz ] || return 1
    fi
    return 0
}
if nuts801_phase; then
    log "[4] 801^2 NUTS recorded at runs/nuts_r3.npz"
else
    log "[4] FAILED — see runs/nuts_r3.log"
fi

# -- [5] SBC NUTS window B (to completion) ---------------------------------
if [ "$SBC_DONE" -eq 0 ]; then
    sbc_nuts_window 10800 && SBC_DONE=1
fi

# -- [6] REAL carnarvon data fit -------------------------------------------
if [ ! -f data/carnrealsite.json ]; then
    python scripts/make_carnarvon_real_site.py >> "$STATUS" 2>&1
fi
real_fit() {
    if [ ! -f carn_study/real/nuts.npz ]; then
        if [ ! -f carn_study/real/nuts.ckpt.npz ]; then
            run_phase "[6] real-carnarvon NUTS (new)" 4800 \
                carn_study/real/nuts.log \
                python -m parasitoids_tpu.bayes.run --new 600 80 \
                    carn_study/real/nuts --sampler nuts --chains 2 \
                    --mass laplace --steps-per-call 8 \
                    --checkpoint-every 25 dataset=carnreal \
                    'domain_info=(10000.0,200)' \
                && return 0
        fi
        run_phase "[6] real-carnarvon NUTS (resume)" 4800 \
            carn_study/real/nuts.log \
            python -m parasitoids_tpu.bayes.run --resume \
                carn_study/real/nuts 0 --steps-per-call 8 \
                dataset=carnreal 'domain_info=(10000.0,200)' \
            && return 0
        [ -f carn_study/real/nuts.npz ] || return 1
    fi
    return 0
}
if real_fit; then
    run_phase "[6b] real-carnarvon diagnostics+PPC" 2400 \
        carn_study/real/analyze.log \
        python scripts/analyze_real_fit.py carn_study/real/nuts.npz \
        || log "[6b] FAILED"
else
    log "[6] FAILED — see carn_study/real/nuts.log"
fi

# -- [7] AM near-independent SBC arm (thin 60) — only with >= 2.6 h left ---
if [ "$(left)" -gt 9400 ]; then
    run_phase "[7] SBC AM thin-60 arm" 9000 sbc_study/am_thin60.log \
        python scripts/run_sbc_study.py --sampler am \
            --am-samples 4800 --am-burn 600 --am-thin 60 --obs-sweeps 8 \
            --outdir sbc_study/thin60 \
        || { python scripts/summarize_sbc_ckpt.py \
                 sbc_study/thin60/sbc_am.ckpt.npz am sbc_study/thin60 \
                 >> "$STATUS" 2>&1 || true; log "[7] partial recorded"; }
else
    log "[7] SKIPPED (deadline) — AM thin-60 arm not run"
fi

# -- [8] predictive checks at >= 100 draws ---------------------------------
for trace in carn_study/am carn_study/nuts carn_study/pt; do
    if [ -f "$trace.npz" ] && [ ! -f "${trace}_ppc100.json" ]; then
        run_phase "[8] PPC $trace" 2400 "${trace}_ppc.log" \
            python -m parasitoids_tpu.bayes.predictive "$trace.npz" \
                --draws 100 --json dataset=carnarvon \
                'domain_info=(10000.0,200)' \
            || log "[8] FAILED for $trace"
    fi
done
if [ -f runs/nuts_r3.npz ] && [ ! -f runs/nuts_r3_ppc100.json ]; then
    run_phase "[8] PPC kalbar nuts_r3" 2400 runs/nuts_r3_ppc.log \
        python -m parasitoids_tpu.bayes.predictive runs/nuts_r3.npz \
            --draws 100 --json 'domain_info=(10000.0,400)' \
        || log "[8] FAILED for runs/nuts_r3"
fi

log "chain5 done ($(left) s before deadline)"
