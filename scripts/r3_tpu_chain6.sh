#!/bin/bash
# Round-3 TPU chain, phase 6 — REORDERED replacement for chain5 after the
# warm-SBC replicate rate was measured at ~3.5 min (chain5's SBC-first
# ordering would have starved the hard verdict items).  Hard items run
# first at bounded cost, then the SBC arm gets every remaining minute at
# a leaner exact config (32-step step-size warmup + 128 draws thin 2,
# L = 64 rank levels, depth-4 trees — an exact NUTS kernel regardless,
# so the SBC null is untouched; only test resolution changes 80 -> 64).
#
# Hardening identical to chain5 (resume-on-retry, crash tails recorded,
# per-phase artifacts-or-FAILED, global deadline).  Queue:
#  1. north-star 10k-sample Kalbar AM chain (recorded artifact, ~6 min)
#  2. carnarvon PT (synthetic-truth study), resume retries
#  3. full-scale 801^2 warm-started NUTS run (1k draws, 2 chains)
#  4. REAL carnarvon data fit (dataset=carnreal) + diagnostics/PPC
#  5. predictive checks at >= 100 draws for recorded traces
#  6. SBC NUTS warm-start loop to 100 replicates (remaining time)
#  7. AM thin-60 arm only if the SBC arm completes with >= 2.6 h spare
set -u
cd "$(dirname "$0")/.."

STATUS=chain6_status.log
DEADLINE=${CHAIN6_DEADLINE_S:-$(( $(date +%s) + 30000 ))}

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
log "chain6 start; deadline in $(left) s"
mkdir -p carn_study/real runs

# -- [1] north-star 10k-sample Kalbar AM chain (committed artifact) --------
if [ ! -f runs/northstar_am.npz ]; then
    run_phase "[1] north-star 10k AM" 1800 runs/northstar_am.log \
        python -m parasitoids_tpu.bayes.run --new 10000 1000 \
            runs/northstar_am --checkpoint-every 1000 \
        || log "[1] FAILED"
else
    log "[1] north-star artifact already present"
fi

# -- [2] carnarvon PT (synthetic-truth study) ------------------------------
pt_phase() {
    if [ ! -f carn_study/pt.npz ]; then
        run_phase "[2] carnarvon PT (new)" 6600 carn_study/pt.log \
            python -m parasitoids_tpu.bayes.run --new 3000 1000 \
                carn_study/pt --sampler pt --temps 8 --swap-every 10 \
                --tune-ladder --obs-sweeps 4 --checkpoint-every 500 \
                --max-program-steps 400 \
                dataset=carnarvon 'domain_info=(10000.0,200)' \
            && return 0
    fi
    for attempt in 1 2 3; do
        [ -f carn_study/pt.npz ] || { log "[2] FAILED — no pt.npz to resume"; return 1; }
        local more
        more=$(python - <<'EOF'
import json
meta = json.load(open('carn_study/pt.meta.json'))
print(max(0, 4000 - int(meta.get('rounds_done', 0)) * int(meta.get('swap_every', 10))))
EOF
) || more=4000
        [ "$more" -le 0 ] && return 0
        run_phase "[2] carnarvon PT (resume $attempt, $more steps left)" 6600 \
            carn_study/pt.log \
            python -m parasitoids_tpu.bayes.run --resume carn_study/pt "$more" \
                --max-program-steps 400 \
                dataset=carnarvon 'domain_info=(10000.0,200)' \
            && return 0
    done
    return 1
}
if pt_phase; then
    run_phase "[2b] PT trace analysis" 1800 carn_study/analyze_pt.log \
        python scripts/analyze_carn_trace.py carn_study/pt.npz pt \
        || log "[2b] FAILED"
else
    log "[2] FAILED — PT did not finish; partial checkpoint (if any) kept"
fi

# -- [3] full-scale 801^2 warm-started NUTS (1k draws, 2 chains) ------------
nuts801_phase() {
    if [ -f runs/nuts_r3.npz ]; then return 0; fi
    if [ ! -f runs/nuts_r3.ckpt.npz ]; then
        run_phase "[3] 801^2 NUTS (new)" 7200 runs/nuts_r3.log \
            python -m parasitoids_tpu.bayes.run --new 1000 100 \
                runs/nuts_r3 --sampler nuts --chains 2 --mass laplace \
                --steps-per-call 4 --checkpoint-every 25 \
                'domain_info=(10000.0,400)' \
            && return 0
    fi
    for attempt in 1 2; do
        [ -f runs/nuts_r3.ckpt.npz ] || break
        run_phase "[3] 801^2 NUTS (resume $attempt)" 7200 runs/nuts_r3.log \
            python -m parasitoids_tpu.bayes.run --resume runs/nuts_r3 0 \
                --steps-per-call 4 'domain_info=(10000.0,400)' \
            && return 0
    done
    [ -f runs/nuts_r3.npz ]
}
if nuts801_phase; then
    log "[3] 801^2 NUTS recorded at runs/nuts_r3.npz"
else
    log "[3] FAILED — see runs/nuts_r3.log"
fi

# -- [4] REAL carnarvon data fit -------------------------------------------
real_fit() {
    if [ -f carn_study/real/nuts.npz ]; then return 0; fi
    if [ ! -f carn_study/real/nuts.ckpt.npz ]; then
        run_phase "[4] real-carnarvon NUTS (new)" 4800 \
            carn_study/real/nuts.log \
            python -m parasitoids_tpu.bayes.run --new 600 80 \
                carn_study/real/nuts --sampler nuts --chains 2 \
                --mass laplace --steps-per-call 8 \
                --checkpoint-every 25 dataset=carnreal \
                'domain_info=(10000.0,200)' \
            && return 0
    fi
    run_phase "[4] real-carnarvon NUTS (resume)" 4800 \
        carn_study/real/nuts.log \
        python -m parasitoids_tpu.bayes.run --resume \
            carn_study/real/nuts 0 --steps-per-call 8 \
            dataset=carnreal 'domain_info=(10000.0,200)' \
        && return 0
    [ -f carn_study/real/nuts.npz ]
}
if real_fit; then
    run_phase "[4b] real-carnarvon diagnostics+PPC" 2400 \
        carn_study/real/analyze.log \
        python scripts/analyze_real_fit.py carn_study/real/nuts.npz \
        || log "[4b] FAILED"
else
    log "[4] FAILED — see carn_study/real/nuts.log"
fi

# -- [5] predictive checks at >= 100 draws ---------------------------------
for trace in carn_study/am carn_study/nuts carn_study/pt; do
    if [ -f "$trace.npz" ] && [ ! -f "${trace}_ppc100.json" ]; then
        run_phase "[5] PPC $trace" 2400 "${trace}_ppc.log" \
            python -m parasitoids_tpu.bayes.predictive "$trace.npz" \
                --draws 100 --json dataset=carnarvon \
                'domain_info=(10000.0,200)' \
            || log "[5] FAILED for $trace"
    fi
done
if [ -f runs/nuts_r3.npz ] && [ ! -f runs/nuts_r3_ppc100.json ]; then
    run_phase "[5] PPC kalbar nuts_r3" 2400 runs/nuts_r3_ppc.log \
        python -m parasitoids_tpu.bayes.predictive runs/nuts_r3.npz \
            --draws 100 --json 'domain_info=(10000.0,400)' \
        || log "[5] FAILED for runs/nuts_r3"
fi

# -- [6] SBC NUTS warm-start loop to 100 replicates (remaining time) --------
SBC_DONE=0
while [ "$(left)" -gt 600 ]; do
    wait_for_tpu
    log "[6 sbc-nuts] slice START ($(left) s left)"
    timeout 3600 python scripts/run_sbc_study.py --sampler nuts \
        --warm-start --nuts-burn 32 --nuts-samples 128 --nuts-thin 2 \
        --max-depth 4 >> sbc_study/nuts_warm.log 2>&1
    rc=$?
    log "[6 sbc-nuts] slice exit: $rc"
    python scripts/summarize_sbc_ckpt.py sbc_study/sbc_nuts.ckpt.npz \
        nuts sbc_study >> "$STATUS" 2>&1 || true
    if [ $rc -eq 0 ]; then log "[6 sbc-nuts] ARM COMPLETE"; SBC_DONE=1; break; fi
    if [ $rc -ne 124 ]; then
        log "[6 sbc-nuts] tail: $(tail -3 sbc_study/nuts_warm.log | tr '\n' ' | ')"
    fi
done

# -- [7] AM thin-60 arm only if the SBC arm finished with room to spare ----
if [ "$SBC_DONE" -eq 1 ] && [ "$(left)" -gt 9400 ]; then
    run_phase "[7] SBC AM thin-60 arm" 9000 sbc_study/am_thin60.log \
        python scripts/run_sbc_study.py --sampler am \
            --am-samples 4800 --am-burn 600 --am-thin 60 --obs-sweeps 8 \
            --outdir sbc_study/thin60 \
        || { python scripts/summarize_sbc_ckpt.py \
                 sbc_study/thin60/sbc_am.ckpt.npz am sbc_study/thin60 \
                 >> "$STATUS" 2>&1 || true; log "[7] partial recorded"; }
else
    log "[7] SKIPPED — SBC completion and spare time take precedence"
fi

log "chain6 done ($(left) s before deadline)"
