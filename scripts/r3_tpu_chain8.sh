#!/bin/bash
# Round-3 TPU chain, phase 8 — takes over from chain7 after its phase [0]
# (801^2 warm NUTS) lands.  Reordering rationale: chain7 ran the SBC NUTS
# arm LAST, after three bounded-but-long fit phases; at the measured
# ~2.5-3 min/replicate the arm (VERDICT r2 item 1a, the round's top_next)
# would get almost no budget.  chain8 runs the bounded real-Carnarvon fit
# (item 6) first, then gives every remaining TPU hour to SBC slices, each
# slice committing the durable partial (bayes/sbc.py _partial twin) so a
# VM recycle can no longer erase replicates.  The synthetic-truth
# Carnarvon warm NUTS (item 2) is explicitly deferred to round 4.
set -u
cd "$(dirname "$0")/.."

STATUS=chain8_status.log
DEADLINE=${CHAIN8_DEADLINE_S:-$(( $(date +%s) + 14400 ))}

log() { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

git_safe() {  # serialize with the interactive session's git usage
    flock -w 60 /tmp/para_git.lock git "$@"
}

commit_artifacts() {  # $1 = message; remaining args = paths (missing ok)
    local msg=$1 p; shift
    for p in "$@"; do
        [ -e "$p" ] && git_safe add -- "$p" 2>> "$STATUS"
    done
    git_safe diff --cached --quiet && return 0   # nothing new
    git_safe commit -q -m "$msg" >> "$STATUS" 2>&1
}

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

nuts_run() {  # <tag> <db> <log> <tmo> <new-args...>; resumes keep config via RESUME_OVERRIDES
    local tag=$1 db=$2 plog=$3 tmo=$4; shift 4
    if [ -f "$db.npz" ]; then return 0; fi
    for attempt in 1 2 3; do
        if [ ! -f "$db.ckpt.npz" ]; then
            # a worker crash before the first checkpoint leaves nothing to
            # resume — retry the (new) run itself after TPU recovery
            run_phase "$tag (new $attempt)" "$tmo" "$plog" \
                python -m parasitoids_tpu.bayes.run "$@" && return 0
        else
            run_phase "$tag (resume $attempt)" "$tmo" "$plog" \
                python -m parasitoids_tpu.bayes.run --resume "$db" 0 \
                    --sampler nuts --steps-per-call 4 \
                    "${RESUME_OVERRIDES[@]}" \
                && return 0
        fi
    done
    [ -f "$db.npz" ]
}

: > "$STATUS"
log "chain8 start; deadline in $(left) s"

# -- [A] REAL carnarvon fit (VERDICT item 6; redo of chain7 [2]) -----------
RESUME_OVERRIDES=(dataset=carnreal 'domain_info=(10000.0,200)')
if nuts_run "[A] real-carnarvon NUTS" carn_study/real/nuts \
        carn_study/real/nuts.log 7000 \
        --new 400 80 carn_study/real/nuts --sampler nuts --chains 2 \
        --mass laplace --steps-per-call 4 --checkpoint-every 25 \
        dataset=carnreal 'domain_info=(10000.0,200)'; then
    run_phase "[Ab] real-carnarvon diagnostics+PPC" 2400 \
        carn_study/real/analyze.log \
        python scripts/analyze_real_fit.py carn_study/real/nuts.npz \
        || log "[Ab] FAILED"
    commit_artifacts "Record the real-data Carnarvon NUTS fit" \
        carn_study/real || log "[A] commit failed"
else
    log "[A] FAILED — see carn_study/real/nuts.log"
fi

# -- [A2] 100-draw PPC for the committed north-star AM trace ---------------
# (VERDICT r2 item 7: PPC tables for Kalbar's recorded traces)
if [ ! -f runs/northstar_am_ppc100.json ]; then
    run_phase "[A2] PPC kalbar northstar AM" 1800 runs/northstar_ppc.log \
        python -m parasitoids_tpu.bayes.predictive runs/northstar_am.npz \
            --draws 100 --json 'domain_info=(10000.0,400)' \
        && { git_safe add -f runs/northstar_am_ppc100.json \
                runs/northstar_am_predictive.png 2>> "$STATUS";
             git_safe commit -q -m "Record the 100-draw PPC for the north-star AM trace" >> "$STATUS" 2>&1; } \
        || log "[A2] FAILED"
fi

# -- [A3] commit + PPC the 801^2 NUTS run if chain7 landed it but was ------
# stopped before its own [0b] phase ran
if [ -f runs/nuts_r3.npz ]; then
    for p in runs/nuts_r3.npz runs/nuts_r3.meta.json runs/nuts_r3.log; do
        [ -e "$p" ] && git_safe add -f "$p" 2>> "$STATUS"
    done
    git_safe diff --cached --quiet \
        || git_safe commit -q -m "Record the 801^2 Laplace-warm NUTS run" >> "$STATUS" 2>&1
    if [ ! -f runs/nuts_r3_ppc100.json ]; then
        run_phase "[A3] PPC kalbar nuts_r3" 2400 runs/nuts_r3_ppc.log \
            python -m parasitoids_tpu.bayes.predictive runs/nuts_r3.npz \
                --draws 100 --json 'domain_info=(10000.0,400)' \
            && { git_safe add -f runs/nuts_r3_ppc100.json \
                    runs/nuts_r3_predictive.png 2>> "$STATUS";
                 git_safe commit -q -m "Record the 100-draw PPC for the 801^2 NUTS run" >> "$STATUS" 2>&1; } \
            || log "[A3] FAILED"
    fi
fi

# -- [A4] 100-draw PPC tables for the recorded synthetic-Carnarvon traces --
# (chain6 ran these but the VM recycled before anything committed them)
for trace in carn_study/am carn_study/nuts; do
    if [ -f "$trace.npz" ] && [ ! -f "${trace}_ppc100.json" ]; then
        run_phase "[A4] PPC $trace" 1800 "${trace}_ppc.log" \
            python -m parasitoids_tpu.bayes.predictive "$trace.npz" \
                --draws 100 --json dataset=carnarvon \
                'domain_info=(10000.0,200)' \
            || log "[A4] $trace FAILED"
    fi
done
commit_artifacts "Record 100-draw PPC tables for the synthetic-Carnarvon traces" \
    carn_study/am_ppc100.json carn_study/nuts_ppc100.json \
    carn_study/am_predictive.png carn_study/nuts_predictive.png \
    carn_study/am_ppc.log carn_study/nuts_ppc.log \
    || log "[A4] commit failed"

# -- [B] SBC NUTS warm loop toward 100 replicates; durable commits ---------
while [ "$(left)" -gt 900 ]; do
    wait_for_tpu
    log "[B sbc-nuts] slice START ($(left) s left)"
    slice=$(( $(left) - 600 )); [ "$slice" -gt 3600 ] && slice=3600
    timeout "$slice" python scripts/run_sbc_study.py --sampler nuts \
        --warm-start --nuts-burn 32 --nuts-samples 128 --nuts-thin 2 \
        --max-depth 4 >> sbc_study/nuts_warm_arm.log 2>&1
    rc=$?
    log "[B sbc-nuts] slice exit: $rc"
    python scripts/summarize_sbc_ckpt.py sbc_study/sbc_nuts.ckpt.npz \
        nuts sbc_study >> "$STATUS" 2>&1 || true
    commit_artifacts "SBC NUTS arm: durable partial progress" \
        sbc_study/sbc_nuts_partial.npz sbc_study/summary.json \
        || log "[B] commit failed"
    if [ $rc -eq 0 ]; then
        log "[B sbc-nuts] ARM COMPLETE"
        commit_artifacts "SBC NUTS arm complete: ranks + summary" \
            sbc_study || log "[B] final commit failed"
        break
    fi
    if [ $rc -ne 124 ]; then
        log "[B sbc-nuts] tail: $(tail -3 sbc_study/nuts_warm_arm.log | tr '\n' ' | ')"
    fi
done

log "chain8 done ($(left) s before deadline)"
