#!/bin/bash
# Round-5 TPU chain, phase 20 — finish the threads chain19's deadline cut.
#
#   [L]  resume the n-step-6 mixing-lever probe from its durable draw-150
#        checkpoint (kept at the chain19 close-out exactly for this) to
#        the planned 2 chains x 300 draws; if cut again, salvage the
#        longer draw set over the 150-draw store
#   [L1] re-run the rate analysis at full length (ESS/draw, ESS/hr vs
#        the flagship +/-1 pair)
#   [S]  remaining time: SBC ridge arm replicates (26 -> toward 50),
#        durable per-replicate commits as in chain18/19
set -u
cd "$(dirname "$0")/.."

export PARA_GIT_COMMIT=1

STATUS=chain20_status.log
DEADLINE=${CHAIN20_DEADLINE_S:-$(( $(date +%s) + 3000 ))}

log() { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

git_safe() { flock -w 60 /tmp/para_git.lock git "$@"; }
commit_artifacts() {
    local msg=$1 p; shift
    for p in "$@"; do
        [ -e "$p" ] && git_safe add -f -- "$p" 2>> "$STATUS"
    done
    git_safe diff --cached --quiet && return 0
    git_safe commit -q -m "$msg" >> "$STATUS" 2>&1
}

tpu_ok() {
    timeout 240 python -c "import jax; assert any(d.platform == 'tpu' for d in jax.devices()); import jax.numpy as jnp; (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()" >/dev/null 2>&1
}
wait_for_tpu() {
    until tpu_ok; do log "TPU unavailable; waiting..."; sleep 60; done
}

run_phase() {
    local label=$1 tmo=$2 plog=$3; shift 3
    mkdir -p "$(dirname "$plog")"
    if [ "$(left)" -lt 240 ]; then log "$label SKIPPED (deadline)"; return 2; fi
    [ "$tmo" -gt "$(left)" ] && tmo=$(left)
    wait_for_tpu
    log "$label START (timeout ${tmo}s)"
    timeout "$tmo" "$@" >> "$plog" 2>&1
    local rc=$?
    log "$label exit: $rc"
    [ $rc -ne 0 ] && log "$label tail: $(tail -3 "$plog" | paste -sd'|' -)"
    return $rc
}

: > "$STATUS"
log "chain20 start; deadline in $(left) s"

DB=runs/nuts_r5_nstep6
OV=(obs_model=negbin 'domain_info=(10000.0,400)')

# -- [L] finish the n-step-6 probe ------------------------------------------
# Completion is signalled by the checkpoint pair being deleted (a
# completed run deletes both the transient and the durable twin); the
# 150-draw salvaged store at $DB.npz is superseded either way.
if [ -f "$DB.ckpt.npz" ] || [ -f "$DB.ckpt_durable.npz" ]; then
    for attempt in 1 2; do
        { [ -f "$DB.ckpt.npz" ] || [ -f "$DB.ckpt_durable.npz" ]; } || break
        [ -f "$DB.ckpt.npz" ] || cp "$DB.ckpt_durable.npz" "$DB.ckpt.npz"
        run_phase "[L] nstep6 finish (resume $attempt)" 2400 "$DB.log" \
            python -m parasitoids_tpu.bayes.run --resume "$DB" 0 \
                --sampler nuts --steps-per-call 3 "${OV[@]}"
        [ $? -eq 0 ] && break
    done
    if [ -f "$DB.ckpt.npz" ] && [ "$(left)" -gt 300 ]; then
        # cut again: salvage the longer draw set over the 150-draw store
        # (salvage refuses to clobber, so retire the old store first; the
        # committed copy in git protects against a failed salvage)
        rm -f "$DB.npz"
        run_phase "[L] salvage" 900 "$DB.log" \
            python scripts/salvage_nuts_ckpt.py "$DB" "${OV[@]}" \
            || { log "[L] salvage failed; restoring committed store"
                 git_safe checkout -- "$DB.npz"; }
    fi
    commit_artifacts "n-step-6 probe: resumed draws recorded" \
        "$DB.npz" "$DB.whiten.npz" "$DB.log" "$DB.ckpt_durable.npz" \
        chain20_status.log
fi

# -- [L1] rate analysis at full length --------------------------------------
if [ -f "$DB.npz" ]; then
    run_phase "[L1] probe analysis" 600 runs/nuts_r5_analyze.log \
        env JAX_PLATFORMS=cpu python scripts/analyze_nuts_run.py "$DB.npz" \
            --log "$DB.log" --targets 100,1.05,300 || log "[L1] FAILED"
    commit_artifacts "n-step-6 probe rate summary at full length" \
        "${DB}_summary.json" runs/nuts_r5_analyze.log chain20_status.log
fi

# -- [S] SBC ridge arm with the remaining time ------------------------------
# Same arm, same knobs as chain18/19 (replicates must be homogeneous);
# resumes from the per-replicate durable checkpoint.
while [ "$(left)" -gt 600 ]; do
    run_phase "[S] SBC ridge arm continue" $(( $(left) - 360 )) \
        sbc_study/sbc_ridge.log \
        python scripts/run_sbc_study.py --replicates 50 --sampler nuts \
            --ridge --nuts-samples 192 --steps-per-call 25
    rc=$?
    [ $rc -eq 0 ] && break
    sleep 5
done
if [ -f sbc_study/sbc_nuts_ridge_ranks.npz ]; then
    run_phase "[Sb] ridge-arm rank analysis" 600 sbc_study/sbc_ridge.log \
        env JAX_PLATFORMS=cpu python scripts/analyze_sbc_ranks.py \
            sbc_study/sbc_nuts_ridge_ranks.npz nuts_ridge50 \
        || log "[Sb] FAILED"
    commit_artifacts "Record the completed ridge-arm rank analysis" \
        sbc_study/sbc_nuts_ridge_ranks.npz sbc_study/sbc_nuts_ridge.png \
        sbc_study/summary.json \
        sbc_study/rank_analysis_nuts_ridge50.json chain20_status.log
elif [ -f sbc_study/sbc_nuts_ridge_partial.npz ]; then
    run_phase "[Sb'] partial-ranks analysis" 600 sbc_study/sbc_ridge.log \
        env JAX_PLATFORMS=cpu python scripts/truncate_sbc_partial.py \
            sbc_study/sbc_nuts_ridge_partial.npz nuts_ridge_partial \
        || log "[Sb'] FAILED"
    commit_artifacts "Record the extended partial ridge-arm rank analysis" \
        sbc_study/sbc_nuts_ridge_ranks_partial.npz \
        sbc_study/rank_analysis_nuts_ridge_partial*.json \
        sbc_study/sbc_ridge.log chain20_status.log
fi

log "chain20 done ($(left) s before deadline)"
