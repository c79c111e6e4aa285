#!/bin/bash
# Round-5 TPU chain, phase 19 — the n_periods mixing lever.
#
# The negbin free-n flagship's binding constraint is the discrete
# coordinate itself: n_periods ESS 58.2 / R-hat 1.116 with mu_r
# dragged along (runs/nuts_r5_combined_summary.json).  Its Gibbs move
# was a pure +/-1 Metropolis walk (--n-step 1) while the n posterior
# is nearly as wide as its Poisson(30) prior (sd ~5, weakly
# identified): the walk needs O(sd^2) ~ 25+ transitions per
# independent n excursion.  The lever, in the item-7 measured-lever
# tradition: widen the symmetric proposal to +/-U{1..6} — same ONE
# forward+grad eval per transition, ~u_bar^2-fold diffusion gain if
# acceptance holds.
#
#   [L]  2-chain ridge-NUTS probe at the FULL 801^2 negbin gibbs-n
#        flagship config, seed 3, --n-step 6, 100 warmup + 300 draws
#        (durable checkpoints; salvage on deadline)
#   [L1] rate analysis: n_periods/mu_r ESS + ESS/hr vs the flagship
#        pair's (which analyze_nuts_run.py reads from the same logs)
#   [S]  remaining time: SBC ridge arm replicates (26 -> toward 50),
#        durable per-replicate commits as in chain18
set -u
cd "$(dirname "$0")/.."

export PARA_GIT_COMMIT=1

STATUS=chain19_status.log
DEADLINE=${CHAIN19_DEADLINE_S:-$(( $(date +%s) + 2700 ))}

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
log "chain19 start; deadline in $(left) s"

DB=runs/nuts_r5_nstep6
OV=(obs_model=negbin 'domain_info=(10000.0,400)')

# -- [L] the n-step-6 probe pair -------------------------------------------
if [ ! -f "$DB.npz" ]; then
    for attempt in 1 2 3; do
        [ -f "$DB.npz" ] && break
        if [ ! -f "$DB.ckpt.npz" ] && [ ! -f "$DB.ckpt_durable.npz" ]; then
            run_phase "[L] nstep6 probe (new $attempt)" 2400 "$DB.log" \
                python -m parasitoids_tpu.bayes.run --new 300 100 \
                    "$DB" --sampler nuts --chains 2 --mass ridge \
                    --gibbs-n --n-step 6 --seed 3 --init-map-steps 300 \
                    --steps-per-call 3 --max-depth 7 \
                    --checkpoint-every 25 "${OV[@]}"
        else
            [ -f "$DB.ckpt.npz" ] || cp "$DB.ckpt_durable.npz" "$DB.ckpt.npz"
            run_phase "[L] nstep6 probe (resume $attempt)" 2400 "$DB.log" \
                python -m parasitoids_tpu.bayes.run --resume "$DB" 0 \
                    --sampler nuts --steps-per-call 3 "${OV[@]}"
        fi
    done
fi
if [ ! -f "$DB.npz" ]; then
    [ -f "$DB.ckpt.npz" ] || cp "$DB.ckpt_durable.npz" "$DB.ckpt.npz" 2>/dev/null
    run_phase "[L] salvage" 900 "$DB.log" \
        python scripts/salvage_nuts_ckpt.py "$DB" "${OV[@]}" \
        || log "[L] nothing to salvage"
fi
commit_artifacts "Record the n-step-6 mixing-lever probe pair" \
    "$DB.npz" "$DB.whiten.npz" "$DB.log" chain19_status.log

# -- [L1] rate analysis -----------------------------------------------------
if [ -f "$DB.npz" ]; then
    run_phase "[L1] probe analysis" 600 runs/nuts_r5_analyze.log \
        env JAX_PLATFORMS=cpu python scripts/analyze_nuts_run.py "$DB.npz" \
            --log "$DB.log" --targets 100,1.05,300 || log "[L1] FAILED"
    commit_artifacts "Record the n-step-6 probe rate summary" \
        "${DB}_summary.json" runs/nuts_r5_analyze.log chain19_status.log
fi

# -- [S] SBC ridge arm with the remaining time ------------------------------
# Same arm, same knobs as chain18 (replicates must be homogeneous);
# resumes from the per-replicate durable checkpoint at 26/50.
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
        sbc_study/rank_analysis_nuts_ridge50.json chain19_status.log
elif [ -f sbc_study/sbc_nuts_ridge_partial.npz ]; then
    run_phase "[Sb'] partial-ranks analysis" 600 sbc_study/sbc_ridge.log \
        env JAX_PLATFORMS=cpu python scripts/truncate_sbc_partial.py \
            sbc_study/sbc_nuts_ridge_partial.npz nuts_ridge_partial \
        || log "[Sb'] FAILED"
    commit_artifacts "Record the extended partial ridge-arm rank analysis" \
        sbc_study/sbc_nuts_ridge_ranks_partial.npz \
        sbc_study/rank_analysis_nuts_ridge_partial*.json \
        sbc_study/sbc_ridge.log chain19_status.log
fi

log "chain19 done ($(left) s before deadline)"
