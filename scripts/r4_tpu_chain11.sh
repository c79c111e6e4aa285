#!/bin/bash
# Round-4 TPU chain, phase 11 — takes over after chain9's [A] failed:
# all 3 attempts crashed the tunnel worker in the FIRST warmup program
# (UNAVAILABLE device error right after the MAP completed).  Cause: at
# carnreal/carnarvon scale (401^2 x 30 days, ~0.5 s/leapfrog-eval) a
# warmup program of steps_per_call=3 x 2 chains x depth-7 trees (<=128
# evals) can run ~6 minutes — over the hosted tunnel's single-execution
# limit (chain6 observed the same class of crash at ~3 min).  Kalbar
# 801^2 survived because its per-eval cost is ~10x lower.
#
# Fix here: Carnarvon-scale NUTS runs use --max-depth 6 and
# --steps-per-call 1 (worst program ~2 min, typical ~20 s).  Order is
# VERDICT priority with guaranteed-completable work before open-ended
# work: [A2] real-Carnarvon refit (item 3) -> [B] SBC completion
# (item 4) -> [M] obs-model comparison (item 6, cheap + completable) ->
# [C2] synthetic Carnarvon (item 5) with whatever time remains
# (checkpointed; a partial is salvageable via salvage_nuts_ckpt).
set -u
cd "$(dirname "$0")/.."

export PARA_GIT_COMMIT=1

STATUS=chain11_status.log
DEADLINE=${CHAIN11_DEADLINE_S:-$(( $(date +%s) + 28800 ))}

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
    until tpu_ok; do log "TPU unavailable; waiting..."; sleep 120; done
}

run_phase() {
    local label=$1 tmo=$2 plog=$3; shift 3
    mkdir -p "$(dirname "$plog")"
    if [ "$(left)" -lt 300 ]; then log "$label SKIPPED (deadline)"; return 2; fi
    [ "$tmo" -gt "$(left)" ] && tmo=$(left)
    wait_for_tpu
    log "$label START (timeout ${tmo}s)"
    timeout "$tmo" "$@" >> "$plog" 2>&1
    local rc=$?
    log "$label exit: $rc"
    [ $rc -ne 0 ] && log "$label tail: $(tail -3 "$plog" | tr '\n' ' | ')"
    return $rc
}

nuts_run() {
    local tag=$1 db=$2 plog=$3 tmo=$4; shift 4
    if [ -f "$db.npz" ]; then return 0; fi
    for attempt in 1 2 3; do
        if [ ! -f "$db.ckpt.npz" ] && [ ! -f "$db.ckpt_durable.npz" ]; then
            run_phase "$tag (new $attempt)" "$tmo" "$plog" \
                python -m parasitoids_tpu.bayes.run "$@" && return 0
        else
            run_phase "$tag (resume $attempt)" "$tmo" "$plog" \
                python -m parasitoids_tpu.bayes.run --resume "$db" 0 \
                    --sampler nuts --steps-per-call 1 \
                    "${RESUME_OVERRIDES[@]}" \
                && return 0
        fi
    done
    [ -f "$db.npz" ]
}

: > "$STATUS"
log "chain11 start; deadline in $(left) s"

# -- [A2] REAL-Carnarvon refit, tunnel-safe NUTS sizing (item 3) -----------
RESUME_OVERRIDES=(dataset=carnreal 'domain_info=(10000.0,200)')
if nuts_run "[A2] real-carnarvon ridge NUTS" carn_study/real/nuts_r4 \
        carn_study/real/nuts_r4.log 10800 \
        --new 500 150 carn_study/real/nuts_r4 --sampler nuts --chains 2 \
        --mass ridge --init-map-steps 300 --steps-per-call 1 \
        --max-depth 6 --checkpoint-every 25 \
        dataset=carnreal 'domain_info=(10000.0,200)'; then
    run_phase "[A2b] real-carnarvon diagnostics+PPC" 2700 \
        carn_study/real/analyze_r4.log \
        python scripts/analyze_real_fit.py carn_study/real/nuts_r4.npz \
        || log "[A2b] FAILED"
    run_phase "[A2c] convergence summary" 600 \
        carn_study/real/analyze_r4.log \
        python scripts/analyze_nuts_run.py carn_study/real/nuts_r4.npz \
            --targets 100,1.05,0 || log "[A2c] FAILED"
    commit_artifacts "Record the repaired-metric real-Carnarvon refit" \
        carn_study/real || log "[A2] commit failed"
else
    log "[A2] FAILED — see carn_study/real/nuts_r4.log"
fi

# -- [B] SBC NUTS warm arm to 100 replicates (item 4) ----------------------
while [ "$(left)" -gt 7800 ]; do
    wait_for_tpu
    log "[B sbc-nuts] slice START ($(left) s left)"
    slice=$(( $(left) - 7500 )); [ "$slice" -gt 3600 ] && slice=3600
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
        commit_artifacts "SBC NUTS warm arm complete: 100 replicates, ranks + summary" \
            sbc_study || log "[B] final commit failed"
        break
    fi
    if [ $rc -ne 124 ]; then
        log "[B sbc-nuts] tail: $(tail -3 sbc_study/nuts_warm_arm.log | tr '\n' ' | ')"
    fi
done

# -- [M] observation-model comparison (item 6; cheap, completable) ---------
for om in negbin zip; do
    db=runs/kalbar_am_${om}
    if [ ! -f "$db.npz" ]; then
        run_phase "[M1] AM $om" 3000 "$db.log" \
            python -m parasitoids_tpu.bayes.run --new 10000 1000 "$db" \
                --obs-sweeps 8 --checkpoint-every 2500 \
                obs_model=$om 'domain_info=(10000.0,400)' \
            || log "[M1] $om FAILED"
    fi
    commit_artifacts "Record the Kalbar AM fit under obs_model=$om" \
        "$db.npz" "$db.meta.json" "$db.log"
done
for om in negbin zip; do
    db=runs/kalbar_am_${om}
    [ -f "$db.npz" ] || continue
    run_phase "[M2] LOO poisson-vs-$om" 2400 runs/loo_${om}.log \
        python -m parasitoids_tpu.bayes.loo runs/northstar_am.npz \
            --draws 400 --compare "$db.npz" 'domain_info=(10000.0,400)' \
        || log "[M2] $om FAILED"
done
commit_artifacts "Record the observation-model LOO comparison (poisson vs negbin/zip)" \
    runs/northstar_am_loo.json runs/northstar_am_loo.png \
    runs/loo_negbin.log runs/loo_zip.log
for om in negbin zip; do
    db=runs/kalbar_am_${om}
    [ -f "$db.npz" ] || continue
    if [ ! -f "${db}_ppc100.json" ]; then
        run_phase "[M3] PPC $om" 2400 "${db}_ppc.log" \
            python -m parasitoids_tpu.bayes.predictive "$db.npz" \
                --draws 100 --json obs_model=$om \
                'domain_info=(10000.0,400)' \
            || log "[M3] $om FAILED"
    fi
    commit_artifacts "Record the 100-draw PPC under obs_model=$om" \
        "${db}_ppc100.json" "${db}_predictive.png" "${db}_ppc.log"
done

# -- [C2] synthetic-truth Carnarvon, tunnel-safe sizing (item 5) -----------
# whatever time remains; checkpoint/durable-twin means a partial is
# resumable next round and salvageable now
RESUME_OVERRIDES=(dataset=carnarvon 'domain_info=(10000.0,200)')
if nuts_run "[C2] synthetic-carnarvon ridge NUTS" carn_study/nuts_r4 \
        carn_study/nuts_r4.log 10800 \
        --new 600 150 carn_study/nuts_r4 --sampler nuts --chains 2 \
        --mass ridge --init-map-steps 300 --steps-per-call 1 \
        --max-depth 6 --checkpoint-every 25 \
        dataset=carnarvon 'domain_info=(10000.0,200)'; then
    run_phase "[C2b] truth diagnostics" 900 carn_study/analyze_r4.log \
        python scripts/analyze_carn_trace.py carn_study/nuts_r4.npz \
            nuts_r4 || log "[C2b] FAILED"
    if [ ! -f carn_study/nuts_r4_ppc100.json ]; then
        run_phase "[C2c] PPC carnarvon nuts_r4" 2400 \
            carn_study/nuts_r4_ppc.log \
            python -m parasitoids_tpu.bayes.predictive \
                carn_study/nuts_r4.npz --draws 100 --json \
                dataset=carnarvon 'domain_info=(10000.0,200)' \
            || log "[C2c] FAILED"
    fi
    commit_artifacts "Record the synthetic-Carnarvon ridge-NUTS fit" \
        carn_study/nuts_r4.npz carn_study/nuts_r4.whiten.npz \
        carn_study/nuts_r4.meta.json carn_study/nuts_r4.log \
        carn_study/nuts_r4_summary.json carn_study/summary.json \
        carn_study/nuts_r4_ppc100.json carn_study/nuts_r4_predictive.png \
        || log "[C2] commit failed"
else
    # salvage whatever draws the checkpoint holds (durable twin restores
    # the transient if a recycle ate it)
    if [ -f carn_study/nuts_r4.ckpt_durable.npz ] && \
       [ ! -f carn_study/nuts_r4.ckpt.npz ]; then
        cp carn_study/nuts_r4.ckpt_durable.npz carn_study/nuts_r4.ckpt.npz
    fi
    run_phase "[C2s] salvage partial draws" 900 carn_study/nuts_r4.log \
        python scripts/salvage_nuts_ckpt.py carn_study/nuts_r4 \
            dataset=carnarvon 'domain_info=(10000.0,200)' \
        && commit_artifacts "Salvage the partial synthetic-Carnarvon ridge draws" \
            carn_study/nuts_r4.npz carn_study/nuts_r4.whiten.npz \
            carn_study/nuts_r4.log \
        || log "[C2s] nothing to salvage"
fi

log "chain11 done ($(left) s before deadline)"
