#!/bin/bash
# Round-4 TPU chain, phase 9 — the evidence round (VERDICT r3: close the
# loops, don't add components).  Phases, in VERDICT priority order:
#  [0] 801^2 Kalbar NUTS with the NEW ridge-aligned reparameterization
#      (--mass ridge: whitened Laplace eigenbasis + dense Welford
#      adaptation) — item 2's done-criterion run (min ESS >= 100,
#      R-hat <= 1.01, ESS/hr >= 3x round-2's 303).
#  [A] REAL-Carnarvon refit under the repaired metric (blend_prior_metric;
#      item 3: em_obs_prob/grid_obs_prob must actually move).
#  [V] one local bench capture with the new budgeted bench.py (item 1
#      insurance: the driver's end-of-round run is the record, this one
#      proves it emits within budget on the real chip).
#  [B] SBC warm-NUTS arm: finish 50 -> 100 replicates (item 4; resumes the
#      committed durable partial; library-level per-replicate commits).
#  [C] synthetic-truth Carnarvon NUTS (item 5, two rounds deferred).
# Library-level durability (PARA_GIT_COMMIT=1): every checkpoint/trace
# commits as it lands (bayes/run.py, bayes/sbc.py via utils/durable.py);
# the shell-level commit_artifacts below only covers analysis sidecars.
set -u
cd "$(dirname "$0")/.."

export PARA_GIT_COMMIT=1

STATUS=chain9_status.log
DEADLINE=${CHAIN9_DEADLINE_S:-$(( $(date +%s) + 33000 ))}

log() { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

git_safe() { flock -w 60 /tmp/para_git.lock git "$@"; }

commit_artifacts() {  # $1 = message; remaining args = paths (missing ok)
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
# new run, then checkpoint resumes (with --sampler nuts) until done; the
# durable-twin checkpoint makes even a VM recycle resumable
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
                    --sampler nuts --steps-per-call 3 \
                    "${RESUME_OVERRIDES[@]}" \
                && return 0
        fi
    done
    [ -f "$db.npz" ]
}

: > "$STATUS"
log "chain9 start; deadline in $(left) s"

# -- [0] 801^2 Kalbar ridge NUTS (VERDICT item 2) --------------------------
RESUME_OVERRIDES=('domain_info=(10000.0,400)')
if nuts_run "[0] 801^2 ridge NUTS" runs/nuts_r4 runs/nuts_r4.log 10800 \
        --new 1000 150 runs/nuts_r4 --sampler nuts --chains 2 \
        --mass ridge --init-map-steps 300 --steps-per-call 3 \
        --max-depth 7 --checkpoint-every 25 \
        'domain_info=(10000.0,400)'; then
    log "[0] recorded at runs/nuts_r4.npz"
    commit_artifacts "Record the 801^2 ridge-NUTS run artifacts" \
        runs/nuts_r4.npz runs/nuts_r4.whiten.npz runs/nuts_r4.log \
        runs/nuts_r4.meta.json
    if [ ! -f runs/nuts_r4_ppc100.json ]; then
        run_phase "[0b] PPC nuts_r4" 2400 runs/nuts_r4_ppc.log \
            python -m parasitoids_tpu.bayes.predictive runs/nuts_r4.npz \
                --draws 100 --json 'domain_info=(10000.0,400)' \
            && commit_artifacts "Record the 100-draw PPC for nuts_r4" \
                runs/nuts_r4_ppc100.json runs/nuts_r4_predictive.png \
            || log "[0b] FAILED"
    fi
else
    log "[0] FAILED — see runs/nuts_r4.log"
fi

# -- [A] REAL-Carnarvon refit under the repaired metric (item 3) -----------
RESUME_OVERRIDES=(dataset=carnreal 'domain_info=(10000.0,200)')
if nuts_run "[A] real-carnarvon ridge NUTS" carn_study/real/nuts_r4 \
        carn_study/real/nuts_r4.log 9600 \
        --new 500 150 carn_study/real/nuts_r4 --sampler nuts --chains 2 \
        --mass ridge --init-map-steps 300 --steps-per-call 3 \
        --max-depth 7 --checkpoint-every 25 \
        dataset=carnreal 'domain_info=(10000.0,200)'; then
    run_phase "[Ab] real-carnarvon diagnostics+PPC" 2700 \
        carn_study/real/analyze_r4.log \
        python scripts/analyze_real_fit.py carn_study/real/nuts_r4.npz \
        || log "[Ab] FAILED"
    commit_artifacts "Record the repaired-metric real-Carnarvon refit" \
        carn_study/real || log "[A] commit failed"
else
    log "[A] FAILED — see carn_study/real/nuts_r4.log"
fi

# -- [V] bench validation capture (item 1 insurance) -----------------------
if [ "$(left)" -gt 2400 ]; then
    wait_for_tpu
    log "[V] bench START"
    timeout 2100 python bench.py > BENCH_local_r4.json 2> bench_r4.err
    log "[V] bench exit: $? ($(head -c 200 BENCH_local_r4.json))"
    commit_artifacts "Record a local round-4 bench capture" \
        BENCH_local_r4.json || log "[V] commit failed"
fi

# -- [B] SBC NUTS warm arm: 50 -> 100 replicates (item 4) ------------------
# invocation MUST match chain8's so the checkpoint config-signature
# (L = 64, warm, seed 0) resumes at replicate 50
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
        commit_artifacts "SBC NUTS warm arm complete: 100 replicates, ranks + summary" \
            sbc_study || log "[B] final commit failed"
        break
    fi
    if [ $rc -ne 124 ]; then
        log "[B sbc-nuts] tail: $(tail -3 sbc_study/nuts_warm_arm.log | tr '\n' ' | ')"
    fi
done

# -- [C] synthetic-truth Carnarvon ridge NUTS (item 5) ---------------------
RESUME_OVERRIDES=(dataset=carnarvon 'domain_info=(10000.0,200)')
if nuts_run "[C] synthetic-carnarvon ridge NUTS" carn_study/nuts_r4 \
        carn_study/nuts_r4.log 9600 \
        --new 600 150 carn_study/nuts_r4 --sampler nuts --chains 2 \
        --mass ridge --init-map-steps 300 --steps-per-call 3 \
        --max-depth 7 --checkpoint-every 25 \
        dataset=carnarvon 'domain_info=(10000.0,200)'; then
    if [ ! -f carn_study/nuts_r4_ppc100.json ]; then
        run_phase "[Cb] PPC carnarvon nuts_r4" 2400 \
            carn_study/nuts_r4_ppc.log \
            python -m parasitoids_tpu.bayes.predictive \
                carn_study/nuts_r4.npz --draws 100 --json \
                dataset=carnarvon 'domain_info=(10000.0,200)' \
            || log "[Cb] FAILED"
    fi
    commit_artifacts "Record the synthetic-Carnarvon ridge-NUTS fit" \
        carn_study/nuts_r4.npz carn_study/nuts_r4.whiten.npz \
        carn_study/nuts_r4.meta.json carn_study/nuts_r4.log \
        carn_study/nuts_r4_ppc100.json carn_study/nuts_r4_predictive.png \
        || log "[C] commit failed"
else
    log "[C] FAILED — see carn_study/nuts_r4.log"
fi

log "chain9 done ($(left) s before deadline)"
