#!/bin/bash
# Round-5 TPU chain, phase 17 — the negbin flagship (VERDICT r4 items 2+5+7):
# promote the negative-binomial observation model (preferred at 3.6 SE,
# runs/northstar_am_loo.json) to the 801^2 Kalbar flagship posterior, with
# n_periods FREE via Gibbs-within-NUTS (the reference's own flagship samples
# it, Bayes_Run.py:130,186-196).
#
#   [N0] two 2-chain ridge-NUTS pairs (seeds 0/1), negbin + gibbs-n,
#        150 warmup + 1000 draws, depth 7 each -> 4-chain combined verdict.
#        NOT one 4-chain process: a 4-chain x spc-3 x depth-7 warmup
#        program is ~2x the r4-proven per-program size and the tunnel
#        worker killed it twice ("TPU device error" at the first warmup
#        block, runs/nuts_r5_negbin.log) — the r4 lesson that per-program
#        execution limits bind holds at 4 chains.
#   [N1] convergence analysis vs the stricter r5 targets (ESS>=300,
#        R-hat<=1.01 on ALL params, min ESS/hr>=300)
#   [N2] 100-draw PPC (the release-max p=0.98 flag under negbin-AM)
#   [N3] CPU: posterior-shift table (Poisson vs negbin) + n_periods
#        marginal cross-check vs the AM discrete walk
#   [N4] real-Carnarvon negbin AM fit + paired PSIS-LOO (the comparison
#        r4 never ran on the second dataset)
#   [N5] (time permitting) depth-6 rate probe: the measured ESS/hr lever
set -u
cd "$(dirname "$0")/.."

export PARA_GIT_COMMIT=1

STATUS=chain17_status.log
DEADLINE=${CHAIN17_DEADLINE_S:-$(( $(date +%s) + 16200 ))}

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
    [ $rc -ne 0 ] && log "$label tail: $(tail -3 "$plog" | paste -sd'|' -)"
    return $rc
}

: > "$STATUS"
log "chain17 start; deadline in $(left) s"

DB=runs/nuts_r5_negbin
DBB=runs/nuts_r5_negbinb
OV=(obs_model=negbin 'domain_info=(10000.0,400)')

# -- [N0] two 2-chain negbin gibbs-n ridge NUTS pairs ----------------------
nuts_pair() {
    local db=$1 seed=$2 label=$3
    if [ ! -f "$db.npz" ]; then
        for attempt in 1 2 3 4; do
            [ -f "$db.npz" ] && break
            if [ ! -f "$db.ckpt.npz" ] && [ ! -f "$db.ckpt_durable.npz" ]; then
                run_phase "$label (new $attempt)" 7200 "$db.log" \
                    python -m parasitoids_tpu.bayes.run --new 1000 150 \
                        "$db" --sampler nuts --chains 2 --mass ridge \
                        --gibbs-n --seed "$seed" --init-map-steps 300 \
                        --steps-per-call 3 --max-depth 7 \
                        --checkpoint-every 25 "${OV[@]}"
            else
                [ -f "$db.ckpt.npz" ] || cp "$db.ckpt_durable.npz" "$db.ckpt.npz"
                run_phase "$label (resume $attempt)" 7200 "$db.log" \
                    python -m parasitoids_tpu.bayes.run --resume "$db" 0 \
                        --sampler nuts --steps-per-call 3 "${OV[@]}"
            fi
        done
    fi
    if [ ! -f "$db.npz" ]; then
        [ -f "$db.ckpt.npz" ] || cp "$db.ckpt_durable.npz" "$db.ckpt.npz" 2>/dev/null
        run_phase "$label salvage" 1200 "$db.log" \
            python scripts/salvage_nuts_ckpt.py "$db" "${OV[@]}" \
            || log "$label nothing to salvage"
    fi
    commit_artifacts "Record a negbin gibbs-n ridge-NUTS pair ($db)" \
        "$db.npz" "$db.whiten.npz" "$db.log" chain17_status.log
}

nuts_pair "$DB" 0 "[N0a] negbin pair seed0"
nuts_pair "$DBB" 1 "[N0b] negbin pair seed1"

# -- [N1] combined 4-chain convergence analysis ----------------------------
if [ -f "$DB.npz" ] && [ -f "$DBB.npz" ]; then
    run_phase "[N1] combined 4-chain analysis" 900 runs/nuts_r5_analyze.log \
        env JAX_PLATFORMS=cpu python scripts/combine_nuts_runs.py \
            "$DB.npz" "$DBB.npz" --targets 300,1.01 \
            -o runs/nuts_r5_combined_summary.json \
        && commit_artifacts "Record the negbin flagship 4-chain verdict" \
            runs/nuts_r5_combined_summary.json runs/nuts_r5_analyze.log \
            chain17_status.log
    # per-pair ESS/hr (item 7 evidence; rates come from the run logs)
    run_phase "[N1b] pair-A rate analysis" 600 runs/nuts_r5_analyze.log \
        env JAX_PLATFORMS=cpu python scripts/analyze_nuts_run.py "$DB.npz" \
            --log "$DB.log" --targets 100,1.05,300 || log "[N1b] FAILED"
    commit_artifacts "Record the negbin pair-A rate summary" \
        "${DB}_summary.json" chain17_status.log
fi

# -- [N2] 100-draw PPC ------------------------------------------------------
if [ -f "$DB.npz" ] && [ "$(left)" -gt 900 ]; then
    run_phase "[N2] PPC negbin flagship" 2400 "${DB}_ppc.log" \
        python -m parasitoids_tpu.bayes.predictive "$DB.npz" \
            --draws 100 --json "${OV[@]}" || log "[N2] FAILED"
    commit_artifacts "Record the 100-draw PPC for the negbin flagship" \
        "${DB}_ppc100.json" "${DB}_predictive.png" "${DB}_ppc.log" \
        chain17_status.log
fi

# -- [N3] CPU analyses: shift table + n marginal ---------------------------
if [ -f "$DB.npz" ]; then
    run_phase "[N3a] posterior-shift table" 600 runs/nuts_r5_analyze.log \
        env JAX_PLATFORMS=cpu python scripts/make_negbin_shift_table.py \
            "$DB.npz" "$DBB.npz" || log "[N3a] FAILED"
    run_phase "[N3b] n_periods marginal" 600 runs/nuts_r5_analyze.log \
        env JAX_PLATFORMS=cpu python scripts/analyze_n_marginal.py \
            "$DB.npz" || log "[N3b] FAILED"
    commit_artifacts "Record the Poisson-vs-negbin shift table and the free-n marginal cross-check" \
        runs/negbin_shift_table.json runs/n_periods_marginal.json \
        runs/n_periods_marginal.png runs/nuts_r5_analyze.log \
        chain17_status.log
fi

# -- [N4] real-Carnarvon negbin AM + paired LOO ----------------------------
CR=carn_study/real/am_negbin
CROV=(obs_model=negbin dataset=carnreal 'domain_info=(10000.0,200)')
if [ "$(left)" -gt 1500 ]; then
    for attempt in 1 2; do
        have=$(python - "$CR" <<'PY' 2>/dev/null
import json, sys
try:
    print(json.load(open(sys.argv[1] + '.meta.json')).get('n_samples', 0))
except Exception:
    print(0)
PY
)
        [ "${have:-0}" -ge 9000 ] && break
        if [ ! -f "$CR.npz" ]; then
            run_phase "[N4] carnreal AM negbin (new $attempt)" 2400 "$CR.log" \
                python -m parasitoids_tpu.bayes.run --new 10000 1000 "$CR" \
                    --obs-sweeps 8 --checkpoint-every 400 "${CROV[@]}" \
                || log "[N4] attempt $attempt failed"
        else
            run_phase "[N4] carnreal AM negbin (top-up $attempt)" 2400 "$CR.log" \
                python -m parasitoids_tpu.bayes.run --resume "$CR" \
                    $(( 10000 - have )) --checkpoint-every 400 "${CROV[@]}" \
                || log "[N4] top-up $attempt failed"
        fi
    done
    commit_artifacts "Record the real-Carnarvon AM fit under obs_model=negbin" \
        "$CR.npz" "$CR.meta.json" "$CR.log" chain17_status.log
    if [ -f "$CR.npz" ] && [ "$(left)" -gt 900 ]; then
        run_phase "[N4b] LOO carnreal poisson-vs-negbin" 2400 \
            carn_study/real/loo_negbin.log \
            python -m parasitoids_tpu.bayes.loo carn_study/real/nuts_r4.npz \
                --draws 400 --compare "$CR.npz" \
                dataset=carnreal 'domain_info=(10000.0,200)' \
            || log "[N4b] FAILED"
        commit_artifacts "Record the real-Carnarvon obs-model LOO comparison" \
            carn_study/real/nuts_r4_loo.json carn_study/real/nuts_r4_loo.png \
            carn_study/real/loo_negbin.log chain17_status.log
    fi
fi

# -- [N5] depth-6 rate probe (ESS/hr lever) --------------------------------
D6=runs/nuts_r5_negbin_d6
if [ "$(left)" -gt 2400 ] && [ ! -f "$D6.npz" ]; then
    run_phase "[N5] depth-6 probe" 3600 "$D6.log" \
        python -m parasitoids_tpu.bayes.run --new 400 100 "$D6" \
            --sampler nuts --chains 2 --mass ridge --gibbs-n --seed 2 \
            --init-map-steps 300 --steps-per-call 3 --max-depth 6 \
            --checkpoint-every 25 "${OV[@]}" || log "[N5] FAILED"
    if [ -f "$D6.npz" ]; then
        run_phase "[N5b] probe analysis" 600 runs/nuts_r5_analyze.log \
            env JAX_PLATFORMS=cpu python scripts/analyze_nuts_run.py \
                "$D6.npz" --log "$D6.log" --targets 100,1.05,300 \
            || log "[N5b] FAILED"
    fi
    commit_artifacts "Record the depth-6 ESS/hr probe (negbin gibbs ridge)" \
        "$D6.npz" "$D6.whiten.npz" "$D6.log" "${D6}_summary.json" \
        chain17_status.log
fi

log "chain17 done ($(left) s before deadline)"
