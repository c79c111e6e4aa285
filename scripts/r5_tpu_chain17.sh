#!/bin/bash
# Round-5 TPU chain, phase 17 — the negbin flagship (VERDICT r4 items 2+5+7):
# promote the negative-binomial observation model (preferred at 3.6 SE,
# runs/northstar_am_loo.json) to the 801^2 Kalbar flagship posterior, with
# n_periods FREE via Gibbs-within-NUTS (the reference's own flagship samples
# it, Bayes_Run.py:130,186-196).
#
#   [N0] 4-chain ridge-NUTS, negbin + gibbs-n, 150 warmup + 1000 draws,
#        depth 7 — one run gives the 4-chain R-hat/ESS verdict directly
#        (r4 used 2x2 pairs; 4 chains under one lax.map halves the MAP/
#        compile overhead at identical per-draw cost)
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
OV=(obs_model=negbin 'domain_info=(10000.0,400)')

# -- [N0] 4-chain negbin gibbs-n ridge NUTS --------------------------------
if [ ! -f "$DB.npz" ]; then
    for attempt in 1 2 3 4 5; do
        [ -f "$DB.npz" ] && break
        if [ ! -f "$DB.ckpt.npz" ] && [ ! -f "$DB.ckpt_durable.npz" ]; then
            run_phase "[N0] negbin gibbs ridge NUTS (new $attempt)" 7200 \
                "$DB.log" \
                python -m parasitoids_tpu.bayes.run --new 1000 150 "$DB" \
                    --sampler nuts --chains 4 --mass ridge --gibbs-n \
                    --init-map-steps 300 --steps-per-call 3 --max-depth 7 \
                    --checkpoint-every 25 "${OV[@]}"
        else
            [ -f "$DB.ckpt.npz" ] || cp "$DB.ckpt_durable.npz" "$DB.ckpt.npz"
            run_phase "[N0] resume $attempt" 7200 "$DB.log" \
                python -m parasitoids_tpu.bayes.run --resume "$DB" 0 \
                    --sampler nuts --steps-per-call 3 "${OV[@]}"
        fi
    done
fi
if [ ! -f "$DB.npz" ]; then
    [ -f "$DB.ckpt.npz" ] || cp "$DB.ckpt_durable.npz" "$DB.ckpt.npz" 2>/dev/null
    run_phase "[N0s] salvage" 1200 "$DB.log" \
        python scripts/salvage_nuts_ckpt.py "$DB" "${OV[@]}" \
        || log "[N0s] nothing to salvage"
fi
commit_artifacts "Record the 801^2 Kalbar negbin gibbs-n ridge-NUTS flagship (4 chains)" \
    "$DB.npz" "$DB.whiten.npz" "$DB.log" chain17_status.log

# -- [N1] convergence analysis ---------------------------------------------
if [ -f "$DB.npz" ]; then
    run_phase "[N1] convergence analysis" 900 runs/nuts_r5_analyze.log \
        env JAX_PLATFORMS=cpu python scripts/analyze_nuts_run.py "$DB.npz" \
            --log "$DB.log" --targets 300,1.01,300 \
        && commit_artifacts "Record the negbin flagship convergence verdict" \
            "${DB}_summary.json" runs/nuts_r5_analyze.log chain17_status.log
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
            "$DB.npz" || log "[N3a] FAILED"
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
