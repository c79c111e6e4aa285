#!/bin/bash
# Round-5 TPU chain, phase 18 (v2) — after chain17 releases the chip,
# in strict priority order against the session's remaining wall-clock:
#   [P]  finish pair B of the negbin flagship if chain17's deadline cut
#        it (resume to 1000 draws), then the combined verdict + PPC +
#        shift table + n-marginal analyses that depend on both pairs
#   [N4] real-Carnarvon negbin AM + paired LOO (item 2's last criterion)
#   [E]  evidence-estimator cross-check (item 6): PT TI/SS, SMC logZ
#        (2 seeds), VI ELBO/IS at 401^2 Kalbar + the agreement table
#   [S]  SBC ridge arm (item 3) with ALL remaining time — durable
#        per-replicate commits; on deadline, an honest partial-ranks
#        analysis is produced from whatever completed
set -u
cd "$(dirname "$0")/.."

export PARA_GIT_COMMIT=1

STATUS=chain18_status.log
DEADLINE=${CHAIN18_DEADLINE_S:-$(( $(date +%s) + 19000 ))}

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
log "chain18v2 start; deadline in $(left) s"

# -- [W] wait for chain17 to release the chip ------------------------------
# liveness = an actual chain17 (or its sampler) process existing; the
# status-log age is NOT a liveness signal (phases run silently for up to
# 2 h — the v1 stale guard fired against a healthy run).  /proc cmdline
# scan is read-only (never used to kill anything).
chain17_alive() {
    local p
    for p in /proc/[0-9]*/cmdline; do
        tr '\0' ' ' < "$p" 2>/dev/null | grep -q "r5_tpu_chain17\|nuts_r5_negbin" && return 0
    done
    return 1
}
while [ "$(left)" -gt 600 ]; do
    grep -q "chain17 done" chain17_status.log 2>/dev/null && break
    chain17_alive || { log "[W] no chain17 process; proceeding"; break; }
    sleep 120
done
log "[W] chip handover"

DB=runs/nuts_r5_negbin
DBB=runs/nuts_r5_negbinb
OV=(obs_model=negbin 'domain_info=(10000.0,400)')

# -- [P] finish pair B if the chain17 deadline cut it ----------------------
if [ ! -f "$DBB.npz" ] && { [ -f "$DBB.ckpt.npz" ] || [ -f "$DBB.ckpt_durable.npz" ]; }; then
    for attempt in 1 2 3; do
        [ -f "$DBB.npz" ] && break
        [ -f "$DBB.ckpt.npz" ] || cp "$DBB.ckpt_durable.npz" "$DBB.ckpt.npz"
        run_phase "[P] pair-B finish ($attempt)" 3600 "$DBB.log" \
            python -m parasitoids_tpu.bayes.run --resume "$DBB" 0 \
                --sampler nuts --steps-per-call 3 "${OV[@]}"
    done
    if [ ! -f "$DBB.npz" ]; then
        run_phase "[P] pair-B salvage" 1200 "$DBB.log" \
            python scripts/salvage_nuts_ckpt.py "$DBB" "${OV[@]}" \
            || log "[P] nothing to salvage"
    fi
    commit_artifacts "Finish the seed-1 negbin gibbs-n ridge pair" \
        "$DBB.npz" "$DBB.whiten.npz" "$DBB.log" chain18_status.log
fi

# -- [Pa] combined verdict + downstream analyses (idempotent) --------------
if [ -f "$DB.npz" ] && [ -f "$DBB.npz" ]; then
    if [ ! -f runs/nuts_r5_combined_summary.json ]; then
        run_phase "[Pa] combined 4-chain analysis" 900 runs/nuts_r5_analyze.log \
            env JAX_PLATFORMS=cpu python scripts/combine_nuts_runs.py \
                "$DB.npz" "$DBB.npz" --targets 300,1.01 \
                -o runs/nuts_r5_combined_summary.json || log "[Pa] FAILED"
    fi
    if [ ! -f runs/negbin_shift_table.json ]; then
        run_phase "[Pb] shift table" 600 runs/nuts_r5_analyze.log \
            env JAX_PLATFORMS=cpu python scripts/make_negbin_shift_table.py \
                "$DB.npz" "$DBB.npz" || log "[Pb] FAILED"
    fi
    if [ ! -f runs/n_periods_marginal.json ]; then
        run_phase "[Pc] n marginal" 600 runs/nuts_r5_analyze.log \
            env JAX_PLATFORMS=cpu python scripts/analyze_n_marginal.py \
                "$DB.npz" || log "[Pc] FAILED"
    fi
    commit_artifacts "Record the negbin flagship combined verdict + shift table + free-n marginal" \
        runs/nuts_r5_combined_summary.json runs/negbin_shift_table.json \
        runs/n_periods_marginal.json runs/n_periods_marginal.png \
        runs/nuts_r5_analyze.log chain18_status.log
fi
if [ -f "$DB.npz" ] && [ ! -f "${DB}_ppc100.json" ] && [ "$(left)" -gt 1200 ]; then
    run_phase "[Pd] PPC negbin flagship" 2400 "${DB}_ppc.log" \
        python -m parasitoids_tpu.bayes.predictive "$DB.npz" \
            --draws 100 --json "${OV[@]}" || log "[Pd] FAILED"
    commit_artifacts "Record the 100-draw PPC for the negbin flagship" \
        "${DB}_ppc100.json" "${DB}_predictive.png" "${DB}_ppc.log" \
        chain18_status.log
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
        "$CR.npz" "$CR.meta.json" "$CR.log" chain18_status.log
    if [ -f "$CR.npz" ] && [ "$(left)" -gt 900 ]; then
        run_phase "[N4b] LOO carnreal poisson-vs-negbin" 2400 \
            carn_study/real/loo_negbin.log \
            python -m parasitoids_tpu.bayes.loo carn_study/real/nuts_r4.npz \
                --draws 400 --compare "$CR.npz" \
                dataset=carnreal 'domain_info=(10000.0,200)' \
            || log "[N4b] FAILED"
        commit_artifacts "Record the real-Carnarvon obs-model LOO comparison" \
            carn_study/real/nuts_r4_loo.json carn_study/real/nuts_r4_loo.png \
            carn_study/real/loo_negbin.log chain18_status.log
    fi
fi

# -- [E] evidence cross-check at the Kalbar MAP domain ---------------------
EOV=('domain_info=(10000.0,200)')

if [ ! -f runs/pt_ev.npz ] && [ "$(left)" -gt 1500 ]; then
    run_phase "[E1] PT evidence run" 2400 runs/pt_ev.log \
        python -m parasitoids_tpu.bayes.run --sampler pt \
            --new 4000 1000 runs/pt_ev --temps 8 --swap-every 10 \
            --checkpoint-every 1000 "${EOV[@]}" || log "[E1] FAILED"
    commit_artifacts "Record the PT evidence run (401^2 Kalbar)" \
        runs/pt_ev.npz runs/pt_ev.meta.json runs/pt_ev.log chain18_status.log
fi

smc_ev_run() {
    local db=$1 seed=$2 label=$3
    local beta
    beta=$(python - "$db" <<'PY' 2>/dev/null
import json, sys
try:
    print(json.load(open(sys.argv[1] + '.meta.json')).get('beta', 0.0))
except Exception:
    print(0.0)
PY
)
    python -c "import sys; sys.exit(0 if float('${beta:-0}') >= 1.0 else 1)" && return 0
    if [ ! -f "$db.npz" ]; then
        run_phase "$label (new)" 1800 "$db.log" \
            python -m parasitoids_tpu.bayes.run --sampler smc \
                --new 256 0 "$db" --particles 256 --moves 2 \
                --min-accepts 2.0 --max-move-rounds 8 --max-stages 80 \
                --seed "$seed" "${EOV[@]}"
    else
        run_phase "$label (resume)" 1800 "$db.log" \
            python -m parasitoids_tpu.bayes.run --sampler smc \
                --resume "$db" 0 --max-stages 80 "${EOV[@]}"
    fi
}

for round in 1 2; do
    [ "$(left)" -gt 1200 ] || break
    smc_ev_run runs/smc_ev 0 "[E2] SMC evidence seed0 (r$round)"
done
commit_artifacts "Record the SMC evidence run (401^2 Kalbar, seed 0)" \
    runs/smc_ev.npz runs/smc_ev.meta.json runs/smc_ev.log chain18_status.log
for round in 1 2; do
    [ "$(left)" -gt 1200 ] || break
    smc_ev_run runs/smc_ev_b 7 "[E2b] SMC evidence seed7 (r$round)"
done
commit_artifacts "Record the SMC evidence twin (seed 7)" \
    runs/smc_ev_b.npz runs/smc_ev_b.meta.json runs/smc_ev_b.log \
    chain18_status.log

if [ ! -f runs/vi_ev.npz ] && [ "$(left)" -gt 1200 ]; then
    run_phase "[E3] VI evidence run" 1800 runs/vi_ev.log \
        python -m parasitoids_tpu.bayes.run --sampler vi \
            --new 400 2000 runs/vi_ev --vi-fullrank --vi-is 512 \
            "${EOV[@]}" || log "[E3] FAILED"
    commit_artifacts "Record the VI evidence run (401^2 Kalbar)" \
        runs/vi_ev.npz runs/vi_ev.meta.json runs/vi_ev.log chain18_status.log
fi

if [ -f runs/pt_ev.npz ] || [ -f runs/smc_ev.npz ]; then
    run_phase "[E4] evidence table" 600 runs/evidence_table.log \
        env JAX_PLATFORMS=cpu python scripts/make_evidence_table.py \
        || log "[E4] FAILED"
    commit_artifacts "Record the four-estimator evidence cross-check table" \
        runs/evidence_table.json runs/evidence_table.log chain18_status.log
fi

# -- [S] SBC ridge arm with all remaining time -----------------------------
ridge_done() {
    python - <<'PY' 2>/dev/null
import json
try:
    s = json.load(open('sbc_study/summary.json'))
    print(1 if 'nuts_ridge' in s.get('samplers', {}) else 0)
except Exception:
    print(0)
PY
}
while [ "$(left)" -gt 900 ]; do
    [ "$(ridge_done)" = "1" ] && { log "[S] arm complete"; break; }
    run_phase "[S] SBC ridge arm" 3000 sbc_study/sbc_ridge.log \
        python scripts/run_sbc_study.py --replicates 50 --sampler nuts \
            --ridge --nuts-samples 192 --steps-per-call 25
    sleep 5
done
commit_artifacts "Record SBC ridge-arm progress" \
    sbc_study/sbc_nuts_ridge_ranks.npz sbc_study/sbc_nuts_ridge.png \
    sbc_study/summary.json sbc_study/sbc_nuts_ridge_partial.npz \
    sbc_study/sbc_ridge.log chain18_status.log

if [ -f sbc_study/sbc_nuts_ridge_ranks.npz ]; then
    run_phase "[Sb] ridge-arm rank analysis" 600 sbc_study/sbc_ridge.log \
        env JAX_PLATFORMS=cpu python scripts/analyze_sbc_ranks.py \
            sbc_study/sbc_nuts_ridge_ranks.npz nuts_ridge50 \
        || log "[Sb] FAILED"
    commit_artifacts "Record the ridge-arm rank analysis" \
        sbc_study/rank_analysis_nuts_ridge50.json chain18_status.log
elif [ -f sbc_study/sbc_nuts_ridge_partial.npz ]; then
    # honest partial: truncate to completed replicates, then analyze
    run_phase "[Sb'] partial-ranks analysis" 600 sbc_study/sbc_ridge.log \
        env JAX_PLATFORMS=cpu python scripts/truncate_sbc_partial.py \
            sbc_study/sbc_nuts_ridge_partial.npz nuts_ridge_partial \
        || log "[Sb'] FAILED"
    commit_artifacts "Record the partial ridge-arm rank analysis" \
        sbc_study/sbc_nuts_ridge_ranks_partial.npz \
        sbc_study/rank_analysis_nuts_ridge_partial*.json chain18_status.log
fi

log "chain18 done ($(left) s before deadline)"
