#!/bin/bash
# Round-5 TPU chain, phase 18 — after chain17 releases the chip:
#   [S]  SBC ridge-whitened warm-NUTS arm, 50 replicates, L = 64
#        (VERDICT r4 item 3: the controlled experiment for the warm arm's
#        5/25 chi^2 flags — per-replicate ridge whitening with Welford
#        adaptation ON instead of the fixed Hessian-at-truth metric)
#   [Sb] rank root-cause analysis on the new arm
#   [E]  evidence-estimator cross-check on real data (item 6): PT
#        (TI + stepping-stone), SMC logZ (2 seeds), VI ELBO/IS at the
#        Kalbar MAP-domain 401^2 config, then the agreement table with
#        the n_periods-conditioning bridge handled explicitly.
set -u
cd "$(dirname "$0")/.."

export PARA_GIT_COMMIT=1

STATUS=chain18_status.log
DEADLINE=${CHAIN18_DEADLINE_S:-$(( $(date +%s) + 21600 ))}

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
log "chain18 start; deadline in $(left) s"

# -- [W] wait for chain17 to release the chip ------------------------------
# (two JAX processes on the tunnel crash each other — r4 operational note)
while [ "$(left)" -gt 600 ]; do
    grep -q "chain17 done" chain17_status.log 2>/dev/null && break
    # stale guard: if chain17's log hasn't moved in 45 min, assume dead
    if [ -f chain17_status.log ]; then
        age=$(( $(date +%s) - $(stat -c %Y chain17_status.log) ))
        [ "$age" -gt 2700 ] && { log "[W] chain17 stale (${age}s); proceeding"; break; }
    fi
    sleep 120
done
log "[W] chip handover"

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

# -- [S] SBC ridge arm: 50 replicates, resumable loop ----------------------
while [ "$(left)" -gt 900 ]; do
    [ "$(ridge_done)" = "1" ] && { log "[S] arm complete"; break; }
    run_phase "[S] SBC ridge arm" 3000 sbc_study/sbc_ridge.log \
        python scripts/run_sbc_study.py --replicates 50 --sampler nuts \
            --ridge --nuts-samples 192 --steps-per-call 25
    sleep 5
done
commit_artifacts "Record the ridge-whitened SBC arm (50 replicates, L=64)" \
    sbc_study/sbc_nuts_ridge_ranks.npz sbc_study/sbc_nuts_ridge.png \
    sbc_study/summary.json sbc_study/sbc_ridge.log chain18_status.log

# -- [Sb] rank root-cause analysis ----------------------------------------
if [ -f sbc_study/sbc_nuts_ridge_ranks.npz ]; then
    run_phase "[Sb] ridge-arm rank analysis" 600 sbc_study/sbc_ridge.log \
        env JAX_PLATFORMS=cpu python scripts/analyze_sbc_ranks.py \
            sbc_study/sbc_nuts_ridge_ranks.npz nuts_ridge50 \
        || log "[Sb] FAILED"
    commit_artifacts "Record the ridge-arm rank analysis" \
        sbc_study/rank_analysis_nuts_ridge50.json chain18_status.log
fi

# -- [E] evidence cross-check at the Kalbar MAP domain ---------------------
EOV=('domain_info=(10000.0,200)')

if [ ! -f runs/pt_ev.npz ] && [ "$(left)" -gt 1500 ]; then
    run_phase "[E1] PT evidence run" 3600 runs/pt_ev.log \
        python -m parasitoids_tpu.bayes.run --sampler pt \
            --new 4000 1000 runs/pt_ev --temps 8 --swap-every 10 \
            --checkpoint-every 1000 "${EOV[@]}" || log "[E1] FAILED"
    commit_artifacts "Record the PT evidence run (401^2 Kalbar)" \
        runs/pt_ev.npz runs/pt_ev.meta.json runs/pt_ev.extras.npz \
        runs/pt_ev.log chain18_status.log
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
        run_phase "$label (new)" 2400 "$db.log" \
            python -m parasitoids_tpu.bayes.run --sampler smc \
                --new 256 0 "$db" --particles 256 --moves 2 \
                --min-accepts 2.0 --max-move-rounds 8 --max-stages 80 \
                --seed "$seed" "${EOV[@]}"
    else
        run_phase "$label (resume)" 2400 "$db.log" \
            python -m parasitoids_tpu.bayes.run --sampler smc \
                --resume "$db" 0 --max-stages 80 "${EOV[@]}"
    fi
}

for round in 1 2 3; do
    [ "$(left)" -gt 1200 ] || break
    smc_ev_run runs/smc_ev 0 "[E2] SMC evidence seed0 (r$round)"
done
commit_artifacts "Record the SMC evidence run (401^2 Kalbar, seed 0)" \
    runs/smc_ev.npz runs/smc_ev.meta.json runs/smc_ev.log chain18_status.log
for round in 1 2 3; do
    [ "$(left)" -gt 1200 ] || break
    smc_ev_run runs/smc_ev_b 7 "[E2b] SMC evidence seed7 (r$round)"
done
commit_artifacts "Record the SMC evidence twin (seed 7)" \
    runs/smc_ev_b.npz runs/smc_ev_b.meta.json runs/smc_ev_b.log \
    chain18_status.log

if [ ! -f runs/vi_ev.npz ] && [ "$(left)" -gt 1200 ]; then
    run_phase "[E3] VI evidence run" 2400 runs/vi_ev.log \
        python -m parasitoids_tpu.bayes.run --sampler vi \
            --new 400 2000 runs/vi_ev --vi-fullrank --vi-is 512 \
            "${EOV[@]}" || log "[E3] FAILED"
    commit_artifacts "Record the VI evidence run (401^2 Kalbar)" \
        runs/vi_ev.npz runs/vi_ev.meta.json runs/vi_ev.log chain18_status.log
fi

run_phase "[E4] evidence table" 600 runs/evidence_table.log \
    env JAX_PLATFORMS=cpu python scripts/make_evidence_table.py \
    || log "[E4] FAILED"
commit_artifacts "Record the four-estimator evidence cross-check table" \
    runs/evidence_table.json runs/evidence_table.log chain18_status.log

log "chain18 done ($(left) s before deadline)"
