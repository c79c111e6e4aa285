#!/bin/bash
# Round-4 TPU chain, phase 15 — the last open deliverable: the synthetic-
# Carnarvon posterior is bimodal in the g-block (nuts_r4: R-hat 1.93,
# two chains in two nearly-equal-log-posterior regions), and ROUND4.md
# names a population sampler as the remaining lever.  The SMC stack
# (bayes/smc.py, --sampler smc, per-stage durable checkpoints) anneals a
# 256-particle population from the exact prior to the posterior, so BOTH
# modes are populated and weighted by their actual posterior mass — the
# thing no within-chain metric can deliver.
#
# Tunnel sizing (probed 2026-08-21): one AM move eval at carnarvon
# 401^2 x 30 days costs ~0.045 s, so a 256-particle x 2-move program is
# ~23 s — far under the hosted tunnel's per-program execution limit
# (chain11: worst-safe ~2 min).  Per-stage checkpoints + durable commits
# mean a timeout mid-anneal loses at most one stage.
set -u
cd "$(dirname "$0")/.."

export PARA_GIT_COMMIT=1

STATUS=chain15_status.log
DEADLINE=${CHAIN15_DEADLINE_S:-$(( $(date +%s) + 2700 ))}

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
    if [ "$(left)" -lt 240 ]; then log "$label SKIPPED (deadline)"; return 2; fi
    [ "$tmo" -gt "$(left)" ] && tmo=$(left)
    wait_for_tpu
    log "$label START (timeout ${tmo}s)"
    timeout "$tmo" "$@" >> "$plog" 2>&1
    local rc=$?
    log "$label exit: $rc"
    [ $rc -ne 0 ] && log "$label tail: $(tail -3 "$plog" | tr '\n' ' | ')"
    return $rc
}

smc_beta() {
    python - <<'PY' 2>/dev/null
import json
try:
    with open('carn_study/smc_r4.meta.json') as f:
        print(json.load(f).get('beta', 0.0))
except Exception:
    print(0.0)
PY
}

: > "$STATUS"
log "chain15 start; deadline in $(left) s"

DB=carn_study/smc_r4
OV=(dataset=carnarvon 'domain_info=(10000.0,200)')

# -- [P] SMC anneal: prior -> posterior, resume loop ----------------------
while [ "$(left)" -gt 400 ]; do
    beta=$(smc_beta)
    if python -c "import sys; sys.exit(0 if float('$beta') >= 1.0 else 1)"; then
        log "[P] anneal complete (beta=$beta)"; break
    fi
    if [ ! -f "$DB.npz" ]; then
        run_phase "[P] SMC carnarvon (new)" 1200 "$DB.log" \
            python -m parasitoids_tpu.bayes.run --sampler smc \
                --new 256 0 "$DB" --particles 256 --moves 2 \
                --min-accepts 2.0 --max-move-rounds 8 --max-stages 60 \
                "${OV[@]}"
    else
        run_phase "[P] SMC carnarvon (resume beta=$beta)" 1200 "$DB.log" \
            python -m parasitoids_tpu.bayes.run --sampler smc \
                --resume "$DB" 0 --max-stages 60 "${OV[@]}"
    fi
    sleep 5
done

beta=$(smc_beta)
if ! python -c "import sys; sys.exit(0 if float('$beta') >= 1.0 else 1)"; then
    log "chain15 end: anneal PARTIAL at beta=$beta (resumable)"
    commit_artifacts "SMC carnarvon: partial anneal (beta=$beta, resumable)" \
        "$DB.npz" "$DB.meta.json" "$DB.log" chain15_status.log
    exit 0
fi

# -- [Pa] truth diagnostics + mode weights (CPU, cheap) -------------------
run_phase "[Pa] truth diagnostics" 600 carn_study/analyze_smc_r4.log \
    env JAX_PLATFORMS=cpu python scripts/analyze_carn_trace.py "$DB.npz" \
        smc_r4 || log "[Pa] FAILED"
run_phase "[Pb] mode analysis" 600 carn_study/analyze_smc_r4.log \
    env JAX_PLATFORMS=cpu python scripts/analyze_smc_modes.py "$DB.npz" \
        || log "[Pb] FAILED"
commit_artifacts "Record the SMC synthetic-Carnarvon posterior (population anneal to beta=1)" \
    "$DB.npz" "$DB.meta.json" "$DB.log" "$DB.extras.npz" \
    carn_study/smc_r4_modes.json carn_study/summary.json \
    carn_study/analyze_smc_r4.log chain15_status.log

# -- [Pc] 100-draw PPC (TPU) ----------------------------------------------
if [ "$(left)" -gt 600 ]; then
    run_phase "[Pc] PPC smc_r4" "$(left)" carn_study/smc_r4_ppc.log \
        python -m parasitoids_tpu.bayes.predictive "$DB.npz" \
            --draws 100 --json "${OV[@]}" || log "[Pc] FAILED"
    commit_artifacts "Record the 100-draw PPC for the SMC Carnarvon posterior" \
        carn_study/smc_r4_ppc100.json carn_study/smc_r4_predictive.png \
        carn_study/smc_r4_ppc.log chain15_status.log
fi
log "chain15 done"
