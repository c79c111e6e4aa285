#!/bin/bash
# Round-5 TPU chain, phase 16 — finish the synthetic-Carnarvon SMC anneal
# (VERDICT r4 item 1: the flagship second-dataset posterior, three rounds
# open, standing at beta = 0.1625 after chain15's 17 stages).  Resumes
# carn_study/smc_r4 to beta = 1, then runs the truth diagnostics, the
# mode-weight decomposition (scripts/analyze_smc_modes.py), and a 100-draw
# PPC.
#
# Differences from chain15 (ADVICE r4 + VERDICT r4 end-game notes):
#   * store writes are now atomic (bayes/store.py write-temp-then-rename),
#     and the resume loop additionally restores the store from the last
#     durable git commit if a resume attempt fails outright (non-timeout),
#   * tail logging uses paste (tr mapped the separator to spaces),
#   * end-game: beyond beta 0.5 the slices raise --max-move-rounds so the
#     rejuvenation budget grows where mixing is hardest instead of letting
#     per-stage accepted-jump counts sag,
#   * optional batched-rejuvenation opt-in: if carn_study/.use_batched
#     exists, its contents become PARA_SMC_BATCHED for subsequent slices
#     (set only after the batched ensemble pass is validated + measured).
set -u
cd "$(dirname "$0")/.."

export PARA_GIT_COMMIT=1

STATUS=chain16_status.log
DEADLINE=${CHAIN16_DEADLINE_S:-$(( $(date +%s) + 7200 ))}

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
    if [ -f carn_study/.use_batched ]; then
        export PARA_SMC_BATCHED="$(cat carn_study/.use_batched)"
    fi
    log "$label START (timeout ${tmo}s)"
    timeout "$tmo" "$@" >> "$plog" 2>&1
    local rc=$?
    log "$label exit: $rc"
    [ $rc -ne 0 ] && log "$label tail: $(tail -3 "$plog" | paste -sd'|' -)"
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
log "chain16 start; deadline in $(left) s"

DB=carn_study/smc_r4
OV=(dataset=carnarvon 'domain_info=(10000.0,200)')

# -- [P] SMC anneal: resume loop to beta = 1 ------------------------------
while [ "$(left)" -gt 400 ]; do
    beta=$(smc_beta)
    if python -c "import sys; sys.exit(0 if float('$beta') >= 1.0 else 1)"; then
        log "[P] anneal complete (beta=$beta)"; break
    fi
    # end-game: grow the per-stage rejuvenation budget in the sharp-beta
    # regime (VERDICT r4: steps shrink and move rounds grow as beta -> 1)
    EXTRA=()
    if python -c "import sys; sys.exit(0 if float('$beta') >= 0.5 else 1)"; then
        EXTRA=(--max-move-rounds 12)
    fi
    if [ ! -f "$DB.npz" ]; then
        run_phase "[P] SMC carnarvon (new)" 1200 "$DB.log" \
            python -m parasitoids_tpu.bayes.run --sampler smc \
                --new 256 0 "$DB" --particles 256 --moves 2 \
                --min-accepts 2.0 --max-move-rounds 8 --max-stages 120 \
                "${OV[@]}"
    else
        run_phase "[P] SMC carnarvon (resume beta=$beta)" 1200 "$DB.log" \
            python -m parasitoids_tpu.bayes.run --sampler smc \
                --resume "$DB" 0 --max-stages 120 "${EXTRA[@]}" "${OV[@]}"
        rc=$?
        if [ $rc -ne 0 ] && [ $rc -ne 124 ] && [ $rc -ne 2 ]; then
            # a non-timeout failure with the store present: most likely a
            # corrupted/partial store from an earlier era (writes are atomic
            # now) or a code regression.  Restore the durable commit and
            # retry once per loop pass rather than spinning on a dead store.
            log "[P] resume failed rc=$rc; restoring store from git"
            git_safe checkout -- "$DB.npz" "$DB.meta.json" 2>> "$STATUS" \
                || log "[P] git restore failed"
        fi
    fi
    sleep 5
done

beta=$(smc_beta)
if ! python -c "import sys; sys.exit(0 if float('$beta') >= 1.0 else 1)"; then
    log "chain16 end: anneal PARTIAL at beta=$beta (resumable)"
    commit_artifacts "SMC carnarvon: partial anneal (beta=$beta, resumable)" \
        "$DB.npz" "$DB.meta.json" "$DB.log" chain16_status.log
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
    carn_study/analyze_smc_r4.log chain16_status.log

# -- [Pc] 100-draw PPC (TPU) ----------------------------------------------
if [ "$(left)" -gt 600 ]; then
    run_phase "[Pc] PPC smc_r4" "$(left)" carn_study/smc_r4_ppc.log \
        python -m parasitoids_tpu.bayes.predictive "$DB.npz" \
            --draws 100 --json "${OV[@]}" || log "[Pc] FAILED"
    commit_artifacts "Record the 100-draw PPC for the SMC Carnarvon posterior" \
        carn_study/smc_r4_ppc100.json carn_study/smc_r4_predictive.png \
        carn_study/smc_r4_ppc.log chain16_status.log
fi
log "chain16 done"
