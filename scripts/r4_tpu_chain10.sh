#!/bin/bash
# Round-4 TPU chain, phase 10 — observation-model comparison (VERDICT r3
# item 6): fit Kalbar with the negative-binomial and zero-inflated-Poisson
# observation variants (AM, full 801^2 Bayes config, same workload as the
# committed poisson north-star trace runs/northstar_am.npz) and compare
# predictive performance with paired PSIS-LOO (bayes/loo.py --compare,
# scoring each trace under its own likelihood).  Waits for chain9 to
# release the TPU first — two processes sharing the tunnel crash the
# worker.
set -u
cd "$(dirname "$0")/.."

export PARA_GIT_COMMIT=1

STATUS=chain10_status.log
DEADLINE=${CHAIN10_DEADLINE_S:-$(( $(date +%s) + 39000 ))}

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

: > "$STATUS"
log "chain10 start; waiting for chain9 (pid file /tmp/chain9.pid)"
if [ -f /tmp/chain9.pid ]; then
    C9=$(cat /tmp/chain9.pid)
    while kill -0 "$C9" 2>/dev/null; do
        if [ "$(left)" -lt 1800 ]; then
            log "deadline while chain9 still runs; aborting"; exit 0
        fi
        sleep 180
    done
fi
log "chain9 gone; starting obs-model comparison ($(left) s left)"

# -- [M1] AM fits under each observation variant (full Bayes config) -------
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

# -- [M2] paired PSIS-LOO comparisons against the poisson north-star -------
# (each trace scored under its own likelihood; same data/column order)
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

# -- [M3] 100-draw PPC under the preferred variant (which statistics move) --
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

log "chain10 done ($(left) s before deadline)"
