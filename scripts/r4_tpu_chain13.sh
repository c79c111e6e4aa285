#!/bin/bash
# Round-4 TPU chain, phase 13 — obs-model comparison with tunnel-safe AM
# chunking, then a final bench capture.  chain12's process was mid-wait
# when its script was edited on disk (bash reads lazily by byte offset),
# so it executed the STALE big-chunk [S1] commands and hit the same
# "TPU worker process crashed" the 70 s monolithic AM programs have hit
# all day.  This is a fresh file + fresh process; AM runs use 400-step
# (~12 s) programs and top up via exact resume on crash.
set -u
cd "$(dirname "$0")/.."

export PARA_GIT_COMMIT=1

STATUS=chain13_status.log
DEADLINE=${CHAIN13_DEADLINE_S:-$(( $(date +%s) + 9600 ))}

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

am_have() {
    python - "$1" <<'PYEOF'
import json, sys
try:
    print(json.load(open(sys.argv[1] + '.meta.json')).get('n_samples', 0))
except Exception:
    print(0)
PYEOF
}

: > "$STATUS"
log "chain13 start; deadline in $(left) s"

# -- [T1] obs-model AM fits, 400-step programs, resume-aware ---------------
for om in negbin zip; do
    db=runs/kalbar_am_${om}
    for attempt in 1 2 3 4; do
        have=$(am_have "$db")
        log "[T1] $om attempt $attempt: have $have samples"
        [ "$have" -ge 9000 ] && break
        if [ ! -f "$db.npz" ]; then
            run_phase "[T1] AM $om (new $attempt)" 3600 "$db.log" \
                python -m parasitoids_tpu.bayes.run --new 10000 1000 \
                    "$db" --obs-sweeps 8 --checkpoint-every 400 \
                    obs_model=$om 'domain_info=(10000.0,400)' \
                || log "[T1] $om attempt $attempt failed"
        else
            run_phase "[T1] AM $om (top-up $attempt)" 3600 "$db.log" \
                python -m parasitoids_tpu.bayes.run --resume "$db" \
                    $(( 10000 - have )) --checkpoint-every 400 \
                    obs_model=$om 'domain_info=(10000.0,400)' \
                || log "[T1] $om top-up $attempt failed"
        fi
    done
    commit_artifacts "Record the Kalbar AM fit under obs_model=$om" \
        "$db.npz" "$db.meta.json" "$db.log"
done

# -- [T2] paired PSIS-LOO comparisons --------------------------------------
for om in negbin zip; do
    db=runs/kalbar_am_${om}
    [ -f "$db.npz" ] || continue
    if ! grep -q "paired comparison" runs/loo_${om}.log 2>/dev/null; then
        run_phase "[T2] LOO poisson-vs-$om" 2400 runs/loo_${om}.log \
            python -m parasitoids_tpu.bayes.loo runs/northstar_am.npz \
                --draws 400 --compare "$db.npz" \
                'domain_info=(10000.0,400)' \
            || log "[T2] $om FAILED"
    fi
done
commit_artifacts "Record the observation-model LOO comparison (poisson vs negbin/zip)" \
    runs/northstar_am_loo.json runs/northstar_am_loo.png \
    runs/loo_negbin.log runs/loo_zip.log

# -- [T3] 100-draw PPCs under the variants ---------------------------------
for om in negbin zip; do
    db=runs/kalbar_am_${om}
    [ -f "$db.npz" ] || continue
    if [ ! -f "${db}_ppc100.json" ]; then
        run_phase "[T3] PPC $om" 2400 "${db}_ppc.log" \
            python -m parasitoids_tpu.bayes.predictive "$db.npz" \
                --draws 100 --json obs_model=$om \
                'domain_info=(10000.0,400)' \
            || log "[T3] $om FAILED"
    fi
    commit_artifacts "Record the 100-draw PPC under obs_model=$om" \
        "${db}_ppc100.json" "${db}_predictive.png" "${db}_ppc.log"
done

# -- [T4] final bench capture with the chunked AM child --------------------
if [ "$(left)" -gt 1800 ]; then
    wait_for_tpu
    log "[T4] bench START"
    timeout 1800 python bench.py > BENCH_local_r4b.json 2>> bench_r4.err
    log "[T4] bench exit: $? ($(head -c 200 BENCH_local_r4b.json))"
    commit_artifacts "Record the final round-4 bench capture (chunked AM child)" \
        BENCH_local_r4b.json
fi

log "chain13 done ($(left) s before deadline)"
