#!/bin/bash
# Round-4 TPU chain, phase 12 — safety sweeper.  Waits for chain11 to
# exit, then retries whatever it left unfinished (tunnel flakiness killed
# whole phases earlier in the round): missing obs-model fits/LOO/PPC,
# an unfinished synthetic-Carnarvon run (resume, else salvage), and the
# SBC arm if still short of 100.  Designed to be idempotent — every
# phase checks for its artifact first — so running it after a fully
# successful chain11 is a no-op.
set -u
cd "$(dirname "$0")/.."

export PARA_GIT_COMMIT=1

STATUS=chain12_status.log
DEADLINE=${CHAIN12_DEADLINE_S:-$(( $(date +%s) + 30000 ))}

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
log "chain12 start; waiting for chain11 (pid $(cat /tmp/chain11.pid 2>/dev/null))"
if [ -f /tmp/chain11.pid ]; then
    C11=$(cat /tmp/chain11.pid)
    while kill -0 "$C11" 2>/dev/null; do
        if [ "$(left)" -lt 1200 ]; then
            log "deadline while chain11 still runs; exiting"; exit 0
        fi
        sleep 120
    done
fi
log "chain11 gone; sweeping gaps ($(left) s left)"

# -- [S1] obs-model fits + LOO + PPC, if missing ---------------------------
# chain11's [M1] attempts died with "TPU worker process crashed" a few
# minutes in: today's tunnel kills even ~70 s monolithic programs (the
# bench's plain-poisson AM child failed identically), and
# --checkpoint-every 2500 makes each AM chunk one such program.  400-step
# chunks keep programs ~12 s; a crashed run leaves a resumable store
# (save_chain per chunk), so retries TOP UP instead of restarting.
am_have() {  # $1 = db; prints recorded n_samples (0 if none)
    python - "$1" <<'EOF'
import json, sys
try:
    print(json.load(open(sys.argv[1] + '.meta.json')).get('n_samples', 0))
except Exception:
    print(0)
EOF
}
for om in negbin zip; do
    db=runs/kalbar_am_${om}
    for attempt in 1 2 3; do
        have=$(am_have "$db")
        [ "$have" -ge 9000 ] && break
        if [ ! -f "$db.npz" ]; then
            run_phase "[S1] AM $om (new $attempt)" 3600 "$db.log" \
                python -m parasitoids_tpu.bayes.run --new 10000 1000 \
                    "$db" --obs-sweeps 8 --checkpoint-every 400 \
                    obs_model=$om 'domain_info=(10000.0,400)' \
                || log "[S1] $om attempt $attempt failed"
        else
            run_phase "[S1] AM $om (top-up $attempt)" 3600 "$db.log" \
                python -m parasitoids_tpu.bayes.run --resume "$db" \
                    $(( 10000 - have )) --checkpoint-every 400 \
                    obs_model=$om 'domain_info=(10000.0,400)' \
                || log "[S1] $om top-up $attempt failed"
        fi
    done
    commit_artifacts "Record the Kalbar AM fit under obs_model=$om" \
        "$db.npz" "$db.meta.json" "$db.log"
done
for om in negbin zip; do
    db=runs/kalbar_am_${om}
    [ -f "$db.npz" ] || continue
    if ! grep -q "paired comparison" runs/loo_${om}.log 2>/dev/null; then
        run_phase "[S2] LOO poisson-vs-$om" 2400 runs/loo_${om}.log \
            python -m parasitoids_tpu.bayes.loo runs/northstar_am.npz \
                --draws 400 --compare "$db.npz" \
                'domain_info=(10000.0,400)' \
            || log "[S2] $om FAILED"
    fi
    if [ ! -f "${db}_ppc100.json" ]; then
        run_phase "[S3] PPC $om" 2400 "${db}_ppc.log" \
            python -m parasitoids_tpu.bayes.predictive "$db.npz" \
                --draws 100 --json obs_model=$om \
                'domain_info=(10000.0,400)' \
            || log "[S3] $om FAILED"
    fi
done
commit_artifacts "Record obs-model comparison artifacts (sweeper)" \
    runs/northstar_am_loo.json runs/northstar_am_loo.png \
    runs/loo_negbin.log runs/loo_zip.log \
    runs/kalbar_am_negbin_ppc100.json runs/kalbar_am_zip_ppc100.json \
    runs/kalbar_am_negbin_predictive.png runs/kalbar_am_zip_predictive.png

# -- [S4] synthetic Carnarvon: resume if interrupted, salvage else ---------
if [ ! -f carn_study/nuts_r4.npz ]; then
    if [ -f carn_study/nuts_r4.ckpt_durable.npz ] && \
       [ ! -f carn_study/nuts_r4.ckpt.npz ]; then
        cp carn_study/nuts_r4.ckpt_durable.npz carn_study/nuts_r4.ckpt.npz
    fi
    if [ -f carn_study/nuts_r4.ckpt.npz ]; then
        run_phase "[S4] resume synthetic carnarvon" 9000 \
            carn_study/nuts_r4.log \
            python -m parasitoids_tpu.bayes.run --resume \
                carn_study/nuts_r4 0 --sampler nuts --steps-per-call 1 \
                dataset=carnarvon 'domain_info=(10000.0,200)' \
            || run_phase "[S4s] salvage partial draws" 900 \
                carn_study/nuts_r4.log \
                python scripts/salvage_nuts_ckpt.py carn_study/nuts_r4 \
                    dataset=carnarvon 'domain_info=(10000.0,200)' \
            || log "[S4] nothing recovered"
    fi
fi
if [ -f carn_study/nuts_r4.npz ]; then
    if ! grep -q nuts_r4 carn_study/summary.json 2>/dev/null; then
        run_phase "[S4b] truth diagnostics" 900 carn_study/analyze_r4.log \
            python scripts/analyze_carn_trace.py carn_study/nuts_r4.npz \
                nuts_r4 || log "[S4b] FAILED"
    fi
    if [ ! -f carn_study/nuts_r4_ppc100.json ]; then
        run_phase "[S4c] PPC carnarvon nuts_r4" 2400 \
            carn_study/nuts_r4_ppc.log \
            python -m parasitoids_tpu.bayes.predictive \
                carn_study/nuts_r4.npz --draws 100 --json \
                dataset=carnarvon 'domain_info=(10000.0,200)' \
            || log "[S4c] FAILED"
    fi
    commit_artifacts "Record synthetic-Carnarvon artifacts (sweeper)" \
        carn_study/nuts_r4.npz carn_study/nuts_r4.whiten.npz \
        carn_study/nuts_r4.meta.json carn_study/nuts_r4.log \
        carn_study/summary.json carn_study/nuts_r4_ppc100.json \
        carn_study/nuts_r4_predictive.png
fi

# -- [S5] SBC completion, if chain11 ran out of room -----------------------
done_n=$(python - <<'EOF'
import numpy as np, os
for p in ('sbc_study/sbc_nuts.ckpt.npz', 'sbc_study/sbc_nuts_partial.npz'):
    if os.path.exists(p):
        print(int(np.load(p)['done'])); break
else:
    print(0)
EOF
)
if [ ! -f sbc_study/sbc_nuts_ranks.npz ] && [ "${done_n:-0}" -lt 100 ]; then
    while [ "$(left)" -gt 900 ]; do
        wait_for_tpu
        log "[S5 sbc-nuts] slice START ($(left) s left)"
        slice=$(( $(left) - 600 )); [ "$slice" -gt 3600 ] && slice=3600
        timeout "$slice" python scripts/run_sbc_study.py --sampler nuts \
            --warm-start --nuts-burn 32 --nuts-samples 128 --nuts-thin 2 \
            --max-depth 4 >> sbc_study/nuts_warm_arm.log 2>&1
        rc=$?
        log "[S5 sbc-nuts] slice exit: $rc"
        commit_artifacts "SBC NUTS arm: durable partial progress" \
            sbc_study/sbc_nuts_partial.npz sbc_study/summary.json
        if [ $rc -eq 0 ]; then
            log "[S5] ARM COMPLETE"
            commit_artifacts "SBC NUTS warm arm complete" sbc_study
            break
        fi
    done
fi

log "chain12 done ($(left) s before deadline)"
