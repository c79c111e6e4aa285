#!/bin/bash
# Serialized TPU run chain for round 2 (one chip; runs must not overlap):
#  1. SBC AM rerun       -> validates the obs-sweep Hastings fix
#  2. Carnarvon fit      -> VERDICT item 5 recorded fit (MAP -> AM -> NUTS)
#  3. 10k Kalbar chain   -> refresh the north-star record post-fix
#  4. SBC NUTS arm       -> completes the SBC study (both samplers)
set -u
cd "$(dirname "$0")/.."

echo "=== [1/4] SBC AM rerun ===" && date
timeout 4000 python scripts/run_sbc_study.py --sampler am \
    > sbc_study/am_rerun.log 2>&1
echo "sbc am exit: $?"

echo "=== [2/4] Carnarvon recorded fit ===" && date
timeout 7000 python scripts/run_carnarvon_fit.py \
    > carn_study.log 2>&1
echo "carnarvon exit: $?"

echo "=== [3/4] 10k Kalbar AM chain ===" && date
timeout 3000 python -m parasitoids_tpu.bayes.run --new 10000 1000 \
    runs/kalbar_am10k --chains 2 > runs/kalbar_am10k.log 2>&1
echo "am10k exit: $?"

echo "=== [4/4] SBC NUTS arm ===" && date
timeout 10000 python scripts/run_sbc_study.py --sampler nuts \
    > sbc_study/nuts_rerun.log 2>&1
echo "sbc nuts exit: $?"
date
echo "=== chain done ==="
