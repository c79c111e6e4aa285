#!/bin/bash
# Round-2 TPU chain, phase 2 (after the 10k Kalbar chain):
#  1. Carnarvon recorded fit retry (AM now chunked under the tunnel limit)
#  2. long-window AM SBC arm (600+2400/thin 30/obs_sweeps 8 — the
#     recorded run docs/SBC.md's table points at)
#  3. NUTS SBC arm
set -u
cd "$(dirname "$0")/.."

echo "=== [1/3] Carnarvon recorded fit (retry, chunked AM) ===" && date
timeout 9000 python scripts/run_carnarvon_fit.py \
    > carn_study.log 2>&1
echo "carnarvon exit: $?"

echo "=== [2/3] SBC AM long-window arm ===" && date
timeout 9000 python scripts/run_sbc_study.py --sampler am \
    > sbc_study/am_long.log 2>&1
echo "sbc am exit: $?"

echo "=== [3/3] SBC NUTS arm ===" && date
timeout 12000 python scripts/run_sbc_study.py --sampler nuts \
    > sbc_study/nuts_rerun.log 2>&1
echo "sbc nuts exit: $?"
date
echo "=== chain2 done ==="
